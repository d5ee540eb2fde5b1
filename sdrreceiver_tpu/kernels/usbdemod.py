"""USB (upper-sideband) demodulation: delay - Hilbert, filter, quantize.

The reference demodulates per sample (vfo.cpp:300-332):

    usb[n] = delay62(I)[n] - hilbert125(Q)[n]
    usb    = fir_usb(usb)            # only when filter_bandwidth > 0
    out[n] = short(usb * gain * 32768)

Here the same chain runs as three batched block ops over ``[C, T]``: a
62-sample delay (fir.delay_apply), a 125-tap Hilbert FIR (fir.conv_block with
the design from kernels.design.hilbert), the optional per-channel audio
low-pass, then int16 quantization.  The reference's raw float->short C cast is
replaced by round-and-saturate (the cast is UB on overflow; saturation is the
deliberate behavioral improvement, noted for parity auditing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import design
from .fir import conv_block, delay_apply, prepare_taps

__all__ = ["usb_init", "usb_block", "usb_block_planar", "quantize_i16"]


def usb_init(channels: int, hilbert_len: int = design.HILBERT_LEN) -> dict:
    """Carried state for the USB demod stage of one channel bucket."""
    delay = (hilbert_len - 1) // 2
    return {
        "delay_hist": jnp.zeros((channels, delay), dtype=jnp.float32),
        "hilb_hist": jnp.zeros((channels, hilbert_len - 1), dtype=jnp.float32),
    }


def usb_block(
    state: dict,
    x: jax.Array,
    hilb_rtaps: jax.Array,
) -> tuple[dict, jax.Array]:
    """Demodulate a complex ``[C, T]`` block to real USB audio ``[C, T]``.

    ``hilb_rtaps`` comes from ``prepare_taps(design.hilbert(), C)``.
    """
    delay_hist, delayed = delay_apply(state["delay_hist"], x.real)
    hilb_hist, hq = conv_block(state["hilb_hist"], x.imag, hilb_rtaps)
    usb = delayed - hq
    return {"delay_hist": delay_hist, "hilb_hist": hilb_hist}, usb


def usb_block_planar(
    state: dict,
    x: tuple[jax.Array, jax.Array],
    hilb_rtaps: jax.Array,
) -> tuple[dict, jax.Array]:
    """Planar form of :func:`usb_block`: ``x = (re, im)`` f32 ``[C, T]``.
    Both arms are real FIRs already, so this just skips the complex64
    container (which costs minor-dim-2 relayouts on TPU)."""
    xr, xi = x
    delay_hist, delayed = delay_apply(state["delay_hist"], xr)
    hilb_hist, hq = conv_block(state["hilb_hist"], xi, hilb_rtaps)
    return {"delay_hist": delay_hist, "hilb_hist": hilb_hist}, delayed - hq


def quantize_i16(audio: jax.Array, gains: jax.Array) -> jax.Array:
    """``int16(audio * gain * 32768)`` with round-to-nearest and saturation.

    ``gains`` is ``[C]`` (ini ``gain``/100, mainwindow.cpp:219); scale factor
    32768 per vfo.cpp:328.
    """
    scaled = audio * (gains[:, None] * np.float32(32768.0))
    return jnp.clip(jnp.round(scaled), -32768.0, 32767.0).astype(jnp.int16)
