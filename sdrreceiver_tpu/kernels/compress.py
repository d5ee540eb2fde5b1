"""8-bit IQ compression for forwarding main-VFO baseband (vfo.cpp:389-424).

Two wire styles, selected per main VFO (``compress_scale`` style 1 is what the
app always sets for mains, mainwindow.cpp:133):

  style 1 ("packed nibbles"): each complex sample becomes ONE byte — the top
    4 bits of int8(re/scale*128) and of int8(im/scale*128) packed as
    (re & 0xF0) | ((im & 0xF0) >> 4)                        (vfo.cpp:397-405)

  style 2 ("interleaved i8"): two bytes per sample, int8(re*128), int8(im*128)
                                                             (vfo.cpp:413-420)

The reference's float->signed-char casts truncate toward zero and overflow as
UB; here values are truncated toward zero and saturated to [-128, 127], which
matches the cast exactly for all in-range inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compress_style1", "compress_style1_planar", "compress_style2"]


def _to_i8_trunc(v: jax.Array) -> jax.Array:
    """float -> int8 with C cast semantics (truncate toward zero), saturated."""
    t = jnp.trunc(v)
    return jnp.clip(t, -128.0, 127.0).astype(jnp.int32)


def compress_style1(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """``[.., T]`` complex -> ``[.., T]`` uint8 packed-nibble stream."""
    re = _to_i8_trunc(x.real / np.float32(scale) * 128.0)
    im = _to_i8_trunc(x.imag / np.float32(scale) * 128.0)
    # (signed & 0xF0) in C promotes to int; emulate with int32 bit ops.
    packed = (re & 0xF0) | ((im & 0xF0) >> 4)
    return packed.astype(jnp.uint8)


def compress_style1_planar(
    x: tuple[jax.Array, jax.Array], scale: float = 1.0
) -> jax.Array:
    """Planar form of :func:`compress_style1` (``x = (re, im)`` f32)."""
    xr, xi = x
    re = _to_i8_trunc(xr / np.float32(scale) * 128.0)
    im = _to_i8_trunc(xi / np.float32(scale) * 128.0)
    packed = (re & 0xF0) | ((im & 0xF0) >> 4)
    return packed.astype(jnp.uint8)


def compress_style2(x: jax.Array) -> jax.Array:
    """``[.., T]`` complex -> ``[.., 2T]`` int8 interleaved I/Q stream."""
    re = _to_i8_trunc(x.real * 128.0).astype(jnp.int8)
    im = _to_i8_trunc(x.imag * 128.0).astype(jnp.int8)
    return jnp.stack([re, im], axis=-1).reshape(*x.shape[:-1], -1)
