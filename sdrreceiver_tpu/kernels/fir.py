"""Streaming block FIR filters as strided grouped convolutions.

The reference filters one sample at a time through circular buffers
(jonti/dsp.cpp:59-71) with hand-coded phase skipping for decimators
(halfbanddecimator.cpp:43-72, vfo.cpp:351-383).  Here a whole ``[chan, time]``
block is filtered in one ``lax.conv_general_dilated`` call with
``feature_group_count = chan`` (per-channel taps) and ``window_strides``
doing the decimation, so only the kept output phases are ever computed — the
tensor-program equivalent of the reference's update-only skips.

Semantics (shared by every FIR in the framework):

    y[c, n] = sum_k taps[c, k] * x[c, n - k]        n = 0, S, 2S, ...

with causal zero-initial history: x[-1], x[-2], ... are 0 at stream start
(matching the reference's zero-filled queues, jonti/dsp.cpp:46-49), and the
last ``ntaps - 1`` inputs carried between blocks (the reference's
FIRQueueBackToFront overlap handoff, jonti/dsp.cpp:163-173 — implemented here
without its one-sample-stale copy; see tests/test_fir.py for the exact
chunked==whole property).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["prepare_taps", "conv_block", "fir_apply", "delay_apply"]


def prepare_taps(taps, channels: int | None = None) -> jnp.ndarray:
    """Convert convolution-order taps ``c[k]`` into the reversed per-channel
    correlation kernels that ``conv_block`` consumes.

    ``taps`` may be ``[ntaps]`` (shared across channels) or ``[C, ntaps]``
    (per-channel).  Shorter per-channel filters should be padded with
    TRAILING zeros before stacking — trailing zeros in ``c`` leave
    ``sum_k c[k] x[n-k]`` unchanged, so padding never shifts alignment.
    """
    t = np.asarray(taps, dtype=np.float32)
    if t.ndim == 1:
        t = t[None, :]
    if channels is not None and t.shape[0] == 1 and channels != 1:
        t = np.broadcast_to(t, (channels, t.shape[1])).copy()
    # Reverse into correlation order (XLA convs do not flip kernels).
    # Returned as a HOST numpy array on purpose: jit traces embed it as an IR
    # constant directly; a device array here would need a device->host fetch
    # at trace time, which remote TPU backends may not support.
    return t[:, ::-1].copy()


def conv_block(
    hist: jax.Array,
    x: jax.Array,
    rtaps: jax.Array,
    stride: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """One streaming FIR block step.

    Args:
      hist:  ``[C, ntaps-1]`` carried input history (same dtype family as x).
      x:     ``[C, T]`` real or complex input block; T must be a multiple of
             ``stride``.
      rtaps: ``[C, ntaps]`` reversed (correlation-order) float32 taps from
             :func:`prepare_taps`.
      stride: decimation factor — outputs are produced at input positions
             0, stride, 2*stride, ... (the reference's phase convention:
             halfbanddecimator.cpp:48-66 emits on even samples,
             vfo.cpp:351-383 emits on check==0).

    Returns:
      (new_hist ``[C, ntaps-1]``, y ``[C, T // stride]``)
    """
    chans, ntaps = rtaps.shape
    t_len = x.shape[-1]
    if t_len % stride:
        raise ValueError(f"block length {t_len} not divisible by stride {stride}")
    xfull = jnp.concatenate([hist, x], axis=-1)
    new_hist = xfull[:, t_len:] if ntaps > 1 else hist

    if jnp.iscomplexobj(x):
        lhs = jnp.stack([xfull.real, xfull.imag], axis=0)  # [2, C, T+n-1]
    else:
        lhs = xfull[None]  # [1, C, T+n-1]

    out = jax.lax.conv_general_dilated(
        lhs,
        rtaps[:, None, :],  # [C, 1, ntaps]
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=chans,
        # true f32 accumulation: TPU DEFAULT precision multiplies in
        # bfloat16, which caps the whole chain near ~55 dB vs the 60 dB
        # audio-SNR bound; these convs are HBM-bound so the extra MXU
        # passes are free
        precision=jax.lax.Precision.HIGHEST,
    )
    if jnp.iscomplexobj(x):
        y = jax.lax.complex(out[0], out[1])
    else:
        y = out[0]
    return new_hist, y


def fir_apply(hist, x, rtaps, stride: int = 1):
    """Alias of :func:`conv_block` (public kernel name)."""
    return conv_block(hist, x, rtaps, stride)


def delay_apply(hist: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pure ``d``-sample delay line: ``y[n] = x[n-d]`` with ``d = hist len``.

    The reference's DelayThing (jonti/dsp.h:79-126), used to align the I arm
    with the 62-sample group delay of the 125-tap Hilbert (vfo.cpp:136).
    """
    d = hist.shape[-1]
    if d == 0:
        return hist, x
    xfull = jnp.concatenate([hist, x], axis=-1)
    t_len = x.shape[-1]
    return xfull[..., t_len:], xfull[..., :t_len]
