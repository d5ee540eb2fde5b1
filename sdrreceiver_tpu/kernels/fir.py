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

__all__ = [
    "prepare_taps",
    "conv_block",
    "conv_block_planar",
    "fir_history_init_planar",
    "fir_apply",
    "delay_apply",
]


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


def _host_taps(rtaps) -> np.ndarray | None:
    """Concrete host taps as numpy, or None for traced/abstract values.

    prepare_taps returns host numpy on purpose; concrete jax arrays are
    accepted too (np.asarray fails on tracers, which correctly fall through
    to the lax.conv path)."""
    if isinstance(rtaps, np.ndarray):
        return rtaps
    try:
        return np.asarray(rtaps)
    except Exception:
        return None


def _fold_factor(channels: int, t_len: int, stride: int, ntaps: int) -> int:
    """Largest time-fold F: [C, T] -> C*F rows of length T/F (+halo).

    TPU convs with few channels/batch rows lower pathologically (measured
    round 3, tools/layout_probe.py: a [1,1,3000] 125-tap grouped conv costs
    ~500 us; the same FLOPs as 12 batch rows cost ~0).  Folding time into
    batch rows with an (ntaps-1)-column halo keeps the sublane dimension
    busy.  Constraints: F divides T, rows stay >= 2*(ntaps-1) and >= 128
    long (halo overhead + lane utilization), C*F <= 512."""
    h = ntaps - 1
    min_l = max(2 * h, 128)
    best = 1
    f = 1
    while True:
        f += 1
        if channels * f > 512:
            break
        if t_len % f:
            continue
        l = t_len // f
        if l < min_l:
            break  # l shrinks monotonically in f: no larger f can work
        if l % stride:
            continue
        best = f
    return best


_BANDED_MIN_TAPS = 16  # below this the unrolled FMA ladder is cheaper


def _banded_width(t_len: int, stride: int, ntaps: int) -> int | None:
    """Pick a time-block width B for the banded-matmul formulation: B must
    divide T, be a multiple of ``stride``, and sit in [128, 512] (lane-sized
    MXU operands); closest to 256 wins.  None = no suitable width."""
    best = None
    for b in range(128, 513):
        if t_len % b or b % stride:
            continue
        if best is None or abs(b - 256) < abs(best - 256):
            best = b
    return best


def _banded_pair(t: np.ndarray, b: int, stride: int):
    """Per-channel (Mz [C, B, B/s], Mt [C, B, B/s]) banded matrices: with
    time cut into B-wide rows, a strided causal conv is

        y[row, m] = rows[row] @ Mz[:, m]  +  rows[row-1] @ Mt[:, m]

    (row -1 = the carried history, right-aligned into a zero-padded B-row).
    Column j of a row holds x[row_start + j]; output m reads
    x[row_start + m*s - h .. row_start + m*s], so taps whose input index
    falls before the row start land in Mt at column B + (m*s - h + q).

    Same two-dot structure as the fused Pallas front end's (Mz, Mt)
    (pallas/frontend.py) — chosen over a [halo | row] concat formulation
    because lane-misaligned concats relayout the whole array on TPU
    (measured: the concat form cost ~1.5 ms/block across the three USB
    Hilbert instances; this form is pure row-aligned ops + MXU dots)."""
    c_, ntaps = t.shape
    h = ntaps - 1
    bo = b // stride
    mz = np.zeros((c_, b, bo), np.float32)
    mt = np.zeros((c_, b, bo), np.float32)
    for m in range(bo):
        for q in range(ntaps):
            j = m * stride - h + q
            if j >= 0:
                mz[:, j, m] = t[:, q]
            else:
                mt[:, b + j, m] = t[:, q]
    return mz, mt


def _conv_nch(xfull: jax.Array, rtaps, stride: int) -> jax.Array:
    """Grouped NCH conv of ``xfull [N, C, hist+T]`` -> ``[N, C, T/stride]``.

    Strategy by taps (host constants preferred — prepare_taps returns numpy):
      * ntaps >= 16 with a suitable block width: banded-matrix MXU dots
        (one einsum for the whole filter — the 125-tap Hilbert and the
        per-channel audio banks each cost ~0.2 ms/block/bucket as unrolled
        ladders or lax.conv in the round-3 honest profile; the dot form
        replaces hundreds of fused ops with one)
      * otherwise: time-folded shift-multiply-accumulate ladder (short
        filters fuse to ~0; per-channel taps become [R, 1] columns)
      * traced taps: lax.conv_general_dilated fallback
    """
    n_, c_, _ = xfull.shape
    ntaps = rtaps.shape[1]
    h = ntaps - 1
    t_len = xfull.shape[-1] - h
    t = _host_taps(rtaps)
    if t is not None and ntaps >= _BANDED_MIN_TAPS:
        b = _banded_width(t_len, stride, ntaps)
        if b is not None and b > h:
            r = t_len // b
            identical = t.shape[0] == 1 or bool((t == t[0]).all())
            rows = xfull[:, :, h:].reshape(n_, c_, r, b)
            # "previous row" operand: carried history right-aligned into a
            # zero-padded B-wide row 0, then the rows shifted down by one —
            # row-axis ops only, no lane-misaligned concat
            hist_row = jnp.pad(xfull[:, :, :h], [(0, 0), (0, 0), (b - h, 0)])
            prev = jnp.concatenate(
                [hist_row[:, :, None, :], rows[:, :, :-1, :]], axis=2
            )
            mz, mt = _banded_pair(t[:1] if identical else t, b, stride)
            hp = jax.lax.Precision.HIGHEST
            if identical:
                y = jnp.einsum(
                    "ncrj,jm->ncrm", rows, jnp.asarray(mz[0]), precision=hp
                ) + jnp.einsum(
                    "ncrj,jm->ncrm", prev, jnp.asarray(mt[0]), precision=hp
                )
            else:
                y = jnp.einsum(
                    "ncrj,cjm->ncrm", rows, jnp.asarray(mz), precision=hp
                ) + jnp.einsum(
                    "ncrj,cjm->ncrm", prev, jnp.asarray(mt), precision=hp
                )
            return y.reshape(n_, c_, t_len // stride)
    if t is not None:
        identical = t.shape[0] == 1 or bool((t == t[0]).all())
        fold = _fold_factor(n_ * c_, t_len, stride, ntaps)
        l = t_len // fold
        if fold > 1:
            x = xfull[:, :, h:]
            rows = x.reshape(n_, c_, fold, l)
            # left halo per row: carried history for row 0, previous row's
            # tail otherwise (intra-chip analog of dist/halo's exchange)
            if h:
                prev = jnp.concatenate(
                    [xfull[:, :, None, :h], rows[:, :, :-1, -h:]], axis=2
                )
                ext = jnp.concatenate([prev, rows], axis=-1)
            else:
                ext = rows
            ext2 = ext.reshape(n_ * c_ * fold, l + h)
        else:
            ext2 = xfull.reshape(n_ * c_, t_len + h)
        # shift-multiply-accumulate instead of lax.conv: on TPU the conv op
        # itself costs ~400 us at k=125 on these shapes while the unrolled
        # FMA ladder fuses to ~0 (tools/layout_probe.py round-3 data);
        # strided decimation is a (fast) lane-strided slice of the full-rate
        # accumulator — the extra MACs are noise.  Per-channel taps become
        # per-row [R, 1] coefficient columns (row -> its channel's tap),
        # which broadcast for free — this keeps padded per-channel audio
        # banks OFF the pathological small-batch conv path (vfo.cpp:106-124
        # banks; round-3 weak spot)
        if identical:
            coeff = [np.float32(t[0, k]) for k in range(ntaps)]
        else:
            row_chan = (np.arange(ext2.shape[0]) // (ext2.shape[0] // (n_ * c_))) % c_
            coeff = [t[row_chan, k][:, None].astype(np.float32) for k in range(ntaps)]
        acc = coeff[0] * ext2[:, :l] if ntaps else jnp.zeros_like(ext2[:, :l])
        for k in range(1, ntaps):
            acc = acc + coeff[k] * jax.lax.dynamic_slice_in_dim(ext2, k, l, 1)
        if stride > 1:
            acc = acc[:, ::stride]
        return acc.reshape(n_, c_, t_len // stride)
    out = jax.lax.conv_general_dilated(
        xfull,
        jnp.asarray(rtaps)[:, None, :],
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=c_,
        # true f32 accumulation: TPU DEFAULT precision multiplies in
        # bfloat16, which caps the whole chain near ~55 dB vs the 60 dB
        # audio-SNR bound; these convs are HBM-bound so the extra MXU
        # passes are free
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


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

    out = _conv_nch(lhs, rtaps, stride)
    if jnp.iscomplexobj(x):
        y = jax.lax.complex(out[0], out[1])
    else:
        y = out[0]
    return new_hist, y


def fir_history_init_planar(channels: int, ntaps: int) -> jnp.ndarray:
    """Zero planar history ``[2, C, ntaps-1]`` f32 (re plane, im plane)."""
    return jnp.zeros((2, channels, max(ntaps - 1, 0)), jnp.float32)


def conv_block_planar(
    hist: jax.Array,
    x: tuple[jax.Array, jax.Array],
    rtaps: jax.Array,
    stride: int = 1,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Planar-complex form of :func:`conv_block`.

    ``hist``: ``[2, C, ntaps-1]`` f32 (re/im planes); ``x = (re, im)`` each
    ``[C, T]`` f32.  Same semantics, but no complex64 array ever exists —
    complex intermediates lower to minor-dim-2 layouts on TPU and dominate
    the step cost (round-3 honest profile, tools/layout_probe.py)."""
    chans, ntaps = rtaps.shape
    xr, xi = x
    t_len = xr.shape[-1]
    if t_len % stride:
        raise ValueError(f"block length {t_len} not divisible by stride {stride}")
    lhs = jnp.stack([xr, xi], axis=0)  # [2, C, T]
    xfull = jnp.concatenate([hist, lhs], axis=-1)
    new_hist = xfull[:, :, t_len:] if ntaps > 1 else hist
    out = _conv_nch(xfull, rtaps, stride)
    return new_hist, (out[0], out[1])


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
