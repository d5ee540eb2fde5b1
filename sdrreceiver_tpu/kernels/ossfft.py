"""Overlap-save FFT fast convolution — batched on-device kiss_fastfir.

The reference vendors an overlap-save ("overlap-scrap") streaming FFT
convolver (kiss_fft130/kiss_fastfir.c:106-202: nfft >= 2*ntaps, rotated
impulse response, ``ngood = nfft - ntaps + 1`` kept samples per block,
leftover-sample carry) which is compiled but never wired into the app — it is
the intended scaling path for long filters.  This module IS that capability,
TPU-style: a whole ``[C, T]`` block is framed into overlapping nfft segments,
convolved as one batched FFT -> bin-multiply -> IFFT, and exposed through the
exact same streaming interface as kernels.fir.conv_block so the two are
interchangeable (and property-tested equal).  The leftover-carry state of the
reference becomes the same ``ntaps - 1`` input history every block FIR here
already carries.

Use for filters long enough that nfft*log(nfft) beats ntaps per output (the
200+ tap audio low-passes); short half-bands stay on the direct path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["default_nfft", "oss_prepare", "oss_block"]


def default_nfft(ntaps: int) -> int:
    """Smallest power of two >= 4*ntaps (kiss_fastfir picks >= 2*ntaps,
    kiss_fft130/kiss_fastfir.c:60-67; 4x keeps the kept-fraction high)."""
    nfft = 1
    while nfft < 4 * ntaps:
        nfft *= 2
    return nfft


def oss_prepare(taps, channels: int | None = None, nfft: int | None = None):
    """Precompute the frequency-domain filter bank.

    ``taps`` is ``[ntaps]`` or ``[C, ntaps]`` in convolution order (same input
    as fir.prepare_taps).  Returns a dict of static arrays for oss_block.
    """
    t = np.asarray(taps, dtype=np.float32)
    if t.ndim == 1:
        t = t[None, :]
    if channels is not None and t.shape[0] == 1 and channels != 1:
        t = np.broadcast_to(t, (channels, t.shape[1])).copy()
    ntaps = t.shape[1]
    if nfft is None:
        nfft = default_nfft(ntaps)
    if nfft < 2 * ntaps:
        raise ValueError(f"nfft {nfft} < 2*ntaps {2 * ntaps}")
    hpad = np.zeros((t.shape[0], nfft), dtype=np.float32)
    hpad[:, :ntaps] = t
    return {
        # host numpy on purpose — embeds as an IR constant at trace time
        "H": np.fft.fft(hpad, axis=-1).astype(np.complex64),
        # half-spectrum bank for the real path (kiss_fastfir's _real
        # variant, kiss_fft130/kiss_fastfir_real.h): real inputs run
        # rfft/irfft at half the FFT work of the complex path
        "Hr": np.fft.rfft(hpad, axis=-1).astype(np.complex64),
        "ntaps": ntaps,
        "nfft": nfft,
    }


def _frame(xfull, ntaps: int, nfft: int):
    """[C, hist+T] -> overlapping segments [C, nseg, nfft] + t_out."""
    t_out = xfull.shape[1] - (ntaps - 1)
    hop = nfft - ntaps + 1
    nseg = -(-t_out // hop)  # ceil
    pad = (ntaps - 1) + nseg * hop - xfull.shape[1]
    xp = jnp.pad(xfull, ((0, 0), (0, pad)))
    # frame: segment s covers xp[s*hop : s*hop + nfft]
    idx = (jnp.arange(nseg)[:, None] * hop) + jnp.arange(nfft)[None, :]
    return xp[:, idx], t_out, hop, nseg


@functools.partial(jax.jit, static_argnames=("ntaps", "nfft", "stride"))
def _oss_core(xfull, H, ntaps: int, nfft: int, stride: int):
    chans = xfull.shape[0]
    segs, t_out, hop, nseg = _frame(xfull, ntaps, nfft)
    spec = jnp.fft.fft(segs, axis=-1) * H[:, None, :]
    conv = jnp.fft.ifft(spec, axis=-1)
    # valid (fully-overlapped) outputs of segment s are positions
    # ntaps-1 .. nfft-1  == stream outputs s*hop .. s*hop + hop - 1
    good = conv[:, :, ntaps - 1 :].reshape(chans, nseg * hop)[:, :t_out]
    return good[:, ::stride]


@functools.partial(jax.jit, static_argnames=("ntaps", "nfft", "stride"))
def _oss_core_real(xfull, Hr, ntaps: int, nfft: int, stride: int):
    """Real-signal overlap-save via rfft/irfft — half the FFT work and no
    complex container for the time-domain data (the USB audio path is real;
    kiss_fastfir's dedicated real variant, kiss_fft130/kiss_fastfir.c with
    REAL_FASTFIR, exists for the same reason)."""
    chans = xfull.shape[0]
    segs, t_out, hop, nseg = _frame(xfull, ntaps, nfft)
    spec = jnp.fft.rfft(segs, axis=-1) * Hr[:, None, :]
    conv = jnp.fft.irfft(spec, n=nfft, axis=-1)
    good = conv[:, :, ntaps - 1 :].reshape(chans, nseg * hop)[:, :t_out]
    return good[:, ::stride]


def oss_block(hist, x, filt: dict, stride: int = 1):
    """Streaming overlap-save step; drop-in replacement for fir.conv_block.

    Args/returns as conv_block: hist ``[C, ntaps-1]``, x ``[C, T]`` (complex),
    y ``[C, T // stride]``.  The filter ``filt`` comes from oss_prepare.
    """
    ntaps, nfft = filt["ntaps"], filt["nfft"]
    t_len = x.shape[-1]
    if t_len % stride:
        raise ValueError(f"block length {t_len} not divisible by stride {stride}")
    xfull = jnp.concatenate([hist, x], axis=-1)
    # history keeps the INPUT dtype (real stays real across steps)
    new_hist = xfull[:, t_len:] if ntaps > 1 else hist
    if not jnp.iscomplexobj(xfull):
        if "Hr" in filt:
            y = _oss_core_real(xfull, filt["Hr"], ntaps, nfft, stride)
        else:  # older prepared dicts without the half-spectrum bank
            y = _oss_core(
                xfull.astype(jnp.complex64), filt["H"], ntaps, nfft, stride
            ).real
    else:
        y = _oss_core(xfull, filt["H"], ntaps, nfft, stride)
    return new_hist, y
