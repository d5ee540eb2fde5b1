"""Spectrum observability: the reference GUI's scope, as exportable data.

The reference's only runtime observability is its Qt spectrum plot
(mainwindow.cpp:411-478): an 8192-point Hann-windowed complex FFT of every
5th buffer of the selected tap, power in dB with a 0.95/0.05 EMA, a floor at
0 dB, fftshift to center DC, and a 5-bin moving average.  This module keeps
the same math (so displays read identically) but returns arrays — the CLI
dumps them as .npy/.csv and the metrics server can stream them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SpectrumEMA", "power_spectrum"]

NFFT_DEFAULT = 8192


@functools.partial(jax.jit, static_argnames=("nfft",))
def power_spectrum(x: jax.Array, nfft: int = NFFT_DEFAULT) -> jax.Array:
    """One un-smoothed spectrum frame in the reference's units.

    Takes the first ``nfft`` samples of ``x`` (zero-padded if short), Hann
    window (mainwindow.cpp:284-288), |FFT|, then
    ``10*log10(max(1e5 * |X| / nfft, 1))`` (mainwindow.cpp:439-441), and
    fftshift so index 0 is the lowest frequency (mainwindow.cpp:429-437).
    """
    n = x.shape[-1]
    if n < nfft:
        x = jnp.pad(x, (0, nfft - n))
    else:
        x = x[:nfft]
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(nfft) / (nfft - 1.0)))
    spec = jnp.fft.fft(x * w.astype(x.real.dtype))
    mag = jnp.abs(spec)
    db = 10.0 * jnp.log10(jnp.maximum(1e5 * mag / nfft, 1.0))
    return jnp.fft.fftshift(db)


class SpectrumEMA:
    """Stateful EMA'd spectrum of one selected tap (host-side convenience).

    ``update`` every N blocks (the reference strides 5, sdrj.cpp:296-303, "FFT
    purposely slow" per README.md:3) and read ``.smoothed`` for the 5-bin
    averaged curve the GUI plots (mainwindow.cpp:450-454).
    """

    def __init__(self, nfft: int = NFFT_DEFAULT, alpha: float = 0.05):
        self.nfft = nfft
        self.alpha = alpha
        self.pwr = np.zeros(nfft, dtype=np.float64)

    def update(self, block) -> np.ndarray:
        block = np.asarray(block)
        if block.ndim == 2 and block.shape[0] == 2:
            # planar [2, T] float32 tap (see graph/compiler emit_taps)
            block = block[0] + 1j * block[1]
        frame = np.asarray(power_spectrum(jnp.asarray(block), self.nfft))
        self.pwr = self.pwr * (1.0 - self.alpha) + self.alpha * frame
        return self.pwr

    @property
    def smoothed(self) -> np.ndarray:
        p = self.pwr
        n = len(p) - 10
        return (p[0:n] + p[1 : 1 + n] + p[2 : 2 + n] + p[3 : 3 + n] + p[4 : 4 + n]) / 5.0
