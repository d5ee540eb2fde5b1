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
import threading

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LiveScope", "SpectrumEMA", "power_spectrum"]

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


class LiveScope:
    """Runtime-switchable scope over a compiled receiver's taps.

    The reference switches which VFO feeds its GUI FFT while streaming
    (combo box -> ``fftVFOSlot`` topic compare, mainwindow.cpp:539-566,
    vfo.cpp:492-509) and can turn the FFT off entirely
    (mainwindow.cpp:616-626).  Here the step's output KEY SET is static —
    every tap is compiled in — and which tap gets copied off-device each
    block is this object's runtime choice (``wants`` is the
    ``run_pipeline`` fetch filter), so inactive taps cost nothing.

    Thread-safe: ``set_scope``/``set_fft``/``snapshot`` are called from the
    UDP control thread while ``observe`` runs on the pipeline thread.
    """

    def __init__(
        self,
        tap_rates: dict[str, int],
        initial: str | None = "main",
        stride: int = 5,
    ):
        self.tap_rates = dict(tap_rates)
        self.active = initial if initial in self.tap_rates else None
        self.enabled = True
        self.stride = max(1, int(stride))  # reference: every 5th buffer
        self.ema = SpectrumEMA()
        self._count = 0
        self._lock = threading.Lock()

    # ---- pipeline side ----
    def wants(self, key: str) -> bool:
        """fetch_filter: non-tap outputs always; taps only the active one."""
        if not key.startswith("tap/"):
            return True
        with self._lock:
            return (
                self.enabled
                and self.active is not None
                and key == f"tap/{self.active}"
            )

    def observe(self, outputs: dict) -> None:
        """Feed one step's fetched outputs; strides like the reference."""
        with self._lock:
            active, enabled = self.active, self.enabled
        if not enabled or active is None:
            return
        v = outputs.get(f"tap/{active}")
        if v is None:
            return
        self._count += 1
        if self._count % self.stride:
            return
        self.ema.update(v)

    # ---- control-surface side ----
    def set_scope(self, name) -> dict:
        name = str(name)
        if name in ("off", "none", ""):
            with self._lock:
                self.active = None
            return {"ok": True, "scope": None}
        if name not in self.tap_rates:
            return {
                "error": f"unknown tap {name!r}",
                "valid": sorted(self.tap_rates),
            }
        with self._lock:
            if name != self.active:
                self.active = name
                self.ema = SpectrumEMA()  # fresh EMA: new signal, new stats
        return {"ok": True, "scope": name, "rate": self.tap_rates[name]}

    def set_fft(self, on) -> dict:
        with self._lock:
            self.enabled = bool(int(on))
        return {"ok": True, "fft": int(self.enabled)}

    def snapshot(self, bins=512) -> dict:
        """Current smoothed curve, box-averaged down to ``bins`` points
        (keeps UDP replies under a datagram)."""
        with self._lock:
            active = self.active
            curve = self.ema.smoothed
        bins = max(16, min(int(bins), len(curve)))
        n = (len(curve) // bins) * bins
        folded = curve[:n].reshape(bins, -1).mean(axis=1)
        return {
            "ok": True,
            "scope": active,
            "rate": self.tap_rates.get(active),
            "bins": bins,
            "db": [round(float(v), 2) for v in folded],
        }
