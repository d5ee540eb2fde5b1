"""Spectrum observability: the reference GUI's scope, as exportable data.

The reference's only runtime observability is its Qt spectrum plot
(mainwindow.cpp:411-478): an 8192-point Hann-windowed complex FFT of every
5th buffer of the selected tap, power in dB with a 0.95/0.05 EMA, a floor at
0 dB, fftshift to center DC, and a 5-bin moving average.  This module keeps
the same math (so displays read identically) but returns arrays — the CLI
dumps them as .npy/.csv and the metrics server can stream them.

Backend note: taps cross the device boundary PLANAR ([2, T] float32, never
complex64) because restricted remote-TPU backends cannot transfer complex
buffers — and a failed complex transfer can poison the whole backend session
(see utils/planar).  The data therefore stays planar END TO END here: the
jitted spectrum takes separate re/im planes and forms the complex signal
inside the traced function (jax.lax.complex), so no complex host array is
ever device_put.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fetch import fetch_np

__all__ = ["LiveScope", "SpectrumEMA", "power_spectrum"]

NFFT_DEFAULT = 8192


@functools.partial(jax.jit, static_argnames=("nfft",))
def _power_spectrum_planar(re: jax.Array, im: jax.Array, nfft: int) -> jax.Array:
    """Jitted spectrum core over planar float32 planes (backend-safe)."""
    n = re.shape[-1]
    if n < nfft:
        re = jnp.pad(re, (0, nfft - n))
        im = jnp.pad(im, (0, nfft - n))
    else:
        re = re[:nfft]
        im = im[:nfft]
    x = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    w = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * jnp.arange(nfft) / (nfft - 1.0)))
    spec = jnp.fft.fft(x * w.astype(jnp.float32))
    mag = jnp.abs(spec)
    db = 10.0 * jnp.log10(jnp.maximum(1e5 * mag / nfft, 1.0))
    return jnp.fft.fftshift(db)


def power_spectrum(x, nfft: int = NFFT_DEFAULT) -> jax.Array:
    """One un-smoothed spectrum frame in the reference's units.

    Takes the first ``nfft`` samples of ``x`` (zero-padded if short), Hann
    window (mainwindow.cpp:284-288), |FFT|, then
    ``10*log10(max(1e5 * |X| / nfft, 1))`` (mainwindow.cpp:439-441), and
    fftshift so index 0 is the lowest frequency (mainwindow.cpp:429-437).

    ``x`` may be planar ``[2, T]`` float32 (the tap wire format), complex
    ``[T]``, or real ``[T]``.  Complex HOST arrays are split on the host so
    no complex buffer is ever transferred to the device.
    """
    if isinstance(x, jax.Array) and not isinstance(x, np.ndarray):
        # already on device: split under the jit (free; no host round trip)
        if x.ndim == 2 and x.shape[0] == 2:
            return _power_spectrum_planar(x[0], x[1], nfft)
        if jnp.iscomplexobj(x):
            re, im = jax.jit(lambda v: (v.real, v.imag))(x)
            return _power_spectrum_planar(re, im, nfft)
        return _power_spectrum_planar(x, jnp.zeros_like(x), nfft)
    x = np.asarray(x)
    if x.ndim == 2 and x.shape[0] == 2:
        re, im = x[0], x[1]
    elif np.iscomplexobj(x):
        re = np.ascontiguousarray(x.real, dtype=np.float32)
        im = np.ascontiguousarray(x.imag, dtype=np.float32)
    else:
        re, im = x.astype(np.float32), np.zeros_like(x, dtype=np.float32)
    return _power_spectrum_planar(jnp.asarray(re), jnp.asarray(im), nfft)


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
        # power_spectrum keeps planar taps planar all the way to the jit
        # boundary (never recombined to complex64 on the host); fetch_np
        # routes the f32 result through a backend-safe standalone copy
        frame = fetch_np(power_spectrum(block, self.nfft))
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

    Stride-aware fetching: the reference only refreshes its FFT every 5th
    buffer (sdrj.cpp:296-303), so ``wants`` also answers False on the
    blocks whose frame would be discarded — the tap is only copied
    device->host on the blocks that actually update the EMA.

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
        """fetch_filter: non-tap outputs always; the active tap only on
        blocks whose frame the EMA will consume (every ``stride``-th)."""
        if not key.startswith("tap/"):
            return True
        with self._lock:
            return (
                self.enabled
                and self.active is not None
                and key == f"tap/{self.active}"
                and self._count % self.stride == 0
            )

    def observe(self, outputs: dict) -> None:
        """Feed one step's fetched outputs; strides like the reference.

        Counts EVERY block (fetched or not) so the cadence matches
        ``wants``; consumes the frame on blocks where count % stride == 0
        (the first frame after a switch updates immediately).
        """
        with self._lock:
            active, enabled = self.active, self.enabled
            ema = self.ema
            if not enabled or active is None:
                return
            consume = self._count % self.stride == 0
            self._count += 1
        v = outputs.get(f"tap/{active}")
        if consume and v is not None:
            # update the instance captured under the lock: a concurrent
            # set_scope swaps in a fresh EMA, and one stale frame must not
            # contaminate it right after the reset
            ema.update(v)

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
                self._count = 0  # next frame updates immediately
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
        # trim the remainder symmetrically so the folded curve keeps the
        # band centered (a one-sided trim would shave only the top edge)
        extra = len(curve) % bins
        lo = extra // 2
        trimmed = curve[lo : lo + len(curve) - extra]
        folded = trimmed.reshape(bins, -1).mean(axis=1)
        return {
            "ok": True,
            "scope": active,
            "rate": self.tap_rates.get(active),
            "bins": bins,
            "db": [round(float(v), 2) for v in folded],
        }
