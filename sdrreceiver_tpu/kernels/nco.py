"""Vectorized NCO (numerically-controlled oscillator) mixers.

The reference precomputes one full second of phasor samples per VFO by
iterating a complex rotation with an amplitude-renormalization hack
(oscillator.cpp:15-30: ``norm = 1.95 - |v|^2``) and plays it back with a queue
pointer (oscillator.cpp:39-50) — 8 MB/VFO of wavetable to avoid per-sample
trig.  The TPU design needs neither the table nor the drift correction:
phase is carried as an EXACT integer numerator of cycles

    theta[n] = 2*pi * ((phase0 + f*n) mod Fs) / Fs

(valid because every mixer frequency in the config system is an integer Hz:
mainwindow.cpp:131,220).  ``cos``/``sin`` of a whole block vectorize on the
VPU, phase never drifts, and state is one int32 per channel.

The modular arithmetic is carried out entirely in uint32 via a two-level
decomposition n = a*K + b so no intermediate product overflows — exact for
Fs <= 4 MHz and block lengths up to ~4M samples (asserted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nco_init", "mix_block", "mix_block_planar", "advance_per_block"]

_K = 2048  # inner decomposition width; K * Fs must fit uint32


def nco_init(freqs_hz, fs: int) -> dict:
    """Build NCO parameters + zero-phase state.

    Args:
      freqs_hz: integer mixer frequencies, ``[C]`` (may be negative — the
        reference's mixer freq is center - channel, either sign).
      fs: integer sample rate of the stream being mixed.

    Returns a dict pytree: ``phase`` (carried state, uint32 ``[C]``) and the
    static per-channel constants used by :func:`mix_block`.
    """
    f = np.atleast_1d(np.asarray(freqs_hz))
    if not np.issubdtype(f.dtype, np.integer):
        fi = np.round(f).astype(np.int64)
        if not np.allclose(f, fi):
            raise ValueError("NCO frequencies must be integer Hz")
        f = fi
    f = np.mod(f.astype(np.int64), fs).astype(np.uint32)  # normalize to [0, fs)
    if int(fs) * _K >= 2**32:
        raise ValueError(f"fs {fs} too large for exact uint32 NCO phase math")
    return {
        "phase": jnp.zeros(f.shape, dtype=jnp.uint32),
        "f": jnp.asarray(f),  # f mod fs
        "fK": jnp.asarray((f.astype(np.int64) * _K % fs).astype(np.uint32)),
    }


@functools.partial(jax.jit, static_argnames=("fs", "t_len", "conj"))
def _phasor_planar(phase, f, f_k, fs: int, t_len: int, conj: bool):
    """(cos, sin) of the exact per-channel phase ramp, planar ``[C, T]``."""
    if (t_len // _K) * (fs - 1) >= 2**32:
        raise ValueError(f"block length {t_len} too large for exact NCO math")
    n = jnp.arange(t_len, dtype=jnp.uint32)
    a, b = n // _K, n % _K
    # (f*n) mod fs == (a*(f*K mod fs) + f*b) mod fs, all products < 2^32
    fn_mod = (
        (a[None, :] * f_k[:, None]) % fs + (b[None, :] * f[:, None]) % fs
    ) % fs
    m = (fn_mod + phase[:, None]) % fs
    theta = m.astype(jnp.float32) * np.float32(2.0 * np.pi / fs)
    s = jnp.sin(theta)
    return jnp.cos(theta), (-s if conj else s)


def _phasor(phase, f, f_k, fs: int, t_len: int, conj: bool):
    return jax.lax.complex(*_phasor_planar(phase, f, f_k, fs, t_len, conj))


def block_step_mod(state: dict, fs: int, t_len: int) -> jax.Array:
    """``(f * t_len) mod fs`` per channel, exactly, without overflow.

    ``t_len`` is static, so ``f*t_len mod fs`` is reassembled from the
    precomputed ``fK`` table.  Used for per-block phase advance and for the
    per-shard phase offsets of time sharding (dist layer): shard ``i`` of a
    block starts at phase ``phase0 + i * block_step_mod(t_shard)``.
    """
    a, b = t_len // _K, t_len % _K
    ft_mod = (state["fK"] * jnp.uint32(a)) % fs
    return (ft_mod + (state["f"] * jnp.uint32(b)) % fs) % fs


def advance_per_block(state: dict, fs: int, t_len: int) -> jax.Array:
    """New phase after ``t_len`` samples: ``(phase + f*t_len) mod fs``."""
    return (state["phase"] + block_step_mod(state, fs, t_len)) % fs


def phase_minus(state: dict, fs: int, n: int) -> jax.Array:
    """Phase ``n`` samples BEFORE the carried phase (exact uint32):
    what a warm-up-prefixed kernel or a derived-tail mix starts from."""
    back = block_step_mod(state, fs, n)
    return (state["phase"] + (jnp.uint32(fs) - back)) % jnp.uint32(fs)


def mix_block(
    state: dict, x: jax.Array, fs: int, conj: bool = False
) -> tuple[dict, jax.Array]:
    """Mix a block by per-channel phasors: ``y[c, n] = x[.., n] * e^{j theta}``.

    ``x`` may be ``[T]`` (one wideband stream fanned out to C channels — the
    reference's main-VFO mix, vfo.cpp:237-245) or ``[C, T]``.  Rotation sign
    matches the reference oscillator (+omega: oscillator.cpp:9-11), i.e. a
    carrier at -f relative to the stream center lands at baseband when the
    mixer frequency is +f; pass ``conj=True`` for the opposite shift.
    """
    t_len = x.shape[-1]
    ph = _phasor(state["phase"], state["f"], state["fK"], fs, t_len, conj)
    y = x[None, :] * ph if x.ndim == 1 else x * ph
    new_state = dict(state)
    new_state["phase"] = advance_per_block(state, fs, t_len)
    return new_state, y


def mix_block_planar(
    state: dict,
    x: tuple[jax.Array, jax.Array],
    fs: int,
    conj: bool = False,
) -> tuple[dict, tuple[jax.Array, jax.Array]]:
    """Planar form of :func:`mix_block`: ``x = (re, im)`` f32 arrays,
    each ``[T]`` or ``[C, T]``; returns the mixed planar pair ``[C, T]``.

    The product path — complex64 intermediates lower to minor-dim-2
    layouts on TPU and cost ~10-50x roofline (tools/layout_probe.py)."""
    xr, xi = x
    t_len = xr.shape[-1]
    c, s = _phasor_planar(
        state["phase"], state["f"], state["fK"], fs, t_len, conj
    )
    if xr.ndim == 1:
        xr, xi = xr[None, :], xi[None, :]
    yr = xr * c - xi * s
    yi = xr * s + xi * c
    new_state = dict(state)
    new_state["phase"] = advance_per_block(state, fs, t_len)
    return new_state, (yr, yi)
