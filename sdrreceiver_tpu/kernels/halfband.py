"""Half-band /2 decimation cascades.

Reference: each VFO owns up to 8 chained HalfBandDecimator objects
(vfo.h:63, vfo.cpp:127-133, always 11 taps) that per-sample dot-product even
samples and history-update odd ones (halfbanddecimator.cpp:43-72).  Here a
cascade is a list of strided grouped convolutions: stage k maps
``[C, T/2^k] -> [C, T/2^(k+1)]`` computing only the kept (even) phases, with
``ntaps - 1`` samples of carried history per stage per channel.

A half-band's odd taps are zero (except the 0.5 center), so a direct
implementation does ~half the MACs; the fused Pallas kernel exploits this,
while this jnp reference path leaves it to XLA (the zero taps still multiply).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import design
from .fir import conv_block, conv_block_planar, prepare_taps

__all__ = [
    "cascade_init",
    "cascade_init_planar",
    "cascade_apply",
    "cascade_apply_planar",
    "cascade_tails_from_tail",
    "cascade_taps",
]


def cascade_taps(channels: int, taps: int = 11) -> jnp.ndarray:
    """Reversed (correlation-order) half-band taps for conv_block; symmetric,
    so reversal is the identity, but kept explicit for uniformity."""
    return prepare_taps(design.half_band(taps), channels)


def cascade_init(
    channels: int, stages: int, taps: int = 11, dtype=jnp.complex64
) -> list[jax.Array]:
    """Zero history for each of ``stages`` chained /2 decimators."""
    return [
        jnp.zeros((channels, taps - 1), dtype=dtype) for _ in range(stages)
    ]


def cascade_apply(
    hists: list[jax.Array], x: jax.Array, rtaps: jnp.ndarray
) -> tuple[list[jax.Array], jax.Array]:
    """Run ``x [C, T]`` through the full /2 cascade; returns ``[C, T/2^S]``.

    ``T`` must be divisible by ``2**len(hists)`` (the plan compiler sizes
    blocks so every stage divides evenly — the reference guarantees the same via its
    buffer-length rules, mainwindow.cpp:67-81).
    """
    new_hists = []
    y = x
    for hist in hists:
        hist, y = conv_block(hist, y, rtaps, stride=2)
        new_hists.append(hist)
    return new_hists, y


def cascade_init_planar(
    channels: int, stages: int, taps: int = 11
) -> list[jax.Array]:
    """Zero planar history ``[2, C, taps-1]`` f32 per stage (re/im planes)."""
    return [
        jnp.zeros((2, channels, taps - 1), jnp.float32) for _ in range(stages)
    ]


def cascade_tails_from_tail(
    tail: tuple[jax.Array, jax.Array],
    rtaps: jnp.ndarray,
    stages: int,
) -> list[jax.Array]:
    """Canonical per-stage histories ``[2, C, 10]`` re-derived from a
    stream TAIL (the last ``pallas.frontend.warmup_len(stages)`` samples
    of a cascade's input, already mixed).

    An FIR cascade forgets its initialization after its extent, so running
    the tail through a ZERO-initialized cascade leaves every stage's last
    10 input samples — exactly the streaming state — bit-correct.  This is
    what lets the stateless composite Pallas kernel coexist with the
    canonical (per-stage-history) checkpoint layout: the step re-derives
    the histories from the tail it has anyway (compiler/_front,
    dist/sharded.py).  ``tail`` lengths must be warmup_len-sized (power-of
    -two multiple, long enough per warmup_len's guarantee)."""
    from .fir import conv_block_planar, fir_history_init_planar

    c = tail[0].shape[0]
    y = tail
    tails: list[jax.Array] = []
    for _s in range(stages):
        tails.append(jnp.stack([y[0][:, -10:], y[1][:, -10:]]))
        _, y = conv_block_planar(
            fir_history_init_planar(c, 11), y, rtaps, stride=2
        )
    return tails


def cascade_apply_planar(
    hists: list[jax.Array],
    x: tuple[jax.Array, jax.Array],
    rtaps: jnp.ndarray,
) -> tuple[list[jax.Array], tuple[jax.Array, jax.Array]]:
    """Planar-complex form of :func:`cascade_apply` (the product path — no
    complex64 intermediates; see kernels/fir.py conv_block_planar)."""
    new_hists = []
    y = x
    for hist in hists:
        hist, y = conv_block_planar(hist, y, rtaps, stride=2)
        new_hists.append(hist)
    return new_hists, y
