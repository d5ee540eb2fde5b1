"""Time-block sharding with collective halo exchange of streaming state.

The reference's streaming-state discipline — every FIR carrying its last
``ntaps - 1`` inputs across block boundaries (FIRQueueBackToFront,
jonti/dsp.cpp:163-173), the NCO carrying phase (oscillator.cpp:39-50), the DC
EMA carrying its mean (sdrj.cpp:280) — is exactly a halo exchange once a block
is split across devices along time: shard ``i`` needs the last samples of
shard ``i-1`` (and shard 0 needs the state carried from the previous block).

These kernels run inside ``jax.shard_map`` over a ``time`` mesh axis:

  * FIR/cascade halos move by ``lax.ppermute`` right-shift (shard 0's missing
    left neighbor yields zeros, which is exactly where the carried history is
    substituted)
  * NCO phase needs no communication at all: shard offsets are computed
    analytically from the exact integer phase step
  * the DC EMA crosses shards with an O(n_shards) affine prefix composition
    on 1-sample summaries (an associative exclusive scan over devices)

Everything here is PLANAR — complex signals travel as ``(re, im)`` f32 pairs
(or stacked ``[2, ...]`` planes for state/halo payloads) and no complex64
array exists inside the shard_map.  complex64 lowers to minor-dim-2 layouts
on TPU and costs 10-50x roofline per op (round-3 honest profile,
tools/layout_probe.py) — on a real mesh the fallback front is a product
path, so it gets the same layout discipline as the single-chip step.

Everything here is property-tested against the unsharded planar kernels:
time-sharded output == single-device output, bit-for-bit state carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..kernels import nco as nco_mod
from ..kernels.fir import conv_block_planar

__all__ = [
    "right_halo",
    "timeshard_cascade_local",
    "timeshard_mix_local",
    "timeshard_dc_local",
]


def right_halo(x_local: jax.Array, width: int, axis_name: str) -> jax.Array:
    """Each shard receives the last ``width`` time samples of its LEFT
    neighbor (shard 0 receives zeros).  ``x_local [..., T_local]``."""
    n = lax.axis_size(axis_name)
    tail = x_local[..., -width:]
    if n == 1:
        return jnp.zeros_like(tail)
    return lax.ppermute(tail, axis_name, [(i, i + 1) for i in range(n - 1)])


def _bcast_from_last(v: jax.Array, axis_name: str) -> jax.Array:
    """Every shard gets the last shard's value (the new carried state)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return v
    ag = lax.all_gather(v, axis_name)  # [n, ...]
    return ag[-1]


def timeshard_cascade_local(
    hists: list[jax.Array],
    x: tuple[jax.Array, jax.Array],
    rtaps: jax.Array,
    axis_name: str,
) -> tuple[list[jax.Array], tuple[jax.Array, jax.Array]]:
    """Half-band /2 cascade on a time shard; call inside shard_map.

    ``hists`` are the carried block-boundary histories in the canonical
    planar layout (``[2, C, taps-1]`` f32 per stage, replicated across
    shards; only shard 0 consumes them).  ``x = (re, im)`` f32, each
    ``[C, T_local]``; local length must be divisible by ``2**len(hists)``.
    Returns (new replicated planar histories, local planar output).
    """
    idx = lax.axis_index(axis_name)
    y = x
    new_hists = []
    for hist in hists:
        width = hist.shape[-1]
        y2 = jnp.stack(y)  # [2, C, T] planes (major-dim stack, TPU-cheap)
        halo = right_halo(y2, width, axis_name)
        left = jnp.where(idx == 0, hist, halo)
        new_hists.append(_bcast_from_last(y2[..., -width:], axis_name))
        _, y = conv_block_planar(left, y, rtaps, stride=2)
    return new_hists, y


def timeshard_mix_local(
    state: dict,
    x: tuple[jax.Array, jax.Array],
    fs: int,
    t_local: int,
    axis_name: str,
) -> tuple[dict, tuple[jax.Array, jax.Array]]:
    """NCO mix on a time shard: zero-communication analytic phase offsets.

    Shard ``i`` mixes with phase ``phase0 + i * (f * t_local mod fs)``; the
    new carried phase is ``phase0 + n * (f * t_local mod fs)`` — all exact
    integer arithmetic (kernels.nco), so sharded == unsharded to the bit.
    ``x = (re, im)`` f32, each ``[T_local]`` or ``[C, T_local]``.
    """
    idx = lax.axis_index(axis_name).astype(jnp.uint32)
    n = lax.axis_size(axis_name)
    step = nco_mod.block_step_mod(state, fs, t_local)  # [C]
    local_state = dict(state)
    local_state["phase"] = (state["phase"] + (idx * step) % fs) % fs
    _, y = nco_mod.mix_block_planar(local_state, x, fs)
    new_state = dict(state)
    new_state["phase"] = (state["phase"] + (jnp.uint32(n) * step) % fs) % fs
    return new_state, y


def timeshard_dc_local(
    mean: jax.Array,
    x: tuple[jax.Array, jax.Array],
    axis_name: str,
    alpha: float = 1e-6,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """DC-EMA removal on a time shard.

    ``mean`` is the carried planar mean ``[2]`` f32; ``x = (re, im)`` f32,
    each ``[T_local]``.  Within the shard: the same blocked closed-form
    prefix as kernels.dc, evaluated on the ``[2, T]`` plane stack.  Across
    shards: each shard reduces to one affine map m -> A*m + B with constant
    A = a^T_local; an all-gather of the n per-plane B's lets every shard
    compose its exclusive prefix and apply it to the carried mean.
    """
    from ..kernels import dc as dc_mod

    x2 = jnp.stack(x)  # [2, T_local]
    t_local = x2.shape[-1]
    v = dc_mod.zero_prefix(x2, alpha)  # local prefix with m0 = 0
    b_tot = v[..., -1]  # [2]
    a_t = np.float32(dc_mod.decay_pow(alpha, float(t_local)))

    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    ag_b = lax.all_gather(b_tot, axis_name)  # [n, 2]
    # exclusive prefix: carried mean at this shard's start (n static, tiny)
    m0 = mean
    new_mean = mean
    for j in range(n):
        new_mean = a_t * new_mean + ag_b[j]
        m0 = jnp.where(j < idx, a_t * m0 + ag_b[j], m0)
    a_n1 = jnp.asarray(
        dc_mod.decay_pow(alpha, np.arange(1, t_local + 1, dtype=np.float64)).astype(
            np.float32
        )
    )
    m = a_n1[None, :] * m0[:, None] + v
    y = x2 - m
    return new_mean, (y[0], y[1])
