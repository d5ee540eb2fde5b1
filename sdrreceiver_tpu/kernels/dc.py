"""DC-bias removal: one-pole EMA high-pass, evaluated block-parallel.

The reference runs, per complex sample (sdrj.cpp:277-283):

    avept = avept*(1 - 1e-6) + 1e-6*curr ;  curr -= avept

— a strictly sequential recurrence carried in a function-local static.  The
closed form of the recurrence ``m[n] = a*m[n-1] + alpha*x[n]`` is

    m[n] = a^(n+1)*m0 + alpha * sum_{i<=n} a^(n-i) x[i]

and because ``a = 1 - 1e-6`` decays slowly, the exponentials stay in a tame
range (a^-n < e^5 for any realistic block), so the weighted prefix sum can be
computed DIRECTLY: one [256, 256] triangular-band MXU dot for the within-
block prefix plus one tiny cross-block cumsum — instead of a sequential
scan.  This lowers to a handful of regular XLA ops (a
``lax.associative_scan`` at 1.5M elements took minutes of TPU compile; a
2048-lane cumsum formulation cost ~700 us/block in the round-3 honest
profile; this compiles in ~1 s and measures ~6x faster) and keeps relative
error ~1e-4 on the DC estimate (error floor ~-80 dB, far below the 60 dB
audio bound).

Exposed pieces: ``dc_block`` (the streaming block op) and ``zero_prefix``
(the m0=0 prefix, reused by the time-sharded variant in dist.halo where the
carried mean crosses device shards as a tiny affine composition).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dc_init",
    "dc_init_planar",
    "dc_block",
    "dc_block_planar",
    "zero_prefix",
    "decay_pow",
    "DEFAULT_ALPHA",
]

#: The reference's EMA coefficient (sdrj.cpp:11 ``val = 0.000001``).
DEFAULT_ALPHA = 1e-6

_BLOCK = 256


def dc_init(dtype=jnp.complex64) -> jax.Array:
    """Zero initial mean (the reference's ``avept = 0``, sdrj.cpp:280)."""
    return jnp.zeros((), dtype=dtype)


def decay_pow(alpha: float, n) -> np.ndarray | float:
    """a^n in float64 on the host (a = 1-alpha), returned as float32-safe."""
    return np.exp(np.multiply(n, np.log1p(-alpha), dtype=np.float64))


@functools.lru_cache(maxsize=8)
def _prefix_matrix(alpha: float, b: int) -> np.ndarray:
    """``W[i, j] = alpha * a^(j-i)`` for ``i <= j`` else 0 — the weighted
    within-block prefix as ONE [B, B] triangular-band matrix, so the inner
    prefix is a single MXU dot instead of a B-lane cumsum (a 2048-lane
    cumsum lowers to ~log2(B) full-array shifted-add passes: ~450 us of the
    round-3 DC cost on a 1.536 Ms block; the dot form measures ~6x faster
    end to end)."""
    i = np.arange(b, dtype=np.float64)
    w = alpha * decay_pow(alpha, i[None, :] - i[:, None])
    return np.triu(w).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("alpha", "t_len"))
def _zero_prefix_impl(x: jax.Array, alpha: float, t_len: int) -> jax.Array:
    b = min(_BLOCK, t_len)
    nb = -(-t_len // b)
    pad = nb * b - t_len
    lead = x.shape[:-1]

    kb = np.arange(nb, dtype=np.float64)
    a_bk_neg = jnp.asarray(decay_pow(alpha, -b * kb).astype(np.float32))
    a_bk_pos = jnp.asarray(decay_pow(alpha, b * kb).astype(np.float32))

    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)]) if pad else x
    xb = xp.reshape(*lead, nb, b)
    # v[k, j] = alpha * sum_{i<=j} a^(j-i) x[k, i]   (within-block prefix)
    if jnp.iscomplexobj(x):
        w = jnp.asarray(_prefix_matrix(alpha, b)).astype(xb.dtype)
    else:
        w = jnp.asarray(_prefix_matrix(alpha, b))
    v = jnp.matmul(xb, w, precision=jax.lax.Precision.HIGHEST)
    bk = v[..., -1]  # block totals
    # across blocks: m_end(k) = a^B m_end(k-1) + bk[k]  (m0 = 0), i.e.
    # P[k] = sum_{t<=k} a^(B(k-t)) bk[t] = a^(Bk) cumsum(bk[t] a^(-Bt))[k]
    p = jnp.cumsum(bk * a_bk_neg, axis=-1) * a_bk_pos
    # carry into block k is m_end(k-1); decays as a^(j+1) inside block k
    e = jnp.concatenate(
        [jnp.zeros_like(p[..., :1]), p[..., :-1]], axis=-1
    )
    # full prefix with m0=0: m[k, j] = a^(j+1) * E[k] + v[k, j]
    a_j1 = jnp.asarray(
        decay_pow(alpha, np.arange(1, b + 1, dtype=np.float64)).astype(np.float32)
    )
    m = a_j1 * e[..., None] + v
    m = m.reshape(*lead, nb * b)
    return m[..., :t_len]


def zero_prefix(x: jax.Array, alpha: float = DEFAULT_ALPHA) -> jax.Array:
    """``m`` for the whole block assuming zero initial mean (``[..., T]``)."""
    return _zero_prefix_impl(x, alpha, x.shape[-1])


def dc_block(
    mean: jax.Array, x: jax.Array, alpha: float = DEFAULT_ALPHA
) -> tuple[jax.Array, jax.Array]:
    """Remove DC from a ``[..., T]`` block.

    Returns (new_mean, y) with ``y[n] = x[n] - m[n]`` and the EMA mean
    threaded across block boundaries (chunked == whole up to float rounding).
    """
    t_len = x.shape[-1]
    v = zero_prefix(x, alpha)
    a_n1 = jnp.asarray(
        decay_pow(alpha, np.arange(1, t_len + 1, dtype=np.float64)).astype(np.float32)
    )
    m = a_n1 * mean + v
    y = x - m
    return m[..., -1], y


def dc_init_planar() -> jax.Array:
    """Zero initial mean as planar ``[2]`` f32 (re, im)."""
    return jnp.zeros((2,), jnp.float32)


def dc_block_planar(
    mean: jax.Array,
    x: tuple[jax.Array, jax.Array],
    alpha: float = DEFAULT_ALPHA,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    """Planar form of :func:`dc_block`: ``mean [2]`` f32, ``x = (re, im)``
    each ``[T]`` f32.  Identical recurrence, evaluated on a ``[2, T]`` stack
    so no complex64 array exists (TPU layout; see kernels/ingest.py)."""
    x2 = jnp.stack(x)
    t_len = x2.shape[-1]
    v = zero_prefix(x2, alpha)
    a_n1 = jnp.asarray(
        decay_pow(alpha, np.arange(1, t_len + 1, dtype=np.float64)).astype(np.float32)
    )
    m = a_n1[None, :] * mean[:, None] + v
    y = x2 - m
    return m[:, -1], (y[0], y[1])
