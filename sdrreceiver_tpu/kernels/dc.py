"""DC-bias removal: one-pole EMA high-pass, as a parallel associative scan.

The reference runs, per complex sample (sdrj.cpp:277-283):

    avept = avept*(1 - 1e-6) + 1e-6*curr ;  curr -= avept

— a strictly sequential recurrence carried in a function-local static.  On
TPU the same recurrence is evaluated for a whole block in O(log T) parallel
steps with ``jax.lax.associative_scan`` over affine-map composition:

    m[n] = A[n]*m[n-1] + B[n]        (A = 1-alpha, B = alpha*x[n])
    (A2,B2) o (A1,B1) = (A1*A2, B1*A2 + B2)

and the carried state is the single complex mean, exactly like the reference.
Note the reference subtracts the *updated* mean (including the current
sample); reproduced here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dc_init", "dc_block", "DEFAULT_ALPHA"]

#: The reference's EMA coefficient (sdrj.cpp:11 ``val = 0.000001``).
DEFAULT_ALPHA = 1e-6


def dc_init(dtype=jnp.complex64) -> jax.Array:
    """Zero initial mean (the reference's ``avept = 0``, sdrj.cpp:280)."""
    return jnp.zeros((), dtype=dtype)


def _affine_combine(left, right):
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, b1 * a2 + b2


def dc_block(
    mean: jax.Array, x: jax.Array, alpha: float = DEFAULT_ALPHA
) -> tuple[jax.Array, jax.Array]:
    """Remove DC from a ``[T]`` (or ``[..., T]``) block.

    Returns (new_mean, y) with ``y[n] = x[n] - m[n]`` and the EMA mean ``m``
    threaded exactly across block boundaries (chunked == whole).
    """
    a = np.float32(1.0 - alpha)
    al = np.float32(alpha)
    a_arr = jnp.full(x.shape, a, dtype=x.real.dtype)
    prefix_a, prefix_b = jax.lax.associative_scan(
        _affine_combine, (a_arr, al * x), axis=-1
    )
    m = prefix_a * mean + prefix_b
    y = x - m
    return m[..., -1], y
