"""Honest on-device step timing (fetch-forced differential).

``jax.block_until_ready`` does NOT reliably await execution on the remote
"axon" TPU backend: identical idle-queue calls report anywhere from 0.2 ms
to 50 ms depending on invisible client state, and a chained-dispatch loop
measures the ENQUEUE rate, not device compute — round-3 measurement showed
the old loop was ~2000x optimistic on the full receiver step.  The only
trustworthy synchronization is a host fetch, and fetches are themselves
expensive over the tunnel (~10-25 MB/s download, ~tens of ms RTT).

The honest protocol, validated against a bf16 matmul chain measuring
183.7 TFLOP/s = 93% of the v5e's public peak:

  1. run the step n times inside ONE program via ``lax.scan`` over distinct
     input rows (distinct so XLA cannot hoist the body), carrying the real
     streaming state;
  2. reduce every output to one f32 checksum inside the program (keeps all
     compute live, eliminates output-download time);
  3. fetch the scalar (forces execution of the whole chain);
  4. difference a small-n and a big-n program so the fixed per-call RTT
     cancels:  per_block = (T(n2) - T(n1)) / (n2 - n1).

This is also the right measurement on well-behaved backends (CPU, local
TPU): it reduces to plain amortized timing there.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["honest_step_seconds"]


def _checksum(outs):
    import jax.numpy as jnp

    s = jnp.zeros((), jnp.float32)
    for v in outs.values():
        s = s + jnp.sum(jnp.abs(v.astype(jnp.float32)))
    return s


def honest_step_seconds(
    rx,
    n_small: int = 2,
    n_big: int = 8,
    reps: int = 3,
    seed: int = 0,
) -> float:
    """Honest seconds per ingest block of ``rx``'s u8 step.

    Compiles two scan programs (n_small and n_big iterations of the real
    packed-state step over distinct random u8 blocks, outputs reduced to a
    checksum) and returns the differential per-block time.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xs_big = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (n_big, 2 * rx.block)).astype(np.uint8)
    ))
    xs_small = xs_big[:n_small]
    body = rx._vec(rx._step_u8)
    vec0 = rx.init_state()

    @jax.jit
    def prog(xs):
        def b(carry, x):
            vec, acc = carry
            vec2, outs = body(vec, x)
            return (vec2, acc + _checksum(outs)), None
        (_, s), _ = jax.lax.scan(
            b, (vec0, jnp.zeros((), jnp.float32)), xs
        )
        return s

    t = {}
    for xs in (xs_small, xs_big):
        _ = float(prog(xs))  # compile + settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(prog(xs))
            best = min(best, time.perf_counter() - t0)
        t[xs.shape[0]] = best
    return (t[n_big] - t[n_small]) / (n_big - n_small)
