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

__all__ = [
    "honest_step_seconds",
    "honest_step_detail",
    "honest_burst_seconds",
    "honest_ab_seconds",
]


def _checksum(outs):
    import jax.numpy as jnp

    s = jnp.zeros((), jnp.float32)
    for v in outs.values():
        s = s + jnp.sum(jnp.abs(v.astype(jnp.float32)))
    return s


def honest_step_detail(
    rx,
    n_small: int = 2,
    n_big: int = 8,
    reps: int = 3,
    seed: int = 0,
) -> dict:
    """Honest per-block timing of ``rx``'s u8 step, with spread and
    DEGRADED-SESSION retries.

    Compiles two scan programs (n_small and n_big iterations of the real
    packed-state step over distinct random u8 blocks, outputs reduced to a
    checksum) and differentials them.  The remote-TPU tunnel sometimes
    drifts SYSTEMATICALLY during a measurement (observed r4: the big-n
    program ran faster wall-clock than the small-n one, yielding negative
    step times) — a differential only cancels the fixed RTT, not a trend.
    So each attempt is validated (both estimates positive, median within
    3x of best) and invalid attempts escalate to longer programs, whose
    device time dominates the drift.  Returns a dict:

      ``seconds``         best estimate (min small vs min big)
      ``seconds_median``  median-vs-median differential (session-noise view)
      ``attempts``        how many (n_small, n_big) escalations ran
      ``valid``           False when even the last attempt looked degraded
      ``raw``             {n: [rep wall times]} of the last attempt
    """
    import jax
    import jax.numpy as jnp

    body = rx._vec(rx._step_u8)
    vec0 = rx.init_state()

    def attempt(ns, nb):
        rng = np.random.default_rng(seed)
        xs_big = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (nb, 2 * rx.block)).astype(np.uint8)
        ))
        xs_small = xs_big[:ns]

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

        raw: dict[int, list[float]] = {}
        for xs in (xs_small, xs_big):
            _ = float(prog(xs))  # compile + settle
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = float(prog(xs))
                times.append(time.perf_counter() - t0)
            raw[xs.shape[0]] = times
        dn = nb - ns
        best = (min(raw[nb]) - min(raw[ns])) / dn
        med = (
            float(np.median(raw[nb])) - float(np.median(raw[ns]))
        ) / dn
        return best, med, raw

    sizes = [(n_small, n_big), (n_small, 3 * n_big), (2 * n_small, 6 * n_big)]
    best = med = 0.0
    raw: dict[int, list[float]] = {}
    n_att = 0
    valid = False
    for ns, nb in sizes:
        n_att += 1
        best, med, raw = attempt(ns, nb)
        if best > 0 and med > 0 and med <= 3 * best and best <= 3 * med:
            valid = True
            break
    return {
        "seconds": best,
        "seconds_median": med,
        "attempts": n_att,
        "valid": valid,
        "raw": raw,
    }


def honest_step_seconds(
    rx,
    n_small: int = 2,
    n_big: int = 8,
    reps: int = 3,
    seed: int = 0,
) -> float:
    """Honest seconds per ingest block of ``rx``'s u8 step (best estimate;
    see :func:`honest_step_detail` for the spread)."""
    return honest_step_detail(rx, n_small, n_big, reps, seed)["seconds"]


def honest_ab_seconds(
    rxs: dict,
    n_small: int = 2,
    n_big: int = 8,
    rounds: int = 5,
    seed: int = 0,
) -> dict:
    """Same-session ROUND-ROBIN comparison of several receivers' u8 steps.

    Sequential honest_step_detail calls straddle the remote session's
    minute-scale speed drift, which can dwarf a small A-B difference
    (round-4's shard_overhead came out NEGATIVE).  Here every receiver's
    small and big scan programs are compiled FIRST, then timed interleaved
    over ``rounds`` rounds (min per program), so all variants share the
    same session state.  Returns ``{name: {"seconds", "seconds_median",
    "valid"}}``; inputs are shared across variants (``rx.globalize`` is
    NOT applied — single-process receivers only).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    blocks = {rx.block for rx in rxs.values()}
    if len(blocks) != 1:
        raise ValueError(f"receivers disagree on block: {blocks}")
    block = blocks.pop()
    xs_big = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (n_big, 2 * block)).astype(np.uint8)
    ))
    xs_small = xs_big[:n_small]

    progs: dict[str, dict] = {}
    for name, rx in rxs.items():
        body = rx._vec(rx._step_u8)
        vec0 = rx.init_state()

        def make(body=body, vec0=vec0):
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
            return prog

        p = make()
        _ = float(p(xs_small))  # compile both sizes before ANY timing
        _ = float(p(xs_big))
        progs[name] = {"prog": p}

    raw = {name: {n_small: [], n_big: []} for name in rxs}
    for _r in range(rounds):
        for name in rxs:
            for n, xs in ((n_small, xs_small), (n_big, xs_big)):
                t0 = time.perf_counter()
                _ = float(progs[name]["prog"](xs))
                raw[name][n].append(time.perf_counter() - t0)
    dn = n_big - n_small
    result = {}
    for name in rxs:
        best = (min(raw[name][n_big]) - min(raw[name][n_small])) / dn
        med = (
            float(np.median(raw[name][n_big]))
            - float(np.median(raw[name][n_small]))
        ) / dn
        result[name] = {
            "seconds": best,
            "seconds_median": med,
            "valid": best > 0 and med > 0
            and med <= 3 * best and best <= 3 * med,
        }
    return result


def honest_burst_seconds(
    rx,
    k: int = 8,
    m_small: int = 1,
    m_big: int = 3,
    reps: int = 3,
    seed: int = 0,
) -> float:
    """Honest seconds per block through the BURST entry (``step_many_u8``):
    each scanned iteration dispatches one [k, 2T] stack through the k-block
    lax.scan executable — the offline-throughput path (core/runtime.py
    burst mode), where the per-dispatch floor is paid once per k blocks."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    xs_big = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (m_big, k, 2 * rx.block)).astype(np.uint8)
    ))
    xs_small = xs_big[:m_small]
    body = rx._vec_many(rx._step_u8)
    vec0 = rx.init_state()

    @jax.jit
    def prog(stacks):
        def b(carry, stack):
            vec, acc = carry
            vec2, outs = body(vec, stack)
            return (vec2, acc + _checksum(outs)), None
        (_, s), _ = jax.lax.scan(
            b, (vec0, jnp.zeros((), jnp.float32)), stacks
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
    return (t[m_big] - t[m_small]) / ((m_big - m_small) * k)
