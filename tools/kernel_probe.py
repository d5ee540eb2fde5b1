"""One-session probe of MixCascadeKernel cost vs (channels, stages, tiling).

Compiles every case FIRST, then times all cases round-robin (3 rounds,
min), so the remote session's minute-scale drift cannot corrupt the
between-case comparison the way sequential compile+time runs did.

    python tools/kernel_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from sdrreceiver_tpu.pallas.frontend import MixCascadeKernel

    rng = np.random.default_rng(0)
    freqs = lambda c: np.arange(1, c + 1) * 1000

    from sdrreceiver_tpu.pallas.frontend import pick_warmup

    cases = [
        # the flagship's five composite-kernel shapes (t includes warm-up)
        ("g0_c1_d2", dict(c=1, d=2, fs=1536000, t=1536000)),
        ("g1_c1_d3", dict(c=1, d=3, fs=1536000, t=1536000)),
        ("b0_c1_d4", dict(c=1, d=4, fs=384000, t=384000, shared=True)),
        ("b1_c11_d5", dict(c=11, d=5, fs=384000, t=384000, shared=True)),
        ("g1b0_c15_d2", dict(c=15, d=2, fs=192000, t=192000, shared=True)),
        # grid-step-overhead probe: same group work at 47 vs 4 vs 8 tiles
        ("g0_r128_t47", dict(c=1, d=2, fs=1536000, t=1536000, rows=128)),
        ("g0_r1504_t4", dict(c=1, d=2, fs=1536000, t=1536000, rows=1504)),
        ("g0_r752_t8", dict(c=1, d=2, fs=1536000, t=1536000, rows=752)),
    ]
    for _n, kw in cases:
        kw["t"] = kw["t"] + pick_warmup(kw["d"], kw["t"], kw["fs"])

    # sub-ms kernels need LONG scans so the device time dwarfs the tunnel's
    # tens-of-ms RTT jitter: iterate n times over 8 distinct resident
    # blocks (distinct so XLA cannot hoist; n passed statically)
    n1, n2 = 16, 96
    progs = {}
    for name, kw in cases:
        kern = MixCascadeKernel(
            kw["c"], kw["d"], kw["fs"], freqs(kw["c"]), kw["t"],
            shared_input=kw.get("shared", False), rows=kw.get("rows"),
        )
        n_in = 1 if kern.shared_input else kern.c
        xs = jax.device_put(jnp.asarray(
            rng.standard_normal((8, 2, n_in, kern.t_len)).astype(np.float32)
        ))
        phase = jnp.zeros((kern.c,), jnp.uint32)

        def make(n, kern=kern, phase=phase):
            @jax.jit
            def prog(xs):
                def b(acc, i):
                    x = jax.lax.dynamic_index_in_dim(
                        xs, i % 8, keepdims=False
                    )
                    yr, yi = kern(phase, x[0], x[1])
                    return (
                        acc + jnp.sum(jnp.abs(yr)) + jnp.sum(jnp.abs(yi))
                    ), None
                s, _ = jax.lax.scan(
                    b, jnp.zeros((), jnp.float32),
                    jnp.arange(n, dtype=jnp.int32),
                )
                return s
            return prog

        p1, p2 = make(n1), make(n2)
        _ = float(p1(xs))  # compile both sizes now
        _ = float(p2(xs))
        progs[name] = (p1, p2, xs, kern)
        print(f"compiled {name} rows={kern.rows} tiles={kern.n_tiles}",
              file=sys.stderr, flush=True)

    best = {name: {n1: float("inf"), n2: float("inf")} for name, _ in cases}
    for _round in range(3):
        for name, _ in cases:
            p1, p2, xs, _k = progs[name]
            for n, prog in ((n1, p1), (n2, p2)):
                t0 = time.perf_counter()
                _ = float(prog(xs))
                best[name][n] = min(best[name][n], time.perf_counter() - t0)
    for name, kw in cases:
        _p1, _p2, _x, kern = progs[name]
        us = (best[name][n2] - best[name][n1]) / (n2 - n1) * 1e6
        print(json.dumps({"case": name, "rows": kern.rows,
                          "tiles": kern.n_tiles, "us": round(us, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
