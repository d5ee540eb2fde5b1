"""One-session probe of MixCascadeKernel cost vs (channels, stages, tiling).

The g0/b1 bucket kernel (C=11, d=5, t=384000) measures ~3x more than 11x its
C=1 twin; this probes which axis causes the super-linearity.

    python tools/kernel_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _time_kernel(kern, n1=2, n2=6):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n_in = 1 if kern.shared_input else kern.c
    xs = jax.device_put(jnp.asarray(
        rng.standard_normal((n2, 2, n_in, kern.t_len)).astype(np.float32)
    ))
    phase = jnp.zeros((kern.c,), jnp.int32)
    h0 = kern.init_hists()

    @jax.jit
    def prog(xs):
        def b(carry, x):
            h, acc = carry
            yr, yi, h2 = kern(phase, h, x[0], x[1])
            return (h2, acc + jnp.sum(jnp.abs(yr)) + jnp.sum(jnp.abs(yi))), None
        (_, s), _ = jax.lax.scan(b, (h0, jnp.zeros((), jnp.float32)), xs)
        return s

    t = {}
    for n in (n1, n2):
        x_in = xs[:n]
        _ = float(prog(x_in))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(prog(x_in))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return (t[n2] - t[n1]) / (n2 - n1) * 1e6


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sdrreceiver_tpu.pallas.frontend import MixCascadeKernel

    fs, t = 384000, 384000
    freqs = lambda c: np.arange(1, c + 1) * 1000
    cases = [
        ("c1_d5_shared", dict(channels=1, stages=5, shared_input=True)),
        ("c2_d5_shared", dict(channels=2, stages=5, shared_input=True)),
        ("c4_d5_shared", dict(channels=4, stages=5, shared_input=True)),
        ("c11_d5_shared", dict(channels=11, stages=5, shared_input=True)),
        ("c11_d2_shared", dict(channels=11, stages=2, shared_input=True)),
        ("c11_d5_private", dict(channels=11, stages=5, shared_input=False)),
        # grid-step overhead sweep: same work (g0-group shape, 1.536 Ms,
        # d=2), tile count 15 / 125 / 4 — if cost tracks tiles, the
        # per-grid-step fixed overhead dominates the kernel budget
        ("g0_r400_t15", dict(channels=1, stages=2, shared_input=False,
                             t_len=1536000, rows=400)),
        ("g0_r48_t125", dict(channels=1, stages=2, shared_input=False,
                             t_len=1536000, rows=48)),
        ("g0_r1200_t5", dict(channels=1, stages=2, shared_input=False,
                             t_len=1536000, rows=1200)),
    ]
    for name, kw in cases:
        t_len = kw.pop("t_len", t)
        rows = kw.pop("rows", None)
        kern = MixCascadeKernel(
            kw["channels"], kw["stages"], fs if t_len == t else 1536000,
            freqs(kw["channels"]), t_len,
            shared_input=kw["shared_input"], rows=rows,
        )
        us = _time_kernel(kern)
        print(json.dumps({"case": name, "rows": kern.rows,
                          "tiles": kern.n_tiles, "us": round(us, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
