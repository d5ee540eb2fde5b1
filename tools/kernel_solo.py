"""Per-kernel honest timing of the fused front-end kernels, one session.

Builds the exact MixCascadeKernel instances the flagship receiver uses and
times each alone (scan over distinct inputs, checksum, fetch-forced
differential), so the ~N-hundred-us Pallas budget can be attributed to a
specific kernel shape rather than guessed from cumulative cuts.

    python tools/kernel_solo.py [highest|default]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    prec = sys.argv[1] if len(sys.argv) > 1 else "highest"
    os.environ["SDRX_PALLAS_PRECISION"] = prec
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    block = 1536000 if on_tpu else 98304
    plan = build_plan(_benchmark_config())
    rx = CompiledReceiver(plan, block, use_pallas=on_tpu,
                          pallas_interpret=not on_tpu)
    rng = np.random.default_rng(0)

    n1, n2 = (2, 8) if on_tpu else (2, 4)
    for key, (kern, warm) in rx._kernels.items():
        n_in = 1 if kern.shared_input else kern.c
        xs = jax.device_put(jnp.asarray(
            rng.standard_normal((n2, 2, n_in, kern.t_len)).astype(np.float32)
        ))
        phase = jnp.zeros((kern.c,), jnp.uint32)

        @jax.jit
        def prog(xs, kern=kern, phase=phase):
            def b(acc, x):
                yr, yi = kern(phase, x[0], x[1])
                return acc + jnp.sum(jnp.abs(yr)) + jnp.sum(jnp.abs(yi)), None
            s, _ = jax.lax.scan(b, jnp.zeros((), jnp.float32), xs)
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
        us = (t[n2] - t[n1]) / (n2 - n1) * 1e6
        print(json.dumps({
            "kernel": key, "c": kern.c, "stages": kern.d,
            "t_len": kern.t_len, "rows": kern.rows, "tiles": kern.n_tiles,
            "precision": prec, "us": round(us, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
