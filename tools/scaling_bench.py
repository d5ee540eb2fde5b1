"""Scaling-efficiency benchmark: sharded receiver throughput vs device count.

Runs the flagship 27-channel receiver (``__graft_entry__._benchmark_config``)
through ``dist.ShardedReceiver`` over (time x chan) meshes of 1, 2, 4, 8
devices and reports IQ samples/s per mesh size — the BASELINE.md "scaling at
1 chip / 1 host / N hosts" methodology.

On real multi-chip hardware every device adds compute, the halo exchange
rides ICI, and ``relative_throughput`` (vs the 1-device run, same total
work) divided by n IS the scaling efficiency.  In this container only one
TPU chip is reachable, so by default this runs on N VIRTUAL CPU devices
sharing the same physical cores: sharding adds collective/partition
overhead but zero extra compute, so ``relative_throughput`` <= 1.0 here by
construction and directly measures that overhead (0.5 at 8 shards means
the sharded program spends half its time in partitioning + halo exchange
on this host — an upper bound that ICI-connected TPUs beat easily).

Usage:  python tools/scaling_bench.py [--devices 8] [--block 196608]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--block", type=int, default=196608, help="samples per step per mesh")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chan-axis", type=int, default=1, help="mesh chan-axis size")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    # platform choice must happen BEFORE the first backend init (see
    # __graft_entry__.dryrun_multichip): if none is initialized yet, force
    # the n-virtual-device CPU backend — the ambient platform here is a
    # single-chip remote-TPU plugin and can never supply n devices.
    try:
        from jax._src import xla_bridge

        initialized = xla_bridge.backends_are_initialized()
    except Exception:
        initialized = False
    if not initialized:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    if len(jax.devices()) < args.devices:
        raise SystemExit(
            f"need {args.devices} devices, have {len(jax.devices())}"
        )

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.dist import ShardedReceiver, make_mesh
    from sdrreceiver_tpu.graph import build_plan

    plan = build_plan(_benchmark_config())
    rng = np.random.default_rng(0)

    sizes = [n for n in (1, 2, 4, 8) if n <= args.devices]
    results = []
    base_sps = None
    for n in sizes:
        n_chan = args.chan_axis if n % args.chan_axis == 0 and n >= args.chan_axis else 1
        mesh = make_mesh(
            n_time=n // n_chan, n_chan=n_chan, devices=jax.devices()[:n]
        )
        div = plan.block_divisor() * mesh.shape["time"]
        block = (args.block // div) * div or div
        rx = ShardedReceiver(plan, mesh, block_samples=block)
        x = jnp.asarray(
            (rng.standard_normal(block) + 1j * rng.standard_normal(block)).astype(
                np.complex64
            )
        )
        state = rx.init_state()
        state, out = rx.step_iq(state, x)  # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, out = rx.step_iq(state, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        sps = block * args.iters / dt
        if base_sps is None:
            base_sps = sps
        results.append(
            {
                "devices": n,
                "mesh": dict(mesh.shape),
                "block": block,
                "msps": round(sps / 1e6, 2),
                "relative_throughput": round(sps / base_sps, 3),
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "sharded receiver scaling (27ch, time x chan mesh)",
                "platform": jax.devices()[0].platform,
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
