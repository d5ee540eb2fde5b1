"""Same-session A/B of the fused front-end kernel variants.

The remote-TPU session's speed drifts ~2x between processes, so
cross-subprocess stage deltas cannot rank kernel variants.  This tool
times SEVERAL full-receiver builds in ONE process with the honest
fetch-forced method, interleaved, so variants share the session state:

    python tools/kernel_ab.py highest high default xla

Each positional arg is a variant: a Pallas dot-precision name, or "xla"
for the no-Pallas receiver.  Prints one JSON line per variant plus a
final ranking.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    variants = sys.argv[1:] or ["highest", "high"]
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver
    from sdrreceiver_tpu.obs.timing import honest_step_detail

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    block = 1536000 if on_tpu else 98304
    plan = build_plan(_benchmark_config())

    rxs = {}
    for v in variants:
        if v == "xla":
            rxs[v] = CompiledReceiver(plan, block)
            continue
        os.environ["SDRX_PALLAS_PRECISION"] = v
        rxs[v] = CompiledReceiver(
            plan, block, use_pallas=on_tpu, pallas_interpret=not on_tpu
        )
    os.environ.pop("SDRX_PALLAS_PRECISION", None)

    results = {}
    for v, rx in rxs.items():
        d = honest_step_detail(rx, 2, 8 if on_tpu else 4)
        results[v] = d
        print(json.dumps({
            "variant": v,
            "step_us": round(d["seconds"] * 1e6, 1),
            "step_us_median": round(d["seconds_median"] * 1e6, 1),
        }), flush=True)
    ranking = sorted(results, key=lambda v: results[v]["seconds"])
    print(json.dumps({"ranking": ranking}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
