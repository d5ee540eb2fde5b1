"""Chip-ceiling sweep: throughput vs load curve + capacity claim (round 5).

BENCH_r04 showed MFU 0.26% — the flagship workload is a rounding error for
a v5e, and nothing measured what one chip can actually HOST.  This tool
sweeps the two load axes and writes ``CAPACITY_r05.json``:

  * burst depth k in {4, 16, 64}: blocks per dispatch through the
    step_many lax.scan entry (offline-throughput scaling; the dispatch
    floor is paid once per k blocks)
  * channel count C in {27, 66, 128, 256}: synthetic CBAND-style configs
    (3 main groups, C subs, ALL matched to a main) — throughput + MFU vs
    channel load
  * realtime capacity: the flagship plan at the reference's own 0.25 s
    ingest buffer (mainwindow.cpp:67-81) — how many full 27-channel
    receivers one chip can serve back-to-back at realtime cadence
    (serial dispatch), and the burst-mode bound (throughput / fs)

    python tools/capacity_bench.py [--out CAPACITY_r05.json]
        [--skip-burst] [--skip-realtime] [--skip-channels] [--merge]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _chan_ini(n_subs: int) -> str:
    """CBAND-style 3-main config with n_subs channels, ALL matched to a
    main group (frequencies wrap within each main's coverage — the plain
    bench_matrix generator walks off the mains' bands past ~100 subs,
    silently turning the excess into full-input-rate direct channels and
    corrupting the channels-vs-cost curve)."""
    centers = (1545116000, 1546096000, 1546796000)
    rates = (384000, 192000, 192000)
    lines = [
        "sample_rate=1536000",
        "center_frequency=1545900000",
        "zmq_address=tcp://*:6003",
        "correct_dc_bias=1",
        "[main_vfos]",
        f"size={len(centers)}",
    ]
    for i, (f, r) in enumerate(zip(centers, rates), 1):
        lines += [f"{i}\\frequency={f}", f"{i}\\out_rate={r}"]
    lines += ["[vfos]", f"size={n_subs}"]
    for i in range(1, n_subs + 1):
        g = (i - 1) % 3
        span = rates[g] // 2
        freq = centers[g] - span // 2 + ((i // 3) * 9000) % span
        dr = (600, 1200, 10500)[g]
        lines += [
            f"{i}\\frequency={freq}",
            f"{i}\\gain=5",
            f"{i}\\data_rate={dr}",
            f"{i}\\topic=CH{i:03d}",
        ]
        if i % 5 == 0:
            lines.append(f"{i}\\filter_bandwidth=4000")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_ROOT, "CAPACITY_r05.json"))
    ap.add_argument("--skip-channels", action="store_true")
    ap.add_argument("--skip-burst", action="store_true")
    ap.add_argument("--skip-realtime", action="store_true")
    ap.add_argument("--merge", action="store_true",
                    help="update (not overwrite) an existing --out artifact")
    args = ap.parse_args()

    import jax

    from bench import _peaks
    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan, parse_ini_text
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver
    from sdrreceiver_tpu.obs.metrics import plan_cost_model
    from sdrreceiver_tpu.obs.timing import honest_burst_seconds, honest_step_detail

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    peaks = _peaks(dev)
    out: dict = {"device": str(dev)}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            out.update(json.load(f))
        out["device"] = str(dev)

    plan = build_plan(_benchmark_config())
    block = 1536000 if on_tpu else 98304

    # ---- burst-depth sweep (flagship plan, 1 s blocks) ----
    if not args.skip_burst:
        rx = CompiledReceiver(plan, block, use_pallas=on_tpu,
                              pallas_interpret=not on_tpu)
        burst_curve = []
        for k in (4, 16, 64):
            try:
                dtb = honest_burst_seconds(rx, k=k, m_small=1,
                                           m_big=3 if on_tpu else 2)
                burst_curve.append({
                    "k": k,
                    "block_us": round(dtb * 1e6, 1),
                    "msps": round(block / dtb / 1e6, 1),
                })
            except Exception as e:
                burst_curve.append({"k": k, "error": str(e)[:200]})
            print(json.dumps(burst_curve[-1]), flush=True)
        out["burst_depth_curve"] = burst_curve

    # ---- realtime capacity at the reference's 0.25 s buffer ----
    if not args.skip_realtime:
        rt_block = plan.block_samples  # 384000 = 0.25 s (mainwindow.cpp:67-81)
        rx_rt = CompiledReceiver(plan, rt_block, use_pallas=on_tpu,
                                 pallas_interpret=not on_tpu)
        d = honest_step_detail(rx_rt, 2, 8 if on_tpu else 4)
        step_s = d["seconds"]
        burst_s = None
        try:
            burst_s = honest_burst_seconds(rx_rt, k=16, m_small=1,
                                           m_big=3 if on_tpu else 2)
        except Exception as e:
            print(f"rt burst failed: {e}", file=sys.stderr)
        buffer_s = rt_block / plan.fs
        out["realtime_capacity"] = {
            "buffer_s": buffer_s,
            "step_us": round(step_s * 1e6, 1),
            "measurement_valid": bool(d.get("valid", True)),
            # back-to-back serial dispatch: one chip alternating between N
            # receivers' 0.25 s buffers inside the realtime budget
            "receivers_per_chip_serial": (
                int(buffer_s / step_s) if step_s > 0 else None
            ),
            "burst_block_us": round(burst_s * 1e6, 1) if burst_s else None,
            # burst bound: aggregate ingest the chip sustains / one
            # receiver's fs
            "receivers_per_chip_burst": (
                int((rt_block / burst_s) / plan.fs) if burst_s else None
            ),
        }
        print(json.dumps(out["realtime_capacity"]), flush=True)

    # ---- channel-count sweep ----
    if not args.skip_channels:
        chan_curve = []
        for c in (27, 66, 128, 256):
            try:
                p = (plan if c == 27
                     else build_plan(parse_ini_text(_chan_ini(c))))
                assert not any(g.direct for g in p.groups), (
                    f"{c}-sub sweep config has unmatched (direct) channels"
                )
                rxc = CompiledReceiver(p, block, use_pallas=on_tpu,
                                       pallas_interpret=not on_tpu)
                dc_ = honest_step_detail(rxc, 2, 8 if on_tpu else 4)
                sps = block / dc_["seconds"] if dc_["seconds"] > 0 else 0.0
                cost = plan_cost_model(p, block)
                mfu = (cost["flops_per_block"] / dc_["seconds"] / peaks[0]
                       if peaks and dc_["seconds"] > 0 else None)
                chan_curve.append({
                    "channels": p.num_channels(),
                    "step_us": round(dc_["seconds"] * 1e6, 1),
                    "step_us_median": round(
                        dc_["seconds_median"] * 1e6, 1
                    ),
                    "msps": round(sps / 1e6, 1),
                    "mfu": round(mfu, 5) if mfu is not None else None,
                    "valid": bool(dc_.get("valid", True)),
                })
            except Exception as e:
                chan_curve.append({"channels": c, "error": str(e)[:200]})
            print(json.dumps(chan_curve[-1]), flush=True)
        out["channel_curve"] = chan_curve
        mfus = [r["mfu"] for r in chan_curve if r.get("mfu")]
        out["peak_mfu"] = max(mfus) if mfus else None

    out["method"] = ("honest fetch-forced differential (obs/timing.py); "
                     "burst via step_many lax.scan")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
