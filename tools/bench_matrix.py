"""TPU throughput of EVERY BASELINE.json benchmark config (round-5 item).

BENCH_r*.json measures one config (the 27-channel sdr_25E-class flagship);
this tool runs the whole BASELINE config matrix on the chip with the same
honest fetch-forced-differential protocol (obs/timing.py) and writes
``BENCH_MATRIX_r05.json`` at the repo root:

  1. flagship_27ch      the bench.py plan (2 mains, 27 subs, 1.536 Msps)
  2. single_vfo         BASELINE config 1: one main -> one USB sub
  3. main_4lpf          BASELINE config 2: main + 4 subs w/ 10 kHz Hamming LPF
  4. sdr54W_all_1920k   BASELINE config 3+4: the real sdr_54W_all.ini —
                        1.92 Msps, 3 mains @240k, 14 subs, late /5 chains
                        (vfo.cpp:334-387 path)
  5. sdr54W_288k        BASELINE config 4: the real sdr_54W_288K.ini —
                        288 ksps, mix-only main (stages=0), late /6 chains
  6. cband_66ch         BASELINE config 5 scale: 3 mains, 66 subs
                        (CBAND_143E.ini's shape ~4x the channel count)

Each entry reports the PALLAS product mode (with automatic XLA fallback if
a kernel shape is unsupported), block = ~1 s of signal rounded to the plan
divisor, and measurement validity per obs/timing.honest_step_detail.

    python tools/bench_matrix.py [--out BENCH_MATRIX_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _single_vfo_ini() -> str:
    return """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
correct_dc_bias=1
[main_vfos]
size=1
1\\frequency=1545116000
1\\out_rate=384000
[vfos]
size=1
1\\frequency=1545005146
1\\gain=5
1\\data_rate=600
1\\topic=VFO01
"""


def _main_4lpf_ini() -> str:
    lines = [
        "sample_rate=1536000",
        "center_frequency=1545600000",
        "zmq_address=tcp://*:6003",
        "correct_dc_bias=1",
        "[main_vfos]",
        "size=1",
        "1\\frequency=1545116000",
        "1\\out_rate=384000",
        "[vfos]",
        "size=4",
    ]
    for i in range(1, 5):
        lines += [
            f"{i}\\frequency={1545005000 + 11000 * i}",
            f"{i}\\gain=5",
            f"{i}\\out_rate=48000",
            f"{i}\\filter_bandwidth=10000",
            f"{i}\\topic=LPF{i:02d}",
        ]
    return "\n".join(lines)


def _cband_scale_ini(n_subs: int = 66) -> str:
    """Config 5 shape (mirrors tests/test_dist.py)."""
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
        freq = centers[g] - rates[g] // 3 + (i // 3) * 9000
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


def measure(name, plan, on_tpu: bool) -> dict:
    import jax

    from sdrreceiver_tpu.graph.compiler import CompiledReceiver
    from sdrreceiver_tpu.obs.timing import honest_burst_seconds, honest_step_detail

    # ~1 s of signal, rounded up to the plan divisor AND to a group-rate
    # 256-lane alignment so every bucket kernel's t_len tiles (the Pallas
    # kernels want LANES-multiple lengths at the GROUP rate; e.g. 1.92 Ms
    # blocks leave tg = block>>3 = 240000 unaligned, silently dropping all
    # bucket kernels)
    div = plan.block_divisor()
    for g in plan.groups:
        # direct groups' bucket kernels run at the FULL input rate and
        # need the same 256 alignment (g.stages is 0 there, so the shift
        # is a no-op)
        if any(b.stages >= 1 for b in g.buckets):
            div = int(np.lcm(div, 256 << g.stages))
        elif not g.direct and g.stages >= 1:
            div = int(np.lcm(div, 256))
    want = plan.fs if on_tpu else plan.fs // 8
    block = ((want + div - 1) // div) * div
    mode = "pallas"
    try:
        rx = CompiledReceiver(plan, block, use_pallas=on_tpu,
                              pallas_interpret=not on_tpu)
        if on_tpu and not (rx._kernels or rx._front_merged):
            mode = "pallas(no-kernels)=xla"
    except Exception as e:
        print(f"{name}: pallas build failed ({e}); xla fallback",
              file=sys.stderr)
        rx, mode = CompiledReceiver(plan, block), "xla"
    n_small, n_big = (2, 8) if on_tpu else (2, 4)
    try:
        d = honest_step_detail(rx, n_small, n_big)
    except Exception as e:
        print(f"{name}: pallas run failed ({e}); xla fallback",
              file=sys.stderr)
        rx, mode = CompiledReceiver(plan, block), "xla"
        d = honest_step_detail(rx, n_small, n_big)
    sps = block / d["seconds"] if d["seconds"] > 0 else 0.0
    burst_sps = None
    try:
        dtb = honest_burst_seconds(rx, k=8, m_small=1, m_big=3 if on_tpu else 2)
        burst_sps = block / dtb if dtb > 0 else None
    except Exception as e:
        print(f"{name}: burst failed ({e})", file=sys.stderr)
    # plausibility cross-check: the step CANNOT be much faster than the
    # burst path (same work, amortized dispatch) — a step reading >3x the
    # burst throughput means the differential collapsed (observed once:
    # 14.6 us/1.5 Ms block = 105 Gsps, vs a correct 344 us re-measure).
    # Retry once; if still implausible, publish the burst-bounded figure
    # and mark the measurement invalid.
    if burst_sps and sps > 3 * burst_sps:
        print(f"{name}: implausible step ({sps/1e6:.0f} Msps vs burst "
              f"{burst_sps/1e6:.0f}); re-measuring", file=sys.stderr)
        d = honest_step_detail(rx, n_small, n_big, seed=1)
        sps = block / d["seconds"] if d["seconds"] > 0 else 0.0
        if sps > 3 * burst_sps:
            # publish the burst-bounded figure CONSISTENTLY: step_us and
            # msps must agree (a bounded msps next to the collapsed 14.6 us
            # step_us would contradict itself by ~70x)
            sps = burst_sps
            d = dict(d)
            d["valid"] = False
            d["seconds"] = block / burst_sps
            d["seconds_median"] = block / burst_sps
    return {
        "config": name,
        "fs": plan.fs,
        "channels": plan.num_channels(),
        "groups": len(plan.groups),
        "block": block,
        "mode": mode,
        "step_us": round(d["seconds"] * 1e6, 1),
        "step_us_median": round(d["seconds_median"] * 1e6, 1),
        "msps": round(sps / 1e6, 1),
        "burst_msps": round(burst_sps / 1e6, 1) if burst_sps else None,
        "vs_baseline": round(max(sps, burst_sps or 0.0) / 1e9, 3),
        "realtime_factor": round(sps / plan.fs, 1),
        "measurement_valid": bool(d.get("valid", True)),
        "attempts": d.get("attempts"),
    }


def measure_roundrobin(plans: dict, on_tpu: bool, rounds: int = 5) -> list:
    """All configs' step programs compiled FIRST, then timed interleaved —
    the sequential measure() runs each config in a different session-speed
    window (the remote session drifts up to ~3x between minute-scale
    windows), so cross-config comparisons from one sequential sweep are
    only order-of-magnitude.  This mode gives one consistent window for
    the whole matrix (steps only; burst figures still come from
    measure())."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from sdrreceiver_tpu.graph.compiler import CompiledReceiver

    n1, n2 = (2, 8) if on_tpu else (2, 4)
    progs = {}
    rng = np.random.default_rng(0)
    for name, plan in plans.items():
        div = plan.block_divisor()
        for g in plan.groups:
            if any(b.stages >= 1 for b in g.buckets):
                div = int(np.lcm(div, 256 << g.stages))
            elif not g.direct and g.stages >= 1:
                div = int(np.lcm(div, 256))
        want = plan.fs if on_tpu else plan.fs // 8
        block = ((want + div - 1) // div) * div
        rx = CompiledReceiver(plan, block, use_pallas=on_tpu,
                              pallas_interpret=not on_tpu)
        body = rx._vec(rx._step_u8)
        vec0 = rx.init_state()
        xs_big = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (n2, 2 * block)).astype(np.uint8)))
        xs = {n1: xs_big[:n1], n2: xs_big}

        def make(n, body=body, vec0=vec0):
            @jax.jit
            def prog(x):
                def b(carry, xi):
                    v, acc = carry
                    v2, outs = body(v, xi)
                    s = jnp.zeros((), jnp.float32)
                    for o in outs.values():
                        s = s + jnp.sum(jnp.abs(o.astype(jnp.float32)))
                    return (v2, acc + s), None
                (_, s), _ = jax.lax.scan(
                    b, (vec0, jnp.zeros((), jnp.float32)), x)
                return s
            return prog

        p = {n: make(n) for n in (n1, n2)}
        for n in (n1, n2):
            _ = float(p[n](xs[n]))  # compile everything before ANY timing
        progs[name] = (p, xs, plan, block)
        print(f"compiled {name} block={block}", file=sys.stderr, flush=True)

    best = {name: {n1: float("inf"), n2: float("inf")} for name in progs}
    med = {name: {n1: [], n2: []} for name in progs}
    for _r in range(rounds):
        for name, (p, xs, _pl, _b) in progs.items():
            for n in (n1, n2):
                t0 = _time.perf_counter()
                _ = float(p[n](xs[n]))
                dt = _time.perf_counter() - t0
                best[name][n] = min(best[name][n], dt)
                med[name][n].append(dt)
    rows = []
    for name, (p, xs, plan, block) in progs.items():
        b = (best[name][n2] - best[name][n1]) / (n2 - n1)
        m = (float(np.median(med[name][n2]))
             - float(np.median(med[name][n1]))) / (n2 - n1)
        sps = block / b if b > 0 else 0.0
        rows.append({
            "config": name,
            "fs": plan.fs,
            "channels": plan.num_channels(),
            "block": block,
            "step_us": round(b * 1e6, 1),
            "step_us_median": round(m * 1e6, 1),
            "msps": round(sps / 1e6, 1),
            "vs_baseline": round(sps / 1e9, 3),
            "realtime_factor": round(sps / plan.fs, 1),
            "valid": b > 0 and m > 0 and m <= 3 * b and b <= 3 * m,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_ROOT, "BENCH_MATRIX_r05.json"))
    ap.add_argument("--only", default=None, help="comma list of config names")
    ap.add_argument("--roundrobin", action="store_true",
                    help="one consistent session window for ALL configs: "
                    "compile everything first, interleave step timing "
                    "(results go to a 'roundrobin_steps' artifact section)")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan, load_ini, parse_ini_text

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)

    cases = {
        "flagship_27ch": lambda: build_plan(_benchmark_config()),
        "single_vfo": lambda: build_plan(parse_ini_text(_single_vfo_ini())),
        "main_4lpf": lambda: build_plan(parse_ini_text(_main_4lpf_ini())),
        "sdr54W_all_1920k": lambda: build_plan(
            load_ini("/root/reference/sample_ini/sdr_54W_all.ini")
        ),
        "sdr54W_288k": lambda: build_plan(
            load_ini("/root/reference/sample_ini/sdr_54W_288K.ini")
        ),
        "cband_66ch": lambda: build_plan(parse_ini_text(_cband_scale_ini(66))),
    }
    only = set(args.only.split(",")) if args.only else None

    if args.roundrobin:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            plans = {name: mk() for name, mk in cases.items()
                     if not only or name in only}
        rows = measure_roundrobin(plans, on_tpu)
        out = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                out = json.load(f)
        out["device"] = str(dev)
        out["roundrobin_steps"] = {
            "rows": rows,
            "method": "ALL configs' step programs compiled first, timed "
                      "interleaved in ONE session window (cross-config "
                      "ratios are meaningful; the sequential 'rows' above "
                      "were each measured in a different window)",
        }
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}", file=sys.stderr)
        return 0

    rows = []
    for name, mk in cases.items():
        if only and name not in only:
            continue
        try:
            row = measure(name, mk(), on_tpu)
        except Exception as e:
            row = {"config": name, "error": str(e)[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"device": str(dev), "rows": rows,
           "method": "honest fetch-forced differential (obs/timing.py), "
                     "~1 s blocks, pallas product mode"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
