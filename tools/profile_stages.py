"""Per-stage on-chip timing of the flagship receiver step, by ABLATION.

Standalone micro-programs mis-measure on the remote-TPU backend (several
small fused conv+int16 programs hang its compiler or poison the session —
see PARITY.md "axon quirks"), so stages are timed as cumulative variants of
the REAL step: each variant runs the pipeline up to a cut point and emits
that point's tensors; XLA dead-code-eliminates everything after the cut.
The difference between consecutive variants is the cost of the stage between
their cut points.  Every variant is a full-step-shaped program (u8 in,
planar f32 / 1-D int16 out), so none of the small-program quirks apply; each
variant runs in its own subprocess so a backend degradation cannot
contaminate later measurements.

Usage:
    python tools/profile_stages.py            # all variants, table + deltas
    python tools/profile_stages.py --json     # one JSON line
    python tools/profile_stages.py --stage front  # a single variant (JSON)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

# cut points, in pipeline order: each includes everything before it
STAGES = ["ingest", "dc", "front", "bucket_mix", "bucket_casc", "usb",
          "audio", "full", "full_pallas"]


def _build_variant(rx, stage: str):
    """A jittable (packed_state_vec, u8) -> outputs step cut at ``stage``.

    Mirrors CompiledReceiver._step_planar / _bucket_step using the
    receiver's own consts, PLANAR kernels and (if the receiver was built
    with use_pallas) its fused kernels, so the cuts profile the real
    product path; returns only planar f32 (and the full step's int16)
    outputs."""
    import jax
    import jax.numpy as jnp

    from sdrreceiver_tpu.kernels import (
        dc, fir, halfband, ingest, nco, ossfft, usbdemod,
    )

    plan = rx.plan
    cut = STAGES.index(stage)

    fused_u8 = getattr(rx, "_dc_kernel_u8", None) is not None

    def step(vec, raw):
        state = rx._svec.unpack(vec)
        outs = {}
        x_rows = None
        dc_mean = None
        if fused_u8:
            # the product u8 path fuses ingest INTO the DC kernel and keeps
            # the planes in ROW form (compiler._step_u8); the "ingest" cut
            # is the u8->i8 row deinterleave alone and the "dc" cut is the
            # whole fused kernel
            if cut == 0:
                x8 = ingest.u8_iq_to_i8_rows(raw)
                return {"re": x8[0].astype(jnp.float32),
                        "im": x8[1].astype(jnp.float32)}
            dc_mean, x_rows = rx._dc_kernel_u8(
                state["dc"], ingest.u8_iq_to_i8_rows(raw)
            )
            x = (x_rows[0].reshape(-1), x_rows[1].reshape(-1))
            if cut == 1:
                return {"re": x_rows[0], "im": x_rows[1]}
        else:
            x = ingest.u8_iq_to_planar(raw)
            if cut == 0:
                return {"re": x[0], "im": x[1]}
            if plan.dc_correct and getattr(rx, "_dc_kernel", None) is not None:
                dc_mean, x = rx._dc_kernel(state["dc"], x)
            elif plan.dc_correct:
                dc_mean, x = dc.dc_block_planar(state["dc"], x)
            if cut == 1:
                return {"re": x[0], "im": x[1]}
        # x is already DC-corrected: pass dc_mean so _front does NOT run a
        # second DC pass (would inflate the front..audio cuts by one full
        # DC cost and deflate quantize+rest — a round-5 review finding)
        _, _, zs = rx._front(state, x, dc_mean=dc_mean, x_rows=x_rows)
        if cut == 2:
            gz = {k: v for k, v in zs.items() if not k.startswith("rows/")}
            return {f"{k}_re": v[0][0] for k, v in gz.items()} | {
                f"{k}_im": v[1][0] for k, v in gz.items()
            }
        for g in plan.groups:
            gk = f"g{g.index}"
            zr, zi = zs[gk]
            for bi, b in enumerate(g.buckets):
                bk = f"{gk}/b{bi}"
                bs = state[gk][f"b{bi}"]
                if bk in rx._kernels and cut >= 4:
                    # fused mix+cascade (cannot be cut mid-kernel):
                    # stateless composite kernel with the derived warm-up
                    # prefix, exactly as CompiledReceiver._bucket_step
                    kern, warm = rx._kernels[bk]
                    ztr, zti = rx._prev_group_tail(state, g, warm)
                    ph = nco.phase_minus(
                        bs["nco"], b.mix_fs(g.out_rate), warm
                    )
                    z_rows = zs.get(f"rows/{gk}")
                    if z_rows is not None and warm % 256 == 0:
                        yr, yi = kern(
                            ph,
                            jnp.concatenate(
                                [ztr.reshape(-1, 256), z_rows[0]]
                            )[None],
                            jnp.concatenate(
                                [zti.reshape(-1, 256), z_rows[1]]
                            )[None],
                        )
                    else:
                        yr, yi = kern(
                            ph,
                            jnp.concatenate([ztr, zr], axis=-1),
                            jnp.concatenate([zti, zi], axis=-1),
                        )
                    drop = warm >> b.stages
                    y = (yr[:, drop:], yi[:, drop:])
                    if b.late_factor > 1:
                        _, y = fir.conv_block_planar(
                            bs["late"], y, rx._consts[f"{bk}/late"],
                            b.late_factor,
                        )
                else:
                    _, y = nco.mix_block_planar(
                        bs["nco"], (zr[0], zi[0]), b.mix_fs(g.out_rate)
                    )
                    if cut >= 4:
                        _, y = halfband.cascade_apply_planar(
                            bs["cascade"], y, rx._consts[f"{bk}/hb"]
                        )
                        if b.late_factor > 1:
                            _, y = fir.conv_block_planar(
                                bs["late"], y, rx._consts[f"{bk}/late"],
                                b.late_factor,
                            )
                if cut <= 4:
                    outs[f"{bk}_re"] = y[0]
                    outs[f"{bk}_im"] = y[1]
                    continue
                _, audio = usbdemod.usb_block_planar(
                    bs["usb"], y, rx._consts[f"{bk}/hilbert"]
                )
                if cut >= 6:
                    if f"{bk}/audio_oss" in rx._consts:
                        _, audio = ossfft.oss_block(
                            bs["audio"], audio, rx._consts[f"{bk}/audio_oss"]
                        )
                        audio = audio.real
                    elif f"{bk}/audio" in rx._consts:
                        _, audio = fir.conv_block(
                            bs["audio"], audio, rx._consts[f"{bk}/audio"]
                        )
                if cut <= 6:
                    outs[f"{bk}_a"] = audio
                    continue
                pcm = usbdemod.quantize_i16(audio, rx._consts[f"{bk}/gains"])
                outs[f"pcm/{bk}"] = pcm.reshape(-1)
        return outs

    return jax.jit(step)


def _checksum(outs) -> "jax.Array":
    import jax.numpy as jnp

    s = jnp.zeros((), jnp.float32)
    for v in (outs.values() if isinstance(outs, dict) else outs):
        s = s + jnp.sum(jnp.abs(v.astype(jnp.float32)))
    return s


def _honest_time(make_prog, xs_small, xs_big, reps: int = 3) -> float:
    """Per-iteration seconds by the fetch-forced DIFFERENTIAL method.

    ``jax.block_until_ready`` does NOT reliably await execution on the
    remote-TPU backend (measured round 3: identical calls report 0.2 ms or
    50 ms depending on invisible client state — the old chained-dispatch
    timings here were enqueue-rate fiction, off by ~2000x).  The only
    trustworthy sync is a host fetch.  So: run the body n times inside ONE
    program via lax.scan over distinct input rows (distinct so XLA cannot
    hoist the loop body), reduce every output to one f32 checksum (keeps all
    compute live, kills output-download time, which runs at ~10-25 MB/s over
    the tunnel), fetch the scalar, and difference a small-n and a big-n
    program so the fixed RTT cancels.  Validated against a bf16 matmul chain
    at 183.7 TFLOP/s = 93% of v5e peak."""
    t = {}
    tm = {}
    for xs in (xs_small, xs_big):
        prog = make_prog(xs.shape[0])
        _ = float(prog(xs))  # compile + settle
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(prog(xs))
            times.append(time.perf_counter() - t0)
        t[xs.shape[0]] = min(times)
        tm[xs.shape[0]] = float(np.median(times))
    n1, n2 = xs_small.shape[0], xs_big.shape[0]
    best = (t[n2] - t[n1]) / (n2 - n1)
    med = (tm[n2] - tm[n1]) / (n2 - n1)
    return best, med


def measure_stage(stage: str, block: int | None, loops: int,
                  pallas: bool = False) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    plan = build_plan(_benchmark_config())
    block = block or (1536000 if on_tpu else 98304)

    def make_xs(n1, n2):
        rng = np.random.default_rng(0)
        xs_big = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (n2, 2 * block)).astype(np.uint8)
        ))
        return xs_big[:n1], xs_big

    if stage in ("full", "full_pallas"):
        rx = CompiledReceiver(
            plan, block, use_pallas=(stage == "full_pallas" and on_tpu),
            pallas_interpret=(stage == "full_pallas" and not on_tpu),
        )
        body = rx._vec(rx._step_u8)
        vec0 = rx.init_state()

        def make_prog(n):
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
    else:
        rx = CompiledReceiver(plan, block, use_pallas=pallas and on_tpu,
                              pallas_interpret=pallas and not on_tpu)
        fn = _build_variant(rx, stage)
        vec0 = rx.init_state()

        def make_prog(n):
            @jax.jit
            def prog(xs):
                def b(acc, x):
                    return acc + _checksum(fn(vec0, x)), None
                s, _ = jax.lax.scan(b, jnp.zeros((), jnp.float32), xs)
                return s
            return prog

    # degraded-session retry: a systematic tunnel-speed trend during the
    # measurement defeats the differential (observed r4: negative stage
    # times); escalate to longer programs until best/median agree
    sizes = [(4, 16), (4, 48)] if on_tpu else [(2, 6)]
    dt = med = 0.0
    valid = False
    for n1, n2 in sizes:
        xs_small, xs_big = make_xs(n1, n2)
        dt, med = _honest_time(make_prog, xs_small, xs_big)
        if dt > 0 and med > 0 and med <= 3 * dt and dt <= 3 * med:
            valid = True
            break
    return {"stage": stage, "us": dt * 1e6, "us_median": med * 1e6,
            "valid": valid, "block": block, "device": str(dev)}


def roundrobin(block: int | None, pallas: bool, rounds: int = 5,
               ini: str | None = None) -> dict:
    """ALL cumulative cuts timed in ONE process, round-robin.

    The per-subprocess ablation (measure_stage) publishes each cut from a
    different session epoch; the remote-TPU session drifts ~1.5-2x between
    processes, so consecutive-cut differences could come out NEGATIVE
    (round-4 artifact: audio_filter = -80.8 us).  Here every cut's two scan
    programs are compiled FIRST, then timed interleaved over ``rounds``
    rounds (min per program), so all cuts share the same session state.
    Returns cumulative + delta tables and an explicit noise bound
    ``noise_us`` (max over cuts of |best - median| differential); deltas
    below the bound are clamped at >= 0 and flagged."""
    import time as _time

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan, load_ini
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver

    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    plan = build_plan(load_ini(ini) if ini else _benchmark_config())
    if block is None:
        div = plan.block_divisor()
        want = plan.fs if on_tpu else plan.fs // 8
        block = ((want + div - 1) // div) * div
    rx = CompiledReceiver(plan, block, use_pallas=pallas and on_tpu,
                          pallas_interpret=pallas and not on_tpu)
    vec0 = rx.init_state()
    rng = np.random.default_rng(0)
    n1, n2 = (2, 16) if on_tpu else (2, 6)
    xs_big = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (n2, 2 * block)).astype(np.uint8)
    ))
    xs_small = xs_big[:n1]

    def make_prog(fn, full):
        @jax.jit
        def prog(xs):
            def b(carry, x):
                if full:
                    vec, acc = carry
                    vec2, outs = fn(vec, x)
                    return (vec2, acc + _checksum(outs)), None
                acc = carry
                return acc + _checksum(fn(vec0, x)), None

            if full:
                (_, s), _ = jax.lax.scan(
                    b, (vec0, jnp.zeros((), jnp.float32)), xs
                )
            else:
                s, _ = jax.lax.scan(b, jnp.zeros((), jnp.float32), xs)
            return s

        return prog

    cuts = ["ingest", "dc", "front", "bucket_casc", "usb", "audio", "full"]
    progs = {}
    for s in cuts:
        if s == "full":
            body = rx._vec(rx._step_u8)
            fn, full = body, True
        else:
            fn, full = _build_variant(rx, s), False
        p = {n: make_prog(fn, full) for n in (n1, n2)}
        for n, xs in ((n1, xs_small), (n2, xs_big)):
            _ = float(p[n](xs))  # compile now (before any timing round)
        progs[s] = p

    best = {s: {n1: float("inf"), n2: float("inf")} for s in cuts}
    med = {s: {n1: [], n2: []} for s in cuts}
    for _r in range(rounds):
        for s in cuts:
            for n, xs in ((n1, xs_small), (n2, xs_big)):
                t0 = _time.perf_counter()
                _ = float(progs[s][n](xs))
                dt = _time.perf_counter() - t0
                best[s][n] = min(best[s][n], dt)
                med[s][n].append(dt)

    cum = {}
    noise = 0.0
    for s in cuts:
        b = (best[s][n2] - best[s][n1]) / (n2 - n1) * 1e6
        m = (
            float(np.median(med[s][n2])) - float(np.median(med[s][n1]))
        ) / (n2 - n1) * 1e6
        cum[s] = b
        noise = max(noise, abs(b - m))
    deltas = {}
    labels = {"ingest": "ingest", "dc": "dc", "front": "group_fronts",
              "bucket_casc": "bucket_mix+cascades", "usb": "usb_demod",
              "audio": "audio_filter", "full": "quantize+rest"}
    prev = 0.0
    below = []
    for s in cuts:
        d = cum[s] - prev
        if d < noise:
            below.append(labels[s])
        deltas[labels[s]] = round(max(d, 0.0), 1)
        prev = cum[s]
    return {
        "stage_us": deltas,
        "stage_noise_us": round(noise, 1),
        "stages_below_noise": below,
        "cumulative_us": {s: round(v, 1) for s, v in cum.items()},
        "rounds": rounds,
        "block": block,
        "device": str(dev),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=30)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--stage", default=None, choices=STAGES)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--pallas", action="store_true",
                    help="build the variant receiver with the fused Pallas "
                    "front (cuts then profile the pallas product path)")
    ap.add_argument("--ini", default=None,
                    help="profile this ini's plan instead of the flagship "
                    "(roundrobin mode only)")
    ap.add_argument("--roundrobin", action="store_true",
                    help="all cuts in ONE process, interleaved timing "
                    "(immune to between-process session drift); one JSON "
                    "line with stage deltas + noise bound")
    args = ap.parse_args()

    if args.roundrobin:
        print(json.dumps(roundrobin(args.block, pallas=args.pallas,
                                    ini=args.ini)))
        return 0

    if args.stage:
        print(json.dumps(measure_stage(
            args.stage, args.block, args.loops, pallas=args.pallas
        )))
        return 0

    stages = [s for s in STAGES if not (args.no_pallas and s == "full_pallas")]
    rows = []
    for s in stages:
        cmd = [sys.executable, "-u", __file__, "--stage", s,
               "--loops", str(args.loops)]
        if args.pallas:
            cmd.append("--pallas")
        if args.block:
            cmd += ["--block", str(args.block)]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=580, cwd=".")
            line = r.stdout.strip().splitlines()[-1]
            rows.append(json.loads(line))
        except Exception as e:
            rows.append({"stage": s, "us": None, "error": str(e)[:200]})

    by = {r["stage"]: r.get("us") for r in rows}
    deltas = {}
    prev = 0.0
    for s in STAGES[:-2]:  # cumulative cuts up to "audio"
        if by.get(s) is not None:
            deltas[s] = by[s] - prev
            prev = by[s]
    if by.get("full") is not None:
        deltas["quantize+rest"] = by["full"] - prev
    if args.json:
        print(json.dumps({"cumulative_us": by, "delta_us": deltas,
                          "device": rows[0].get("device")}))
    else:
        print(f"{'cut point':16s} {'cumulative us':>14s} {'stage delta us':>15s}")
        prev = 0.0
        for s in stages:
            v = by.get(s)
            if v is None:
                print(f"{s:16s} {'FAILED':>14s}")
                continue
            d = v - prev if s in deltas or s == "full" else float("nan")
            print(f"{s:16s} {v:14.1f} {v - prev:15.1f}" if s not in (
                "full_pallas",) else f"{s:16s} {v:14.1f}")
            if s not in ("full_pallas",):
                prev = v
    return 0


if __name__ == "__main__":
    sys.exit(main())
