"""Headline benchmark: complex Msamples/s/chip through the full channelizer.

Runs the flagship 27-channel sdr_25E-class receiver (u8 ingest, DC removal,
2 main-VFO mix+cascade groups, 27 sub-VFO mix/decimate/USB-demod/quantize
channels) on the default JAX device in BOTH execution modes (XLA and the
fused Pallas front end) and prints ONE JSON line:

    {"metric": ..., "value": Msps, "unit": "Msamples/s/chip",
     "vs_baseline": x, ...}

MEASUREMENT METHOD (changed in round 3): honest fetch-forced differential
timing (sdrreceiver_tpu/obs/timing.py).  jax.block_until_ready does not
reliably await execution on the remote-TPU backend, so the chained-dispatch
loops used by rounds 1-2 (and early round 3) measured the ENQUEUE rate —
~2000x optimistic on this step.  BENCH_r01/r02's 7,000 Msps/chip and the
intermediate 45,000/240,000 Msps figures are that fiction; the `value`
here is real device time per block, validated against a bf16 matmul chain
that measures 183.7 TFLOP/s = 93% of the chip's public peak.  The honest
round-3 baseline BEFORE the layout optimizations was 60 Msps/chip
(25.4 ms/block); see PARITY.md "performance anatomy".

vs_baseline is against BASELINE.json's north star of 1 complex Gsample/s/chip
through the mix+halfband-decimate+USB-demod chain.  Extra fields:

    xla_msps / pallas_msps   honest throughput of each execution mode
                             (headline = the better)
    step_us                  honest device time per 1.536 Msample block
                             (0.25 s of signal) in the headline mode
    mfu / hbm_utilization    model FLOPs (resp. minimum bytes) over
                             measured time, against chip peaks
    shard_overhead           honest step-time overhead of the SAME plan
                             through ShardedReceiver on a 1x1 mesh
    enqueue_step_us          the old chained-dispatch figure, kept ONLY to
                             map earlier rounds' fiction onto this scale
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# chip peaks for roofline reporting (per chip). bf16 MXU FLOPs and HBM BW.
_CHIP_PEAKS = {
    # TPU v5e ("v5 lite"): 197 TFLOP/s bf16, 819 GB/s HBM
    "v5 lite": (197e12, 819e9),
    "v5e": (197e12, 819e9),
    # TPU v4: 275 TFLOP/s bf16, 1228 GB/s
    "v4": (275e12, 1228e9),
    # TPU v5p: 459 TFLOP/s bf16, 2765 GB/s
    "v5p": (459e12, 2765e9),
    # TPU v6e (Trillium): 918 TFLOP/s bf16, 1640 GB/s
    "v6 lite": (918e12, 1640e9),
    "v6e": (918e12, 1640e9),
}


def _peaks(device) -> tuple[float, float] | None:
    name = str(device).lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in name:
            return peaks
    return None


def _enqueue_step_us(rx, u8, n_iter: int) -> float:
    """The rounds-1/2 measurement (chained dispatch + block_until_ready),
    kept ONLY as a fiction-scale reference — NOT device time on remote
    backends (see module docstring)."""
    import jax

    state = rx.init_state()
    state, out = rx.step_u8(state, u8)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, out = rx.step_u8(state, u8)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter * 1e6


def main() -> int:
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _benchmark_config
    from sdrreceiver_tpu.graph import build_plan
    from sdrreceiver_tpu.graph.compiler import CompiledReceiver
    from sdrreceiver_tpu.obs.metrics import plan_cost_model
    from sdrreceiver_tpu.obs.timing import (
        honest_burst_seconds,
        honest_step_detail,
    )

    plan = build_plan(_benchmark_config())
    dev = jax.devices()[0]
    on_tpu = "tpu" in dev.platform.lower() or "TPU" in str(dev)
    block = 1536000 if on_tpu else 98304
    n_small, n_big = (2, 8) if on_tpu else (2, 5)

    def _eff(detail):
        """Usable per-block seconds of one measurement: a detail whose
        escalated retries all looked degraded (valid=False) or whose best
        estimate is non-positive must not win min()/mode selection — fall
        back to its median differential, or exclude it entirely."""
        if detail is None:
            return float("inf")
        s = detail["seconds"]
        if not detail.get("valid", True) or s <= 0:
            med = detail.get("seconds_median", 0.0)
            s = med if med > 0 else float("inf")
        return s

    rx_xla = CompiledReceiver(plan, block)
    xla_detail = honest_step_detail(rx_xla, n_small, n_big)
    dt_xla = _eff(xla_detail)
    pal_detail = None
    rx_pal = None
    try:
        # construction inside the try: a kernel-build failure must fall back
        # to XLA mode, not abort the benchmark
        rx_pal = CompiledReceiver(plan, block, use_pallas=on_tpu,
                                  pallas_interpret=not on_tpu)
        pal_detail = honest_step_detail(rx_pal, n_small, n_big)
        dt_pal = _eff(pal_detail)
    except Exception as e:
        print(f"pallas mode failed: {e}", file=sys.stderr)
        dt_pal = float("inf")

    dt = min(dt_xla, dt_pal)
    mode = "pallas" if dt_pal < dt_xla else "xla"
    detail = pal_detail if mode == "pallas" else xla_detail
    sps = block / dt

    # -- burst (offline-throughput) secondary headline: k blocks per
    # dispatch through the step_many lax.scan entries
    burst_sps = None
    try:
        rx_b = rx_pal if (mode == "pallas" and rx_pal is not None) else rx_xla
        dt_burst = honest_burst_seconds(
            rx_b, k=8, m_small=1, m_big=3 if on_tpu else 2
        )
        burst_sps = block / dt_burst
        # symmetric plausibility guard: the headline takes the better of
        # step and burst, so a collapsed BURST differential would inflate
        # it too.  Legit burst/step ratios observed are <= ~2 (amortized
        # dispatch); >4x triggers one re-measure and the second reading
        # wins.
        if np.isfinite(dt) and dt > 0 and burst_sps > 4 * (block / dt):
            print(f"implausible burst ({burst_sps / 1e6:.0f} Msps vs step "
                  f"{block / dt / 1e6:.0f}); re-measuring", file=sys.stderr)
            dt_burst = honest_burst_seconds(
                rx_b, k=8, m_small=1, m_big=3 if on_tpu else 2, seed=1
            )
            burst_sps = block / dt_burst if dt_burst > 0 else None
    except Exception as e:
        print(f"burst measurement failed: {e}", file=sys.stderr)

    # plausibility cross-check (round 5): the single-dispatch step cannot
    # be much faster than the burst path (same work, amortized dispatch).
    # A collapsed differential once published 14.6 us/1.5 Ms = 105 Gsps;
    # if the step reads >3x the burst throughput, re-measure once, then
    # bound by the burst figure and clear the validity flag.
    if burst_sps and sps > 3 * burst_sps and np.isfinite(dt):
        print(f"implausible step ({sps / 1e6:.0f} Msps vs burst "
              f"{burst_sps / 1e6:.0f}); re-measuring", file=sys.stderr)
        redo = honest_step_detail(
            rx_pal if mode == "pallas" else rx_xla, n_small, n_big, seed=1
        )
        dt2 = _eff(redo)
        if np.isfinite(dt2) and block / dt2 <= 3 * burst_sps:
            dt, sps, detail = dt2, block / dt2, redo
        else:
            dt = block / burst_sps
            sps = burst_sps
            detail = dict(redo)
            detail["valid"] = False
            detail.setdefault("seconds_median", dt)
    # a fully degraded session (every measurement invalid) must not publish
    # Infinity into the JSON: bound by the burst figure if there is one
    if not np.isfinite(dt):
        if burst_sps:
            dt = block / burst_sps
            sps = burst_sps
        else:
            dt = 0.0
            sps = 0.0
        detail = dict(detail or {})
        detail["valid"] = False
        detail.setdefault("seconds_median", dt)

    # -- roofline: model FLOPs+bytes over measured time
    cost = plan_cost_model(plan, block)
    # actual ingest is u8 (2 bytes/sample), not complex64
    bytes_min = 2.0 * block + (cost["bytes_per_block"] - 8.0 * block)
    peaks = _peaks(dev)
    mfu = hbm_util = None
    if peaks:
        peak_flops, peak_bw = peaks
        mfu = cost["flops_per_block"] / dt / peak_flops
        hbm_util = bytes_min / dt / peak_bw

    # -- single-chip shard overhead (docs/SCALING.md): the same plan through
    # the sharded receiver on a 1x1 mesh of this chip.  Round-robin A/B in
    # ONE session (obs/timing.honest_ab_seconds): the round-4 sequential
    # measurement straddled session drift and published a meaningless
    # NEGATIVE overhead (-0.25)
    shard_overhead = shard_step_us = shard_ab_valid = None
    try:
        from sdrreceiver_tpu.dist import ShardedReceiver, make_mesh
        from sdrreceiver_tpu.obs.timing import honest_ab_seconds

        mesh = make_mesh(n_time=1, n_chan=1, devices=[dev])
        rx_sh = ShardedReceiver(plan, mesh, block)
        ab = honest_ab_seconds(
            {"unsharded": rx_xla, "mesh1x1": rx_sh}, n_small, n_big
        )
        shard_step_us = round(ab["mesh1x1"]["seconds"] * 1e6, 1)
        shard_overhead = (
            ab["mesh1x1"]["seconds"] / ab["unsharded"]["seconds"] - 1.0
        )
        shard_ab_valid = bool(
            ab["mesh1x1"]["valid"] and ab["unsharded"]["valid"]
        )
    except Exception as e:
        print(f"shard-overhead measurement failed: {e}", file=sys.stderr)

    # -- per-stage honest breakdown: ONE subprocess running ALL ablation
    # cuts round-robin in a single session (tools/profile_stages.py
    # --roundrobin).  The round-4 per-subprocess ablation put each cut in
    # a different session epoch; the remote backend drifts ~1.5-2x between
    # processes, so consecutive-cut differences came out NEGATIVE
    # (BENCH_r04: audio_filter = -80.8 us).  The round-robin form shares
    # one session across cuts, clamps deltas at >= 0 and reports an
    # explicit stage_noise_us bound with the stages below it flagged.
    stage_us = stage_noise_us = stages_below_noise = None
    if on_tpu and time.perf_counter() - t_start < 20 * 60:
        import os
        import subprocess

        tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "profile_stages.py")
        try:
            r = subprocess.run(
                [sys.executable, "-u", tool, "--roundrobin", "--pallas"],
                capture_output=True, text=True, timeout=900,
                cwd=os.path.dirname(tool) + "/..",
            )
            prof = json.loads(r.stdout.strip().splitlines()[-1])
            stage_us = prof["stage_us"]
            stage_noise_us = prof["stage_noise_us"]
            stages_below_noise = prof["stages_below_noise"]
        except Exception as e:
            print(f"stage profile failed: {e}", file=sys.stderr)

    # -- the old (fictional on remote backends) enqueue-rate figure, for
    # mapping rounds 1-2 numbers onto the honest scale
    enqueue_us = None
    try:
        rng = np.random.default_rng(1)
        u8 = jax.device_put(
            jnp.asarray(rng.integers(0, 256, 2 * block).astype(np.uint8))
        )
        enqueue_us = _enqueue_step_us(
            rx_pal if mode == "pallas" else rx_xla, u8, 20 if on_tpu else 5
        )
    except Exception as e:
        print(f"enqueue-rate reference failed: {e}", file=sys.stderr)

    # headline = the better of the realtime step and the burst (offline)
    # path: BASELINE's Gsps target is offline throughput, and the burst
    # measurement (longer scan programs) is also the more session-robust
    # of the two (r4: step read 1274 then 897 Msps across two sessions
    # while burst read 1102 and 1060)
    sps_headline = max(sps, burst_sps or 0.0)
    result = {
        "metric": "complex Msamples/s/chip through mix+decimate+demod chain (27ch sdr_25E-class)",
        "value": round(sps_headline / 1e6, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(sps_headline / 1e9, 4),
        "headline_path": "burst" if sps_headline != sps else "step",
        "step_sps": round(sps / 1e6, 2),
        "method": "fetch-forced differential (honest device time; r1-r2 "
                  "numbers were enqueue-rate fiction, see bench.py docstring)",
        "mode": mode,
        "xla_msps": (
            round(block / dt_xla / 1e6, 2) if np.isfinite(dt_xla) else None
        ),
        "pallas_msps": (
            round(block / dt_pal / 1e6, 2) if np.isfinite(dt_pal) else None
        ),
        "step_us": round(dt * 1e6, 1),
        # median-vs-median differential: a large ratio vs step_us flags a
        # degraded remote-TPU session (the r3 builder-vs-driver 2.2x gap);
        # step_us (min-based) is the canonical figure.  measurement_valid
        # False means even the escalated-length retries saw a systematic
        # session drift (obs/timing.py) — treat the numbers as a lower
        # bound on throughput, not a measurement
        "step_us_median": round(detail["seconds_median"] * 1e6, 1),
        "measurement_valid": bool(detail.get("valid", True)),
        "measurement_attempts": detail.get("attempts"),
        "burst_sps": round(burst_sps / 1e6, 2) if burst_sps else None,
        "mfu": round(mfu, 5) if mfu is not None else None,
        "hbm_utilization": round(hbm_util, 5) if hbm_util is not None else None,
        "model_flops_per_block": cost["flops_per_block"],
        "shard_overhead": (
            round(shard_overhead, 4) if shard_overhead is not None else None
        ),
        "shard_step_us": shard_step_us,
        "shard_ab_valid": shard_ab_valid,
        "stage_us": stage_us,
        "stage_noise_us": stage_noise_us,
        "stages_below_noise": stages_below_noise,
        "enqueue_step_us": (
            round(enqueue_us, 1) if enqueue_us is not None else None
        ),
    }
    print(json.dumps(result))
    print(
        f"device={dev} block={block} "
        f"realtime_factor={sps / plan.fs:.1f} "
        f"honest: xla={dt_xla * 1e6:.1f}us pallas={dt_pal * 1e6:.1f}us "
        f"per block",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
