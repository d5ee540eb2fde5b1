"""Command-line entry points.

The reference is ``SDRReceiver -s file.ini`` + a Qt window (main.cpp:9-38).
This CLI covers the same configuration surface headless, plus the offline
file mode the reference stubbed out (sdrj.h:28) and planning/bench tools:

  run           live receive (local librtlsdr USB, rtl_tcp remote, or an
                IQ file looped at realtime pace) -> ZMQ egress, exactly
                like the GUI app
  devices       list attached RTL USB devices (index, name, serial)
  process-file  offline: IQ recording in, per-channel audio files out
                (and/or ZMQ egress)
  synth         generate a synthetic USB-channel IQ recording for testing
  plan          print the compiled channelizer plan for an ini
  bench         throughput benchmark of the compiled receiver
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np


def _apply_backend(backend: str | None) -> None:
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)


def _build(args, block=None, taps=()):
    """Build the receiver for a CLI command.  ``taps``: tuple of scope tap
    names to compile into the step, or ``"all"`` to emit every valid tap (the
    live scope switches between them at runtime; only the active one is
    fetched per block).  Taps compose with ``--mesh`` — the sharded receiver
    carries the same observability surface as the single-device one.

    With ``--coordinator`` (multi-host mode) this process joins the
    jax.distributed coordination service and the plan is restricted to the
    groups assigned to this process; the returned receiver covers only this
    host's channels and ``args._multihost`` carries the assignment info for
    the command's summary output."""
    from ..graph import build_plan, compile_plan, load_ini

    cfg = load_ini(args.settings)
    plan = build_plan(
        cfg, strict_reference=bool(getattr(args, "strict_reference", False))
    )
    full_topics = {
        s.topic for g in plan.groups for b in g.buckets for s in b.subs
    } | {"main"} | {f"g{g.index}" for g in plan.groups}
    args._full_taps = full_topics
    args._full_plan = plan
    args._multihost = None
    args._egress_owner = None
    local_devices = None
    if getattr(args, "coordinator", None) and (
        getattr(args, "partition", "groups") == "global"
    ):
        # GLOBAL partitioning (BASELINE config 5): every process runs the
        # FULL plan over one (time, chan) mesh spanning all hosts' devices;
        # compute splits exactly evenly and the shard_map halos + the
        # replicated output gather ride DCN.  Egress stays per-host via a
        # deterministic group->host ownership map.
        import jax

        from ..dist import ShardedReceiver, multihost

        pid, n = multihost.initialize(
            args.coordinator,
            getattr(args, "num_processes", None),
            getattr(args, "process_id", None),
        )
        mesh_arg = getattr(args, "mesh", None)
        n_chan = 1
        if mesh_arg:
            try:
                n_time, n_chan = (int(v) for v in mesh_arg.lower().split("x"))
            except ValueError:
                raise SystemExit(f"--mesh wants TxC, got {mesh_arg!r}")
            if n_time * n_chan != len(jax.devices()):
                raise SystemExit(
                    f"--mesh {mesh_arg} is the GLOBAL shape under "
                    f"--partition global; {len(jax.devices())} total devices"
                )
        mesh = multihost.global_mesh(n_chan=n_chan)
        own = multihost.egress_owner(plan, n)
        args._egress_owner = multihost.output_key_owner(plan, n)
        local_topics = [
            s.topic
            for g in plan.groups
            if own[g.index] == pid
            for b in g.buckets
            for s in b.subs
        ]
        args._multihost = {
            "mode": "global",
            "process_id": pid,
            "num_processes": n,
            "coordinator": args.coordinator,
            "egress_owner": {int(k): int(v) for k, v in own.items()},
            "local_topics": local_topics,
            "report": multihost.global_report(plan, n, mesh.shape["time"]),
        }
        if block is None:
            div = plan.block_divisor() * mesh.shape["time"]
            block = ((plan.block_samples + div - 1) // div) * div
        if taps == "all":
            taps = (
                ("main",)
                + tuple(f"g{g.index}" for g in plan.groups)
                + tuple(
                    s.topic
                    for g in plan.groups
                    for b in g.buckets
                    for s in b.subs
                )
            )
        use_pallas = bool(getattr(args, "pallas", False))
        interpret = use_pallas and (
            "tpu" not in jax.devices()[0].platform.lower()
        )
        return cfg, plan, ShardedReceiver(
            plan, mesh, block, emit_taps=tuple(taps),
            use_pallas=use_pallas, pallas_interpret=interpret,
        )
    if getattr(args, "coordinator", None):
        from ..dist import multihost

        plan, args._multihost = multihost.distributed_subplan(
            plan,
            args.coordinator,
            getattr(args, "num_processes", None),
            getattr(args, "process_id", None),
        )
        if not plan.groups:
            raise SystemExit(
                f"process {args._multihost['process_id']} was assigned no "
                f"groups ({args._multihost['num_processes']} processes > "
                f"{len(args._multihost['assignment'])} groups)"
            )
        # meshes must span only THIS host's chips: halos ride ICI, never DCN
        import jax

        local_devices = jax.local_devices()
    mesh_arg = getattr(args, "mesh", None)
    if taps == "all":
        taps = (
            ("main",)
            + tuple(f"g{g.index}" for g in plan.groups)
            + tuple(
                s.topic
                for g in plan.groups
                for b in g.buckets
                for s in b.subs
            )
        )
    elif taps and args._multihost:
        # a fleet launched with one shared command line may name a tap owned
        # by another host; dropping it here (with a note) keeps every
        # process alive instead of killing the fleet over a globally-valid
        # name — only taps unknown to the FULL plan still fail loudly
        local = {"main"} | {f"g{g.index}" for g in plan.groups} | {
            s.topic for g in plan.groups for b in g.buckets for s in b.subs
        }
        dropped = [t for t in taps if t not in local and t in full_topics]
        if dropped:
            print(
                f"process {args._multihost['process_id']}: taps "
                f"{dropped} belong to other hosts' groups; dropping "
                f"locally",
                file=sys.stderr,
            )
            taps = tuple(t for t in taps if t not in dropped)
    use_pallas = bool(getattr(args, "pallas", False))
    if mesh_arg:
        import jax

        from ..dist import ShardedReceiver, make_mesh

        try:
            n_time, n_chan = (int(v) for v in mesh_arg.lower().split("x"))
        except ValueError:
            raise SystemExit(f"--mesh wants TxC (e.g. 4x2), got {mesh_arg!r}")
        mesh = make_mesh(n_time=n_time, n_chan=n_chan, devices=local_devices)
        if block is None:
            # default block: smallest whole multiple of the sharded divisor
            # that is >= the reference's buffer (plan.block_samples)
            div = plan.block_divisor() * n_time
            block = ((plan.block_samples + div - 1) // div) * div
        interpret = use_pallas and (
            "tpu" not in jax.devices()[0].platform.lower()
        )
        return cfg, plan, ShardedReceiver(
            plan, mesh, block, emit_taps=tuple(taps),
            use_pallas=use_pallas, pallas_interpret=interpret,
        )
    from ..graph.compiler import CompiledReceiver

    interpret = False
    if use_pallas:
        import jax

        # Mosaic compilation needs a TPU; other backends run the same
        # kernels in interpreter mode (slow, correctness only)
        interpret = "tpu" not in jax.devices()[0].platform.lower()
        if interpret:
            print(
                "note: --pallas on a non-TPU backend runs in interpreter "
                "mode (correctness only)",
                file=sys.stderr,
            )
    return cfg, plan, CompiledReceiver(
        plan, block, emit_taps=tuple(taps), use_pallas=use_pallas,
        pallas_interpret=interpret,
    )


def cmd_plan(args) -> int:
    _apply_backend(args.backend)
    from ..graph import build_plan, load_ini
    from ..obs.metrics import plan_cost_model

    plan = build_plan(
        load_ini(args.settings),
        strict_reference=bool(getattr(args, "strict_reference", False)),
    )
    info = {
        "fs": plan.fs,
        "center_frequency": plan.center_frequency,
        "dc_correct": plan.dc_correct,
        "bufsplit": plan.bufsplit,
        "block_samples": plan.block_samples,
        "block_divisor": plan.block_divisor(),
        "num_channels": plan.num_channels(),
        "groups": [
            {
                "index": g.index,
                "direct": g.direct,
                "mixer_freq": g.mixer_freq,
                "out_rate": g.out_rate,
                "stages": g.stages,
                "publishes_iq": g.publishes_iq,
                "buckets": [
                    {
                        "stages": b.stages,
                        "late_factor": b.late_factor,
                        "out_rate": b.out_rate,
                        "channels": b.channels,
                        "topics": [s.topic for s in b.subs],
                    }
                    for b in g.buckets
                ],
            }
            for g in plan.groups
        ],
        "cost_model": plan_cost_model(plan),
    }
    print(json.dumps(info, indent=2))
    return 0


def cmd_synth(args) -> int:
    from ..graph import build_plan, load_ini
    from ..io import iqfile

    plan = build_plan(load_ini(args.settings))
    only = set(args.only.split(",")) if args.only else None
    chans = []
    tone_map = {}
    subs = [s for g in plan.groups for b in g.buckets for s in b.subs]
    for i, s in enumerate(subs):
        if only is not None and s.topic not in only:
            continue
        tone = args.tone + 37.0 * i  # distinct tone per channel
        chans.append((s.frequency, tone, args.amplitude))
        tone_map[s.topic] = tone
    iq = iqfile.synthesize_channels(
        int(args.seconds * plan.fs),
        plan.fs,
        plan.center_frequency,
        chans,
        noise=args.noise,
        dc_offset=args.dc + 0j,
    )
    iqfile.write_iq(args.out, iq, args.format)
    print(
        json.dumps(
            {
                "out": args.out,
                "format": args.format,
                "samples": len(iq),
                "channels": len(chans),
                "tones": tone_map,
            }
        )
    )
    return 0


def cmd_process_file(args) -> int:
    _apply_backend(args.backend)
    import jax.numpy as jnp

    from ..core import checkpoint
    from ..core.runtime import run_pipeline
    from ..graph import build_plan, load_ini
    from ..io import iqfile, zmqpub
    from ..obs.spectrum import SpectrumEMA

    taps = (args.spectrum,) if args.spectrum else ()
    cfg, plan, rx = _build(args, args.block, taps=taps)
    if args.spectrum and args.spectrum not in rx.tap_rates():
        # dropped by _build (owned by another host in multihost mode)
        args.spectrum = None
    iq = iqfile.read_iq(args.iq, args.format)
    outdir = pathlib.Path(args.out) if args.out else None
    if outdir:
        outdir.mkdir(parents=True, exist_ok=True)

    hub = zmqpub.EgressHub(plan) if args.zmq else None
    sink: dict[str, list[np.ndarray]] = {}
    spectrum = SpectrumEMA() if args.spectrum else None
    spec_count = [0]

    def on_outputs(outs: dict[str, np.ndarray]) -> int:
        sent = hub.publish_outputs(outs) if hub else 0
        for k, v in outs.items():
            if k.startswith("tap/"):
                # the reference strides its display FFT by 5 buffers
                # (sdrj.cpp:296-303); same cadence here
                if spectrum is not None and spec_count[0] % 5 == 0:
                    spectrum.update(v)
                spec_count[0] += 1
            elif outdir is not None:
                sink.setdefault(k, []).append(v)
        return sent

    state = None
    if args.resume:
        state = rx.import_state(checkpoint.load_state(args.resume, plan))
    # feed interleaved f32 pairs (complex host->device transfer is not
    # supported on remote TPU backends)
    blocks = (
        jnp.asarray(b.view(np.float32)) for b in iqfile.iter_blocks(iq, rx.block)
    )
    fetch_filter = None
    if args._egress_owner is not None:
        # global-mesh multihost: outputs are replicated on every host, but
        # each host fetches+writes+publishes only the groups it OWNS (and
        # any scope taps), so topics stay single-publisher
        if args.burst > 1:
            raise SystemExit("--burst > 1 is not supported with --partition global")
        pid = args._multihost["process_id"]
        owner = args._egress_owner

        from ..dist.multihost import key_owner

        def fetch_filter(k, _own=owner, _pid=pid):
            if k.startswith("tap/"):
                return True
            h = key_owner(_own, k)
            return h is None or h == _pid

        blocks = (rx.globalize(b) for b in blocks)
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            metrics, final_state = run_pipeline(
                rx, blocks, on_outputs, max_blocks=args.max_blocks, state=state,
                return_state=True, burst=args.burst,
                fetch_filter=fetch_filter,
            )
        print(f"profiler trace written to {args.profile}", file=sys.stderr)
    else:
        metrics, final_state = run_pipeline(
            rx, blocks, on_outputs, max_blocks=args.max_blocks, state=state,
            return_state=True, burst=args.burst,
            fetch_filter=fetch_filter,
        )

    written = []
    if outdir is not None:
        rates = rx.rates()
        for k, parts in sink.items():
            data = np.concatenate(parts)
            name = k.replace("/", "_") + (".s16" if k.startswith("audio") else ".bin")
            data.tofile(outdir / name)
            written.append(name)
            if args.wav and k.startswith("audio/"):
                from ..io.wavout import write_wav

                wname = k.replace("/", "_") + ".wav"
                write_wav(outdir / wname, data, rates[k])
                written.append(wname)
        if spectrum is not None:
            name = f"spectrum_{args.spectrum}.npy"
            np.save(outdir / name, spectrum.smoothed)
            written.append(name)
            if args.spectrum_png:
                try:
                    import matplotlib

                    matplotlib.use("Agg")
                    import matplotlib.pyplot as plt

                    fs_tap = rx.tap_rates()[args.spectrum]
                    curve = spectrum.smoothed
                    freqs = (np.arange(len(curve)) - len(curve) / 2) * fs_tap / 8192
                    fig, ax = plt.subplots(figsize=(10, 4))
                    ax.plot(freqs / 1e3, curve, lw=0.7)
                    ax.set_xlabel("offset from center [kHz]")
                    ax.set_ylabel("power [dB]")
                    ax.set_title(f"spectrum: {args.spectrum}")
                    fig.tight_layout()
                    pname = f"spectrum_{args.spectrum}.png"
                    fig.savefig(outdir / pname, dpi=110)
                    plt.close(fig)
                    written.append(pname)
                except Exception as e:
                    print(f"spectrum png failed: {e}", file=sys.stderr)
    if args.save_state:
        checkpoint.save_state(args.save_state, rx.export_state(final_state), plan)
    if hub:
        hub.close()

    out = metrics.summary()
    if args._multihost:
        out["multihost"] = args._multihost
    out["outputs_written"] = sorted(written)
    out["realtime_factor"] = round(metrics.samples_per_second / plan.fs, 2)
    print(json.dumps(out))
    return 0


def cmd_run(args) -> int:
    _apply_backend(args.backend)
    import jax.numpy as jnp

    from ..core.runtime import run_pipeline
    from ..io import iqfile, rtltcp, zmqpub

    cfg, plan, rx = _build(args, args.block, taps="all" if args.scope is not None else ())
    hub = zmqpub.EgressHub(plan)

    # live scope: reference's runtime-switchable spectrum (fftVFOSlot)
    publish = hub.publish_outputs
    fetch_filter = None
    ctrl_cmds: dict = {}
    if args.scope is not None:
        from ..obs.spectrum import LiveScope

        initial = args.scope
        if (
            args._multihost
            and initial not in rx.tap_rates()
            and initial in args._full_taps
        ):
            # globally valid but owned by another host: fall back instead
            # of taking this process (and the fleet) down
            print(
                f"process {args._multihost['process_id']}: scope tap "
                f"{initial!r} belongs to another host; starting on 'main'",
                file=sys.stderr,
            )
            initial = "main"
        scope = LiveScope(rx.tap_rates(), initial=initial)
        if scope.active is None:
            print(
                f"unknown scope tap {initial!r}; valid: "
                f"{sorted(rx.tap_rates())}",
                file=sys.stderr,
            )
            return 2

        def publish(outs, _pub=hub.publish_outputs, _scope=scope):
            _scope.observe(outs)
            return _pub(outs)

        fetch_filter = scope.wants
        ctrl_cmds = {
            "set_scope": scope.set_scope,
            "set_fft": scope.set_fft,
            "spectrum": scope.snapshot,
        }

    if cfg.remote_rtl and not args.iq:
        # elastic client: stream loss reconnects with backoff and replays
        # the configure sequence + last retune (the reference stays alive
        # but needs a manual restart, sdrj.cpp:107-123)
        client = rtltcp.ElasticRtlTcp(cfg.remote_rtl)
        print(
            f"rtl_tcp connected: tuner type {client.greeting.tuner_type}, "
            f"{client.greeting.tuner_gain_count} gains",
            file=sys.stderr,
        )
        client.configure(
            plan.fs, plan.center_frequency, cfg.remote_rtl_gain_idx, agc=False
        )
        ctrl = None
        if args.control_port is not None:
            from .control import ControlServer

            ctrl = ControlServer(
                args.control_port, rtl_client=client, commands=ctrl_cmds
            )
            print(f"control socket on udp:{ctrl.port}", file=sys.stderr)
        try:
            from ..io import native

            if native.available():
                # native ring between the socket reader thread and the device
                # pipeline (the reference's 20-slot ring, jonti/sdr.cpp:100-184)
                import threading

                ring = native.IngestRing(block_bytes=2 * rx.block, n_slots=20)

                def reader():
                    try:
                        for b in client.iter_blocks(2 * rx.block):
                            ring.push(b)  # drop-on-full like the reference
                    except Exception:
                        pass
                    finally:
                        ring.close()

                threading.Thread(target=reader, daemon=True).start()

                def ring_blocks():
                    while True:
                        b = ring.pop_raw(timeout_ms=5000)
                        if b is None:
                            return
                        yield jnp.asarray(b)

                raw_blocks = ring_blocks()
            else:
                raw_blocks = (
                    jnp.asarray(b) for b in client.iter_blocks(2 * rx.block)
                )
            metrics = run_pipeline(
                rx,
                raw_blocks,
                publish,
                raw_u8=True,
                max_blocks=args.max_blocks,
                fetch_filter=fetch_filter,
            )
            summary = metrics.summary()
            try:
                summary["ring"] = ring.stats
            except Exception:
                pass
            summary["rtl_tcp"] = dict(client.stats)
            if args._multihost:
                summary["multihost"] = args._multihost
            print(json.dumps(summary))
            return 0
        finally:
            if ctrl is not None:
                ctrl.close()
            client.close()
            hub.close()
    elif args.iq:
        iq = iqfile.read_iq(args.iq, args.format)

        def looped():
            while True:
                yield from iqfile.iter_blocks(iq, rx.block)

        blocks = (jnp.asarray(b.view(np.float32)) for b in looped())
        ctrl = None
        if args.control_port is not None:
            from .control import ControlServer

            ctrl = ControlServer(args.control_port, commands=ctrl_cmds)
            print(f"control socket on udp:{ctrl.port}", file=sys.stderr)
        try:
            metrics = run_pipeline(
                rx,
                blocks,
                publish,
                max_blocks=args.max_blocks,
                realtime_fs=None if args.fast else plan.fs,
                fetch_filter=fetch_filter,
            )
        finally:
            if ctrl is not None:
                ctrl.close()
            hub.close()
    else:
        from ..io import rtlusb

        if not rtlusb.available():
            print(
                "no source: set remote_rtl in the ini (rtl_tcp), pass --iq "
                "FILE, or install librtlsdr for local USB devices",
                file=sys.stderr,
            )
            return 2
        # local USB dongle: device pick by serial then index, like the
        # reference's auto_start (mainwindow.cpp:290-350, sdrj.cpp:306-311)
        idx = cfg.auto_start_tuner_idx
        if cfg.auto_start_tuner_serial:
            idx = rtlusb.index_by_serial(cfg.auto_start_tuner_serial)
            if idx < 0:
                print(
                    f"no device with serial {cfg.auto_start_tuner_serial!r}",
                    file=sys.stderr,
                )
                return 2
        dev = rtlusb.RtlUsbDevice(idx)
        ctrl = None
        try:
            dev.start(
                plan.fs, plan.center_frequency, 2 * rx.block, cfg.tuner_gain
            )
            if cfg.auto_start_biast:
                dev.set_bias_tee(True)
            print(
                f"rtlsdr device {idx} streaming: fs={plan.fs}, "
                f"center={plan.center_frequency}, gain={cfg.tuner_gain}",
                file=sys.stderr,
            )
            if args.control_port is not None:
                from .control import ControlServer

                ctrl = ControlServer(
                    args.control_port,
                    rtl_client=dev,
                    stats_fn=lambda: dict(dev.ring.stats),
                    commands=ctrl_cmds,
                )
                print(f"control socket on udp:{ctrl.port}", file=sys.stderr)

            def usb_blocks():
                # elastic: a silent ring (stalled async read, unplugged
                # dongle) triggers automatic device restarts with backoff
                # before giving up — the reference stays alive but needs a
                # manual restart (sdrj.cpp:107-123)
                import time as _time

                retries = 0
                while True:
                    b = dev.ring.pop_raw(timeout_ms=5000)
                    if b is None:
                        if retries >= 5:
                            print("usb stream lost; giving up after 5 "
                                  "restart attempts", file=sys.stderr)
                            return
                        retries += 1
                        print(f"usb stream silent; restart attempt "
                              f"{retries}", file=sys.stderr)
                        if not dev.restart():
                            _time.sleep(min(2.0 * retries, 8.0))
                        continue
                    retries = 0
                    yield jnp.asarray(b)

            metrics = run_pipeline(
                rx,
                usb_blocks(),
                publish,
                raw_u8=True,
                max_blocks=args.max_blocks,
                fetch_filter=fetch_filter,
            )
            summary = metrics.summary()
            summary["ring"] = dev.ring.stats
            summary["usb_restarts"] = dev.restarts
            if args._multihost:
                summary["multihost"] = args._multihost
            print(json.dumps(summary))
            return 0
        finally:
            if ctrl is not None:
                ctrl.close()
            dev.close()
            hub.close()

    summary = metrics.summary()
    if args._multihost:
        summary["multihost"] = args._multihost
    print(json.dumps(summary))
    return 0


def cmd_devices(args) -> int:
    """List attached RTL USB devices (the reference's sdr::deviceNames,
    jonti/sdr.cpp:248-273)."""
    from ..io import rtlusb

    if not rtlusb.available():
        print("librtlsdr not found", file=sys.stderr)
        return 2
    devs = rtlusb.enumerate_devices()
    for d in devs:
        print(
            json.dumps(
                {
                    "index": d.index,
                    "name": d.name,
                    "manufacturer": d.manufacturer,
                    "product": d.product,
                    "serial": d.serial,
                }
            )
        )
    return 0


def _bench_sps(rx, n_blocks: int) -> float:
    """Steady-state samples/s of a receiver on synthetic u8 blocks (the
    dongle wire format — backend-safe on restricted remote-TPU backends,
    unlike complex64 host arrays)."""
    import jax
    import jax.numpy as jnp

    from ..core.runtime import run_pipeline

    rng = np.random.default_rng(0)
    xb = jax.device_put(
        jnp.asarray(rng.integers(0, 256, 2 * rx.block).astype(np.uint8))
    )
    metrics = run_pipeline(
        rx, (xb for _ in range(n_blocks + 1)), raw_u8=True,
        max_blocks=n_blocks + 1,
    )
    # first block includes compile; recompute on the steady-state tail
    tail = metrics.block_seconds[1:]
    return rx.block * len(tail) / sum(tail)


def cmd_bench(args) -> int:
    _apply_backend(args.backend)
    import jax

    from ..obs.metrics import plan_cost_model

    cfg, plan, rx = _build(args, args.block)
    n = args.blocks
    sps = _bench_sps(rx, n)
    out = {
        "device": str(jax.devices()[0]),
        "block_samples": rx.block,
        "blocks": n,
        "mode": "pallas" if getattr(rx, "use_pallas", False) else (
            "sharded" if getattr(args, "mesh", None) else "xla"
        ),
        "msamples_per_second": round(sps / 1e6, 2),
        "realtime_factor": round(sps / plan.fs, 1),
        "cost_model": plan_cost_model(plan, rx.block),
    }
    if args._multihost:
        out["multihost"] = args._multihost
        # eff(N) = min_h(sps_h) / sps_1 (docs/SCALING.md methodology):
        # every process also benches the FULL config locally (sps_1 is a
        # single-host quantity), then the per-host subplan rates are
        # all-gathered so each process can print the fleet efficiency.
        from ..graph import compile_plan

        full_rx = compile_plan(args._full_plan)
        sps_1 = _bench_sps(full_rx, max(2, n // 2))
        out["multihost"]["sps_1_full_plan"] = round(sps_1 / 1e6, 2)
        try:
            import jax.numpy as jnp
            from jax.experimental import multihost_utils

            gathered = np.asarray(
                multihost_utils.process_allgather(
                    jnp.asarray([sps, sps_1], jnp.float32)
                )
            ).reshape(-1, 2)
            all_sps, all_sps1 = gathered[:, 0], gathered[:, 1]
            n_hosts = len(all_sps)
            # normalized: 1.0 = each of N hosts runs its 1/N share N x as
            # fast as one host runs the whole plan; the slowest host sets
            # the fleet's sustainable rate (stream-synchronous pipeline).
            # sps_1 uses the fleet max: on shared-core CI boxes concurrent
            # processes contend and depress each other's full-plan probe.
            eff = float(all_sps.min() / (n_hosts * all_sps1.max()))
            out["multihost"]["sps_per_host_msps"] = [
                round(s / 1e6, 2) for s in all_sps.tolist()
            ]
            out["multihost"]["eff"] = round(eff, 4)
            out["multihost"]["eff_ceiling"] = out["multihost"][
                "balance_efficiency"
            ]
        except Exception as e:
            print(f"eff(N) aggregation failed: {e}", file=sys.stderr)
    print(json.dumps(out))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sdrreceiver-tpu", description=__doc__, add_help=True
    )
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp, iq_required=False):
        sp.add_argument("-s", "--settings", required=True, help="ini file")
        sp.add_argument("--backend", default=None, help="jax platform override (cpu/axon)")
        sp.add_argument("--block", type=int, default=None, help="ingest block samples")
        sp.add_argument("--max-blocks", type=int, default=None)
        sp.add_argument("--format", default="u8", choices=["u8", "cf32"])
        sp.add_argument(
            "--mesh",
            default=None,
            metavar="TxC",
            help="run sharded over a (time x chan) device mesh, e.g. 4x2 "
            "(needs T*C devices on the selected backend; with "
            "--coordinator, T*C LOCAL devices per host)",
        )
        sp.add_argument(
            "--pallas",
            action="store_true",
            help="route supported mix+cascade fronts through the fused "
            "Pallas TPU kernels (composes with --mesh: group fronts run "
            "per-shard; unsupported shapes fall back per group/bucket)",
        )
        sp.add_argument(
            "--strict-reference",
            action="store_true",
            help="reproduce the reference's handling of sub VFOs that "
            "match no main VFO (misprocessed through main group 0, "
            "mainwindow.cpp:225) instead of planning them as "
            "direct-from-input channels; see PARITY.md",
        )
        sp.add_argument(
            "--coordinator",
            default=None,
            metavar="HOST:PORT",
            help="multi-host mode: jax.distributed coordinator address; "
            "each process runs the main-VFO groups assigned to it "
            "(whole groups per host — halos ride ICI, DCN carries no "
            "samples) and owns its own ZMQ egress",
        )
        sp.add_argument(
            "--num-processes", type=int, default=None,
            help="total process count for --coordinator (else from env)",
        )
        sp.add_argument(
            "--process-id", type=int, default=None,
            help="this process's id for --coordinator (else from env)",
        )
        sp.add_argument(
            "--partition", default="groups", choices=["groups", "global"],
            help="multi-host partitioning: 'groups' = whole main-VFO "
            "groups per host (no cross-host data plane; ceiling = group "
            "balance), 'global' = ONE (time x chan) mesh over every "
            "host's devices (exactly even compute; halos + output "
            "gather ride DCN — BASELINE config 5's channels x "
            "time-blocks shape). With 'global', --mesh is the GLOBAL "
            "TxC shape and each host publishes the topics of the "
            "groups it owns for egress",
        )
        if iq_required:
            sp.add_argument("--iq", required=True, help="IQ recording path")
        else:
            sp.add_argument("--iq", default=None, help="IQ recording path")

    sp = sub.add_parser("plan", help="print the compiled channelizer plan")
    sp.add_argument("-s", "--settings", required=True)
    sp.add_argument("--backend", default=None)
    sp.add_argument("--strict-reference", action="store_true")
    sp.set_defaults(fn=cmd_plan)

    sp = sub.add_parser("synth", help="generate a synthetic IQ recording")
    sp.add_argument("-s", "--settings", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--seconds", type=float, default=2.0)
    sp.add_argument("--tone", type=float, default=1000.0)
    sp.add_argument("--amplitude", type=float, default=25.0)
    sp.add_argument("--noise", type=float, default=1.0)
    sp.add_argument("--dc", type=float, default=0.0)
    sp.add_argument("--format", default="u8", choices=["u8", "cf32"])
    sp.add_argument(
        "--only", default=None, help="comma-separated topics to include"
    )
    sp.set_defaults(fn=cmd_synth)

    sp = sub.add_parser("process-file", help="offline IQ file -> audio files/ZMQ")
    common(sp, iq_required=True)
    sp.add_argument("--out", default=None, help="output directory for audio files")
    sp.add_argument("--zmq", action="store_true", help="also publish over ZMQ")
    sp.add_argument(
        "--spectrum",
        default=None,
        metavar="TAP",
        help="export an EMA spectrum of a tap ('main', 'g<i>', or a VFO "
        "topic) to --out",
    )
    sp.add_argument("--resume", default=None, help="resume from a state checkpoint")
    sp.add_argument(
        "--save-state", default=None, help="write the final state checkpoint here"
    )
    sp.add_argument("--wav", action="store_true", help="also write .wav audio files")
    sp.add_argument(
        "--burst", type=int, default=1, metavar="K",
        help="process K ingest blocks per device dispatch (lax.scan burst "
        "entries) — offline-throughput mode; pays the per-dispatch floor "
        "once per K blocks (callbacks/outputs still per block, in order)",
    )
    sp.add_argument(
        "--profile", default=None, metavar="DIR",
        help="write a jax.profiler trace of the run to DIR",
    )
    sp.add_argument(
        "--spectrum-png", action="store_true", help="render the spectrum to PNG"
    )
    sp.set_defaults(fn=cmd_process_file)

    sp = sub.add_parser("run", help="live receive -> ZMQ (rtl_tcp or looped file)")
    common(sp)
    sp.add_argument("--fast", action="store_true", help="don't pace to realtime")
    sp.add_argument(
        "--control-port",
        type=int,
        default=None,
        help="UDP JSON control socket (set_center_freq / stats; with "
        "--scope also set_scope / set_fft / spectrum)",
    )
    sp.add_argument(
        "--scope",
        nargs="?",
        const="main",
        default=None,
        metavar="TAP",
        help="enable the live scope on TAP ('main', 'g<i>', or a VFO "
        "topic; default main) — switchable at runtime via --control-port",
    )
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("devices", help="list attached RTL USB devices")
    sp.set_defaults(fn=cmd_devices)

    sp = sub.add_parser("bench", help="throughput benchmark")
    common(sp)
    sp.add_argument("--blocks", type=int, default=20)
    sp.set_defaults(fn=cmd_bench)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (FileNotFoundError, ValueError, IOError) as e:
        # configuration/usage errors get a clean one-liner, not a traceback
        # (the reference pops message boxes for these, mainwindow.cpp:19-47)
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
