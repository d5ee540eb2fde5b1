"""REAL multi-process (DCN) execution: two concurrent JAX processes join a
jax.distributed coordinator, each runs its assigned main-VFO groups through
the full CLI, and the union of their outputs must equal the single-process
receiver's — with per-host ZMQ egress carrying disjoint topic sets.

This is the deployment shape of SURVEY.md section 2.4 (whole groups per host,
halos ride ICI, DCN carries no samples; the only cross-process fabric the
reference has is its ZMQ PUB socket, zmqpublisher.cpp:82-96).  The processes
here are CPU-backend JAX processes on one machine — the coordination path,
plan partitioning, local-mesh construction and egress are exactly what runs
on N TPU hosts.
"""

import json
import pathlib
import socket
import subprocess
import sys
import threading

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

INI_TMPL = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:{port}
correct_dc_bias=1
[main_vfos]
size=2
1\\frequency=1545116000
1\\out_rate=384000
2\\frequency=1546096000
2\\out_rate=192000
[vfos]
size=3
1\\frequency=1545005146
1\\gain=0.5
1\\data_rate=600
1\\topic=VFO01
2\\frequency=1545214573
2\\gain=0.5
2\\data_rate=600
2\\topic=VFO02
3\\frequency=1546005300
3\\gain=0.5
3\\data_rate=10500
3\\topic=VFO13
"""


_port_iter = None


def _free_port() -> int:
    """A bindable port OUTSIDE the OS ephemeral range (32768+).

    Binding port 0 and re-using the number is a TOCTOU race against every
    concurrent ephemeral-port user on the machine — observed once as
    'Address already in use' when another suite's ZMQ socket landed on the
    same number between close and use.  Ports 21000-31999, offset by pid,
    are not handed out by the OS, so only another instance of THIS helper
    could collide (and the bind check skips taken ones)."""
    global _port_iter
    import itertools
    import os

    if _port_iter is None:
        _port_iter = itertools.count((os.getpid() * 127) % 10000)
    for _ in range(200):
        port = 21000 + next(_port_iter) % 11000
        try:
            with socket.socket() as s:
                s.bind(("127.0.0.1", port))
            return port
        except OSError:
            continue
    raise RuntimeError("no free port found in 21000-31999")


def _env(n_devices: int = 1) -> dict:
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = str(REPO)
    return env


def _cli(*argv, env, timeout=240):
    proc = subprocess.run(
        [sys.executable, "-m", "sdrreceiver_tpu.cli.main", *argv],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.fixture(scope="module")
def recording(tmp_path_factory):
    """~0.5 s u8 IQ with a distinct tone on each of the 3 channels."""
    from sdrreceiver_tpu.io import iqfile

    d = tmp_path_factory.mktemp("mh")
    fs, center = 1536000, 1545600000
    chans = [
        (1545005146, 1000.0, 0.25),
        (1545214573, 750.0, 0.25),
        (1546005300, 1200.0, 0.25),
    ]
    iq = iqfile.synthesize_channels(
        fs // 2, fs, center, chans, noise=0.01, dc_offset=0.02 + 0.01j
    )
    path = d / "iq.bin"
    iqfile.write_iq(path, iq, "u8")
    return d, path


def _write_ini(d: pathlib.Path, name: str, port: int) -> pathlib.Path:
    p = d / name
    p.write_text(INI_TMPL.format(port=port))
    return p


class TestTwoProcessRun:
    def test_union_matches_single_process(self, recording):
        d, iq = recording
        # single-process reference run
        ini = _write_ini(d, "ref.ini", _free_port())
        ref_out = d / "ref_out"
        _cli(
            "process-file", "-s", str(ini), "--iq", str(iq),
            "--out", str(ref_out), "--backend", "cpu",
            env=_env(),
        )
        ref_files = {p.name: p.read_bytes() for p in ref_out.iterdir()}
        assert {"audio_VFO01.s16", "audio_VFO02.s16", "audio_VFO13.s16"} <= set(
            ref_files
        )

        # two concurrent distributed processes, one host-local 2x1 mesh each,
        # each with ITS OWN bound ZMQ egress port (per-host egress)
        coord = f"localhost:{_free_port()}"
        zmq_ports = [_free_port(), _free_port()]
        results: dict[int, dict] = {}
        captured: dict[int, list] = {0: [], 1: []}

        # subscribe to both hosts' egress before they start (PUB/SUB
        # reconnects, so connecting to a not-yet-bound endpoint is fine)
        import zmq

        ctx = zmq.Context.instance()
        subs = []
        for port in zmq_ports:
            s = ctx.socket(zmq.SUB)
            s.connect(f"tcp://127.0.0.1:{port}")
            s.setsockopt(zmq.SUBSCRIBE, b"")
            subs.append(s)
        stop = threading.Event()

        def drain(i):
            poller = zmq.Poller()
            poller.register(subs[i], zmq.POLLIN)
            while not stop.is_set():
                if poller.poll(100):
                    captured[i].append(subs[i].recv_multipart())

        drainers = [threading.Thread(target=drain, args=(i,)) for i in (0, 1)]
        for t in drainers:
            t.start()

        def run_proc(pid):
            ini_p = _write_ini(d, f"host{pid}.ini", zmq_ports[pid])
            out_p = d / f"host{pid}_out"
            results[pid] = _cli(
                "process-file", "-s", str(ini_p), "--iq", str(iq),
                "--out", str(out_p), "--backend", "cpu",
                "--zmq",
                "--mesh", "2x1",
                "--coordinator", coord,
                "--num-processes", "2",
                "--process-id", str(pid),
                env=_env(n_devices=2),
            )

        procs = [threading.Thread(target=run_proc, args=(pid,)) for pid in (0, 1)]
        for t in procs:
            t.start()
        for t in procs:
            t.join(timeout=300)
        stop.set()
        for t in drainers:
            t.join(timeout=10)
        for s in subs:
            s.close(0)

        assert 0 in results and 1 in results, "a process did not finish"
        # the distributed bring-up really happened and the groups partition
        mh0, mh1 = results[0]["multihost"], results[1]["multihost"]
        assert mh0["num_processes"] == 2 and mh1["num_processes"] == 2
        g0, g1 = set(mh0["local_groups"]), set(mh1["local_groups"])
        assert g0 and g1 and g0.isdisjoint(g1)
        assert g0 | g1 == {0, 1}
        assert mh0["balance_efficiency"] > 0.3

        # union of both hosts' audio == single-process audio, bit for bit
        union: dict[str, bytes] = {}
        for pid in (0, 1):
            for p in (d / f"host{pid}_out").iterdir():
                if p.name.startswith("audio_"):
                    assert p.name not in union, "topic produced by both hosts"
                    union[p.name] = p.read_bytes()
        ref_audio = {k: v for k, v in ref_files.items() if k.startswith("audio_")}
        assert set(union) == set(ref_audio)
        for name, blob in ref_audio.items():
            assert union[name] == blob, f"{name} diverged from single-process"

        # per-host ZMQ egress: each host published ONLY its topics, in the
        # reference wire format (5-byte topic, LE u32 rate, int16 payload)
        topics_by_host: dict[int, set] = {0: set(), 1: set()}
        for i in (0, 1):
            for frames in captured[i]:
                assert len(frames) == 3
                assert len(frames[0]) == 5
                topics_by_host[i].add(frames[0].rstrip(b"\x00").decode())
        host_of_group = {g: 0 for g in g0} | {g: 1 for g in g1}
        topic_group = {"VFO01": 0, "VFO02": 0, "VFO13": 1}
        seen_any = topics_by_host[0] | topics_by_host[1]
        for topic, grp in topic_group.items():
            owner = host_of_group[grp]
            other = 1 - owner
            assert topic not in topics_by_host[other], (
                f"{topic} leaked from the wrong host"
            )
        # at least some traffic must have been observed on each host's port
        assert seen_any, "no ZMQ traffic captured from either host"


class TestGlobalPartition:
    """BASELINE config 5 / VERDICT r3 #3: CBAND_143E-shaped plan (3 UNEQUAL
    groups) on 2 hosts over ONE global (time, chan) mesh — the shape whose
    group-per-host balance ceiling (~0.82) cannot reach the >=90% target.
    Global partitioning splits compute exactly evenly; this test runs the
    real two-process DCN path and checks union == the single-process
    sharded run, disjoint per-host egress files, and the efficiency
    reports that motivate the mode."""

    def test_cband_two_hosts_global_mesh(self, tmp_path):
        cband_src = pathlib.Path("/root/reference/sample_ini/CBAND_143E.ini")
        if not cband_src.exists():
            pytest.skip("reference CBAND ini not available")
        base = cband_src.read_text()

        from sdrreceiver_tpu.dist import multihost
        from sdrreceiver_tpu.graph import build_plan
        from sdrreceiver_tpu.graph.config import parse_ini_text
        from sdrreceiver_tpu.io import iqfile

        plan = build_plan(parse_ini_text(base))
        # the motivation: group-per-host balance is BELOW target on 2 hosts
        grp = multihost.assignment_report(plan, 2)
        assert grp["balance_efficiency"] < 0.9
        glob = multihost.global_report(plan, 2, n_time=4)
        assert glob["balance_efficiency"] == 1.0
        assert glob["dcn_fraction_of_block"] < 0.01

        # tone on one channel of each group
        fs, center = 1536000, 1546200000
        chans = [
            (1545670000, 1000.0, 0.2),   # VFC01 (group 0)
            (1546300000 - 20000, 800.0, 0.2),  # a group-1 channel band
            (1546635000 + 10000, 1200.0, 0.2),  # a group-2 channel band
        ]
        iq = iqfile.synthesize_channels(
            fs // 2, fs, center, chans, noise=0.01, dc_offset=0.02 + 0.01j
        )
        iq_path = tmp_path / "cband.bin"
        iqfile.write_iq(iq_path, iq, "u8")

        def write_ini(name, port):
            p = tmp_path / name
            p.write_text(
                base.replace(
                    "zmq_address=tcp://*:6003", f"zmq_address=tcp://*:{port}"
                )
            )
            return p

        # single-process sharded reference on the SAME 4x1 time mesh (so
        # the float-op order matches the global run exactly)
        ref_ini = write_ini("ref.ini", _free_port())
        ref_out = tmp_path / "ref_out"
        _cli(
            "process-file", "-s", str(ref_ini), "--iq", str(iq_path),
            "--out", str(ref_out), "--backend", "cpu", "--mesh", "4x1",
            env=_env(n_devices=4),
        )
        ref_files = {
            p.name: p.read_bytes()
            for p in ref_out.iterdir()
            if p.name.startswith("audio_")
        }
        assert len(ref_files) == 17

        coord = f"localhost:{_free_port()}"
        zmq_ports = [_free_port(), _free_port()]
        results: dict[int, dict] = {}

        def run_proc(pid):
            ini_p = write_ini(f"host{pid}.ini", zmq_ports[pid])
            out_p = tmp_path / f"host{pid}_out"
            results[pid] = _cli(
                "process-file", "-s", str(ini_p), "--iq", str(iq_path),
                "--out", str(out_p), "--backend", "cpu",
                "--mesh", "4x1",
                "--partition", "global",
                "--coordinator", coord,
                "--num-processes", "2",
                "--process-id", str(pid),
                env=_env(n_devices=2),
            )

        procs = [threading.Thread(target=run_proc, args=(p,)) for p in (0, 1)]
        for t in procs:
            t.start()
        for t in procs:
            t.join(timeout=600)
        assert 0 in results and 1 in results, "a process did not finish"

        mh0, mh1 = results[0]["multihost"], results[1]["multihost"]
        assert mh0["mode"] == "global" and mh1["mode"] == "global"
        assert mh0["report"]["balance_efficiency"] == 1.0
        t0, t1 = set(mh0["local_topics"]), set(mh1["local_topics"])
        assert t0 and t1 and t0.isdisjoint(t1)
        assert len(t0 | t1) == 17

        # union of per-host files == single-process sharded run, and each
        # host wrote ONLY its owned topics
        union: dict[str, bytes] = {}
        for pid in (0, 1):
            owned = {f"audio_{t}.s16" for t in results[pid]["multihost"]["local_topics"]}
            got = {
                p.name: p.read_bytes()
                for p in (tmp_path / f"host{pid}_out").iterdir()
                if p.name.startswith("audio_")
            }
            assert set(got) == owned
            union.update(got)
        assert set(union) == set(ref_files)
        for name, blob in ref_files.items():
            ours = np.frombuffer(union[name], np.int16).astype(np.int32)
            ref = np.frombuffer(blob, np.int16).astype(np.int32)
            assert ours.shape == ref.shape, name
            d = np.abs(ours - ref)
            # same mesh shape => same float-op order; allow the rare
            # 1-LSB quantizer flip from the replicated-output gather path
            assert d.max() <= 1, (name, d.max())


class TestAssignedNoGroups:
    def test_more_processes_than_groups_fails_loudly(self, recording):
        d, iq = recording
        ini = _write_ini(d, "toomany.ini", _free_port())
        coord = f"localhost:{_free_port()}"
        outs = {}

        def run_proc(pid):
            outs[pid] = subprocess.run(
                [
                    sys.executable, "-m", "sdrreceiver_tpu.cli.main",
                    "process-file", "-s", str(ini), "--iq", str(iq),
                    "--backend", "cpu",
                    "--coordinator", coord,
                    "--num-processes", "3",
                    "--process-id", str(pid),
                ],
                capture_output=True, text=True, env=_env(), timeout=240,
                cwd=str(REPO),
            )

        threads = [threading.Thread(target=run_proc, args=(p,)) for p in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        # 2 groups over 3 processes: exactly one process must refuse to idle
        codes = sorted(outs[p].returncode for p in range(3))
        assert codes.count(0) == 2
        failed = next(p for p in range(3) if outs[p].returncode != 0)
        assert "assigned no groups" in outs[failed].stderr
