"""Local librtlsdr USB ingest, exercised against a fake ABI stub.

The stub (tests/fake_librtlsdr.cpp) implements the librtlsdr symbols the
binding uses and synthesizes a phase-continuous tone at +fs/8, so the
whole async-callback -> native-ring -> f32-block path runs for real.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import tempfile

import numpy as np
import pytest

from sdrreceiver_tpu.io import native, rtlusb

_SRC = pathlib.Path(__file__).with_name("fake_librtlsdr.cpp")


@pytest.fixture(scope="module")
def fake_lib(tmp_path_factory):
    if native.load_library() is None:
        pytest.skip("no native toolchain")
    so = tmp_path_factory.mktemp("fakertl") / "libfakertlsdr.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(so)],
        check=True,
        capture_output=True,
    )
    return str(so)


@pytest.fixture()
def rtl_env(fake_lib, monkeypatch):
    monkeypatch.setenv("SDRX_LIBRTLSDR", fake_lib)
    # drop any cached handle so the override takes effect
    rtlusb._LIB = None
    rtlusb._LIB_PATH = None
    yield fake_lib
    rtlusb._LIB = None
    rtlusb._LIB_PATH = None


def _inspect(fake_lib):
    lib = ctypes.CDLL(fake_lib)
    for f in (
        "fake_get_sample_rate",
        "fake_get_center_freq",
        "fake_get_gain_mode",
        "fake_get_gain",
        "fake_get_agc_mode",
        "fake_get_bias_tee",
        "fake_get_open",
    ):
        getattr(lib, f).restype = ctypes.c_int
        getattr(lib, f).argtypes = [ctypes.c_int]
    return lib


def test_enumerate_and_serial_lookup(rtl_env):
    devs = rtlusb.enumerate_devices()
    assert [d.serial for d in devs] == ["00000001", "77777777"]
    assert devs[0].product == "RTL2838UHIDIR"
    assert rtlusb.index_by_serial("77777777") == 1
    assert rtlusb.index_by_serial("nope") == -1


def test_stream_configure_and_tone(rtl_env):
    insp = _inspect(rtl_env)
    fs = 1_536_000
    buflen = 2 * fs // 4  # reference buffer split: 4 callbacks/s
    with rtlusb.RtlUsbDevice(0) as dev:
        assert insp.fake_get_open(0) == 1
        assert dev.supported_gains()[-1] == 496
        dev.start(fs, 1_545_600_000, buflen, gain_tenths_db=496)
        # StartRtl parity: manual gain mode, exact gain, AGC off
        assert insp.fake_get_sample_rate(0) == fs
        assert insp.fake_get_center_freq(0) == 1_545_600_000
        assert insp.fake_get_gain_mode(0) == 1
        assert insp.fake_get_gain(0) == 496
        assert insp.fake_get_agc_mode(0) == 0

        blocks = []
        while len(blocks) < 3:
            b = dev.ring.pop_f32(timeout_ms=5000)
            assert b is not None
            blocks.append(b)

        # runtime retune (sdrj.cpp:190-200)
        assert dev.set_center_freq(1_546_000_000) == 0
        assert insp.fake_get_center_freq(0) == 1_546_000_000

        dev.stop()
        assert not dev.active
    assert insp.fake_get_open(0) == 0

    # the converted floats carry a clean +fs/8 tone (LUT removed the bias)
    x = np.concatenate(blocks)
    z = x[0::2] + 1j * x[1::2]
    assert abs(np.mean(z)) < 1.0
    spec = np.abs(np.fft.fft(z))
    peak = np.argmax(spec)
    assert peak == len(z) // 8
    # spectral purity: everything else is quantization error, well down
    rest = spec.copy()
    rest[peak] = 0
    assert spec[peak] > 50 * rest.max()


def test_ring_drops_when_consumer_stalls(rtl_env):
    fs = 1_536_000
    with rtlusb.RtlUsbDevice(1) as dev:
        dev.start(fs, 1_545_600_000, 2 * fs // 4, gain_tenths_db=240, n_slots=2)
        import time

        deadline = time.time() + 10.0
        while dev.dropped_blocks == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert dev.dropped_blocks > 0
        stats = dev.ring.stats
        assert stats["dropped"] == dev.dropped_blocks


def test_restart_recovers_streaming(rtl_env):
    """Elastic USB: restart() closes the (possibly dead) handle, re-opens
    the same index, replays the start parameters, and streams into a NEW
    ring — the automatic version of the reference's manual restart
    (sdrj.cpp:107-123)."""
    insp = _inspect(rtl_env)
    fs = 1_536_000
    with rtlusb.RtlUsbDevice(0) as dev:
        dev.start(fs, 1_545_600_000, 2 * fs // 4, gain_tenths_db=240)
        assert dev.ring.pop_raw(timeout_ms=5000) is not None
        old_ring = dev.ring
        assert dev.restart()
        assert dev.restarts == 1
        assert dev.active
        assert dev.ring is not old_ring
        # configuration replayed on the re-opened handle
        assert insp.fake_get_sample_rate(0) == fs
        assert insp.fake_get_gain(0) == 240
        assert dev.ring.pop_raw(timeout_ms=5000) is not None
    assert insp.fake_get_open(0) == 0


def test_bias_tee_standalone_open_set_close(rtl_env):
    insp = _inspect(rtl_env)
    assert rtlusb.bias_tee_standalone(True, device_idx=1)
    assert insp.fake_get_bias_tee(1) == 1
    assert insp.fake_get_open(1) == 0  # closed again after the dance
    assert rtlusb.bias_tee_standalone(False, device_idx=1)
    assert insp.fake_get_bias_tee(1) == 0


USB_INI = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://127.0.0.1:29879
auto_start_tuner_serial=77777777
auto_start_biast=1
tuner_gain=240
[main_vfos]
size=1
1\\frequency=1545791000
1\\out_rate=384000
[vfos]
size=1
1\\frequency=1545791000
1\\gain=0.2
1\\data_rate=600
1\\topic=VFO01
"""


def test_devices_command(rtl_env, capsys):
    from sdrreceiver_tpu.cli.main import main

    assert main(["devices"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    import json

    assert json.loads(lines[1])["serial"] == "77777777"


def test_run_local_usb_end_to_end(rtl_env, tmp_path):
    """Full local-dongle path through the real `run` command: fake
    librtlsdr async callback -> native ring -> device pipeline -> ZMQ.

    The stub's tone sits at +fs/8 = +192 kHz; the configured channel is
    at center+191 kHz, so the demodulated USB audio is a 1 kHz tone."""
    import json
    import threading

    import zmq

    from sdrreceiver_tpu.cli.main import main
    from sdrreceiver_tpu.cli.control import ControlServer  # noqa: F401

    ini = tmp_path / "usb.ini"
    ini.write_text(USB_INI)

    ctx = zmq.Context.instance()
    sub = ctx.socket(zmq.SUB)
    sub.connect("tcp://127.0.0.1:29879")
    sub.setsockopt(zmq.SUBSCRIBE, b"VFO01")
    sub.setsockopt(zmq.RCVTIMEO, 30000)

    block = 49152
    rc = {}

    def target():
        rc["run"] = main(
            ["run", "-s", str(ini), "--block", str(block), "--max-blocks", "10"]
        )

    t = threading.Thread(target=target, daemon=True)
    t.start()
    frames = sub.recv_multipart()
    assert frames[0] == b"VFO01"
    assert int.from_bytes(frames[1], "little") == 12000
    pcm = np.frombuffer(frames[2], np.int16).astype(np.float64)
    # collect a few more frames for frequency resolution
    for _ in range(4):
        more = sub.recv_multipart()
        pcm = np.concatenate([pcm, np.frombuffer(more[2], np.int16)])
    t.join(timeout=120)
    assert rc.get("run") == 0
    sub.close(linger=0)

    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    peak_hz = np.argmax(spec) * 12000 / len(pcm)
    assert abs(peak_hz - 1000.0) < 30.0

    # auto_start picked device 1 (serial 77777777) and set its bias tee
    insp = _inspect(rtl_env)
    assert insp.fake_get_bias_tee(1) == 1
    assert insp.fake_get_gain(1) == 240
    assert insp.fake_get_open(1) == 0  # closed after the run


def test_unavailable_is_clean(monkeypatch):
    monkeypatch.setenv("SDRX_LIBRTLSDR", "/nonexistent/librtlsdr.so")
    rtlusb._LIB = None
    rtlusb._LIB_PATH = None
    assert not rtlusb.available()
    assert rtlusb.enumerate_devices() == []
    assert rtlusb.index_by_serial("x") == -1
    with pytest.raises(RuntimeError):
        rtlusb.RtlUsbDevice(0)
    rtlusb._LIB = None
    rtlusb._LIB_PATH = None
