"""Checkpoint/resume of streaming state + spectrum observability."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from sdrreceiver_tpu.core import checkpoint
from sdrreceiver_tpu.graph import build_plan, parse_ini_text
from sdrreceiver_tpu.graph.compiler import CompiledReceiver
from sdrreceiver_tpu.io import iqfile
from sdrreceiver_tpu.obs.spectrum import SpectrumEMA, power_spectrum

INI = """
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

BLOCK = 24576


@pytest.fixture(scope="module")
def plan():
    return build_plan(parse_ini_text(INI))


@pytest.fixture(scope="module")
def iq():
    return iqfile.synthesize_channels(
        4 * BLOCK, 1536000, 1545600000, [(1545005146, 1000.0, 20.0)], noise=1.0
    )


class TestCheckpoint:
    def test_resume_is_seamless(self, plan, iq, tmp_path):
        """Process 4 blocks straight vs 2 + checkpoint + restore + 2: the
        audio must be bit-identical (no restart glitch — the improvement over
        the reference's stateless restart, SURVEY.md section 5)."""
        rx = CompiledReceiver(plan, BLOCK)
        state = rx.init_state()
        whole = []
        for i in range(4):
            state, o = rx.step_iq(state, jnp.asarray(iq[i * BLOCK : (i + 1) * BLOCK]))
            whole.append(np.asarray(rx.split_audio(o)["audio/VFO01"]))
        whole = np.concatenate(whole)

        state = rx.init_state()
        first = []
        for i in range(2):
            state, o = rx.step_iq(state, jnp.asarray(iq[i * BLOCK : (i + 1) * BLOCK]))
            first.append(np.asarray(rx.split_audio(o)["audio/VFO01"]))
        ck = tmp_path / "state.npz"
        checkpoint.save_state(ck, rx.export_state(state), plan)

        # "restart": fresh receiver, restore
        rx2 = CompiledReceiver(plan, BLOCK)
        state2 = rx2.import_state(checkpoint.load_state(ck, plan))
        second = []
        for i in range(2, 4):
            state2, o = rx2.step_iq(state2, jnp.asarray(iq[i * BLOCK : (i + 1) * BLOCK]))
            second.append(np.asarray(rx2.split_audio(o)["audio/VFO01"]))
        resumed = np.concatenate(first + second)
        np.testing.assert_array_equal(resumed, whole)

    def test_fingerprint_mismatch_rejected(self, plan, tmp_path):
        rx = CompiledReceiver(plan, BLOCK)
        ck = tmp_path / "s.npz"
        checkpoint.save_state(ck, rx.export_state(rx.init_state()), plan)
        other = build_plan(parse_ini_text(INI.replace("1545005146", "1545005000")))
        with pytest.raises(ValueError, match="fingerprint"):
            checkpoint.load_state(ck, other)

    def test_cross_mode_resume_jnp_pallas_sharded(self, plan, iq, tmp_path):
        """VERDICT r2 item 5: a checkpoint taken in ANY execution mode
        resumes into any other.  Save from the jnp receiver mid-stream,
        resume into (a) a Pallas-kernel receiver and (b) a sharded receiver,
        and vice versa — the canonical export converts the fused kernels'
        tail layout to per-stage histories and back."""
        from sdrreceiver_tpu.dist import ShardedReceiver, make_mesh

        rx_jnp = CompiledReceiver(plan, BLOCK)
        rx_pal = CompiledReceiver(plan, BLOCK, use_pallas=True,
                                  pallas_interpret=True)
        import jax

        mesh = make_mesh(n_time=2, n_chan=1, devices=jax.devices()[:2])
        rx_sh = ShardedReceiver(plan, mesh, BLOCK)

        def run2(rx, state, lo):
            outs = []
            for i in range(lo, lo + 2):
                state, o = rx.step_iq(
                    state, jnp.asarray(iq[i * BLOCK : (i + 1) * BLOCK])
                )
                outs.append(np.asarray(rx.split_audio(o)["audio/VFO01"]))
            return state, np.concatenate(outs)

        # ground truth: jnp straight through
        s = rx_jnp.init_state()
        s, first = run2(rx_jnp, s, 0)
        ck = tmp_path / "x.npz"
        checkpoint.save_state(ck, rx_jnp.export_state(s), plan)
        _, tail_jnp = run2(rx_jnp, s, 2)

        # jnp -> pallas and jnp -> sharded
        named = checkpoint.load_state(ck, plan)
        _, tail_pal = run2(rx_pal, rx_pal.import_state(named), 2)
        _, tail_sh = run2(rx_sh, rx_sh.import_state(named), 2)
        # pallas tails round-trip bit-exactly; outputs may differ by the
        # fused kernel's own (tested <=1 LSB) numerics
        assert np.abs(tail_pal.astype(int) - tail_jnp.astype(int)).max() <= 1
        np.testing.assert_array_equal(tail_sh, tail_jnp)

        # pallas -> jnp: save from the pallas receiver, resume in jnp
        sp = rx_pal.import_state(named)
        sp, _ = run2(rx_pal, sp, 2)
        ck2 = tmp_path / "y.npz"
        checkpoint.save_state(ck2, rx_pal.export_state(sp), plan)
        s2 = rx_jnp.import_state(checkpoint.load_state(ck2, plan))
        _, tail2_jnp = run2(rx_jnp, s2, 0)  # content irrelevant; must run
        assert tail2_jnp.shape == first.shape

    def test_import_xtail_length_mismatch_tolerated(self, plan, iq):
        """The xtail leaf's length depends on block size via pick_warmup, so
        a checkpoint from a differently-rounded receiver may carry a
        different tail length.  Import must left-pad/trim (bounded warm-up
        transient), not raise (round-4 advisor finding)."""
        rx = CompiledReceiver(plan, BLOCK)
        want = rx.xtail_len()
        assert want > 0
        s = rx.init_state()
        s, _ = rx.step_iq(s, jnp.asarray(iq[:BLOCK]))
        named = rx.export_state(s)
        xt = named["xtail"]
        for other in (want // 2, want + 512):
            mod = dict(named)
            if other <= want:
                mod["xtail"] = xt[-other:]
            else:
                mod["xtail"] = np.concatenate(
                    [np.zeros(other - want, xt.dtype), xt]
                )
            s2 = rx.import_state(mod)
            # the trimmed import keeps the tail's LAST samples (the ones
            # the warm-up actually reads); padded import keeps all of them
            back = rx.export_state(s2)["xtail"]
            np.testing.assert_array_equal(back[-min(other, want):],
                                          xt[-min(other, want):])
            s2, o = rx.step_iq(s2, jnp.asarray(iq[BLOCK : 2 * BLOCK]))
            assert "pcm/g0/b0" in o

    def test_import_rejects_bad_shape_with_path(self, plan):
        rx = CompiledReceiver(plan, BLOCK)
        named = rx.export_state(rx.init_state())
        key = next(k for k in named if "cascade" in k)
        named[key] = np.zeros((3, 3), np.complex64)
        with pytest.raises(ValueError, match="cascade"):
            rx.import_state(named)
        named.pop(key)
        with pytest.raises(KeyError, match="cascade"):
            rx.import_state(named)


class TestSpectrum:
    def test_power_spectrum_units(self):
        """A full-scale complex tone in the reference's display units:
        10*log10(1e5 * |X|/nfft) with Hann windowing halving the peak."""
        nfft = 8192
        n = np.arange(nfft)
        f_bin = 1024
        x = np.exp(2j * np.pi * f_bin * n / nfft).astype(np.complex64)
        spec = np.asarray(power_spectrum(jnp.asarray(x), nfft))
        peak_idx = int(np.argmax(spec))
        # fftshifted: bin f_bin lands at nfft//2 + f_bin
        assert peak_idx == nfft // 2 + f_bin
        # Hann coherent gain 0.5 -> |X| = nfft/2 -> 10*log10(1e5*0.5) ~ 47 dB
        assert abs(spec[peak_idx] - 10 * np.log10(1e5 * 0.5)) < 0.1

    def test_ema_and_smoothing(self, rng):
        s = SpectrumEMA(nfft=256, alpha=0.5)
        x = rng.standard_normal(256) + 1j * rng.standard_normal(256)
        s.update(x.astype(np.complex64))
        s.update(x.astype(np.complex64))
        assert s.pwr.shape == (256,)
        assert s.smoothed.shape == (246,)

    def test_tap_outputs(self, plan, iq):
        # taps are truncated to the scope's nfft (8192) in the compiled step:
        # the EMA consumes exactly one FFT frame per update, so fetching the
        # rest would waste device->host bandwidth (ADVICE r1)
        rx = CompiledReceiver(plan, BLOCK, emit_taps=("main", "g0"))
        state = rx.init_state()
        _, o = rx.step_iq(state, jnp.asarray(iq[:BLOCK]))
        assert o["tap/main"].shape == (2, 8192)
        assert o["tap/g0"].shape == (2, min(BLOCK // 4, 8192))

    def test_tap_full_block_when_untruncated(self, plan, iq):
        rx = CompiledReceiver(plan, BLOCK, emit_taps=("main",), tap_samples=None)
        _, o = rx.step_iq(rx.init_state(), jnp.asarray(iq[:BLOCK]))
        assert o["tap/main"].shape == (2, BLOCK)
        # truncated tap == the LAST 8192 samples of the block: the scope
        # shows the freshest window, like the reference FFT-ing the most
        # recent buffer it is handed (mainwindow.cpp:418-427)
        rx2 = CompiledReceiver(plan, BLOCK, emit_taps=("main",))
        _, o2 = rx2.step_iq(rx2.init_state(), jnp.asarray(iq[:BLOCK]))
        np.testing.assert_array_equal(
            np.asarray(o["tap/main"])[:, -8192:], np.asarray(o2["tap/main"])
        )

    def test_tap_topic_collision_rejected(self):
        # a sub-VFO topic literally named like a built-in tap would silently
        # shadow it in the flat tap namespace — must be rejected loudly
        bad = INI.replace("1\\topic=VFO01", "1\\topic=g0")
        plan = build_plan(parse_ini_text(bad))
        with pytest.raises(ValueError, match="collision"):
            CompiledReceiver(plan, BLOCK)

    def test_duplicate_topic_rejected_with_audio_message(self):
        # two channels on one topic: the reference interleaves both channels'
        # ZMQ frames (valid there); our dict-keyed audio/<topic> outputs
        # cannot express that, so the failure message must name the audio
        # output shadowing — not just the scope tap namespace (ADVICE r2)
        bad = INI.replace("size=1\n1\\frequency=1545005146", (
            "size=2\n1\\frequency=1545005146"
        )) + "2\\frequency=1545012000\n2\\gain=5\n2\\data_rate=600\n2\\topic=VFO01\n"
        plan = build_plan(parse_ini_text(bad))
        with pytest.raises(ValueError, match="duplicate sub-VFO topic.*audio/VFO01"):
            CompiledReceiver(plan, BLOCK)

    def test_invalid_tap_rejected(self, plan):
        with pytest.raises(ValueError, match="unknown taps"):
            CompiledReceiver(plan, BLOCK, emit_taps=("g9",))

    def test_channel_tap_output(self, plan, iq):
        # per-VFO scope: decimated pre-demod baseband at the bucket rate
        # (the reference taps vfo.cpp:290-295 before demod)
        rx = CompiledReceiver(plan, BLOCK, emit_taps=("VFO01",))
        assert rx.tap_rates() == {"main": 1536000, "g0": 384000, "VFO01": 12000}
        state = rx.init_state()
        _, o = rx.step_iq(state, jnp.asarray(iq[:BLOCK]))
        assert o["tap/VFO01"].shape == (2, BLOCK * 12000 // 1536000)
        # the injected channel tone lands in this tap: real signal power
        z = np.asarray(o["tap/VFO01"][0]) + 1j * np.asarray(o["tap/VFO01"][1])
        assert np.abs(z).max() > 0

    def test_channel_tap_does_not_change_audio(self, plan, iq):
        rx0 = CompiledReceiver(plan, BLOCK)
        rx1 = CompiledReceiver(plan, BLOCK, emit_taps=("VFO01", "main"))
        _, o0 = rx0.step_iq(rx0.init_state(), jnp.asarray(iq[:BLOCK]))
        _, o1 = rx1.step_iq(rx1.init_state(), jnp.asarray(iq[:BLOCK]))
        o0, o1 = rx0.split_audio(o0), rx1.split_audio(o1)
        assert np.array_equal(np.asarray(o0["audio/VFO01"]), np.asarray(o1["audio/VFO01"]))


class TestLiveScope:
    def make(self):
        from sdrreceiver_tpu.obs.spectrum import LiveScope

        return LiveScope(
            {"main": 1536000, "g0": 384000, "VFO01": 12000},
            initial="main",
            stride=1,
        )

    def test_fetch_filter(self):
        s = self.make()
        assert s.wants("audio/VFO01")  # non-taps always fetched
        assert s.wants("tap/main")
        assert not s.wants("tap/VFO01")
        s.set_scope("VFO01")
        assert s.wants("tap/VFO01") and not s.wants("tap/main")
        s.set_fft(0)
        assert not s.wants("tap/VFO01")
        assert s.wants("audio/VFO01")

    def test_observe_and_snapshot(self, rng):
        s = self.make()
        x = rng.normal(size=(2, 8192)).astype(np.float32)
        s.observe({"tap/main": x})
        assert s.ema.pwr.any()
        snap = s.snapshot(256)
        assert snap["scope"] == "main" and snap["rate"] == 1536000
        assert len(snap["db"]) == 256
        # switching scope resets the EMA (different signal)
        s.set_scope("g0")
        assert not s.ema.pwr.any()

    def test_set_scope_validation(self):
        s = self.make()
        assert "error" in s.set_scope("NOPE")
        assert s.set_scope("off") == {"ok": True, "scope": None}
        assert not s.wants("tap/main")

    def test_stride_aware_fetch(self, rng):
        """wants() only fetches the tap on blocks whose frame the EMA will
        consume — every stride-th, first frame immediately (ADVICE r1)."""
        from sdrreceiver_tpu.obs.spectrum import LiveScope

        s = LiveScope({"main": 1536000}, initial="main", stride=5)
        x = rng.normal(size=(2, 8192)).astype(np.float32)
        fetched = []
        for i in range(12):
            want = s.wants("tap/main")
            fetched.append(want)
            s.observe({"tap/main": x} if want else {})
        assert fetched == [
            True, False, False, False, False,
            True, False, False, False, False,
            True, False,
        ]
        assert s.ema.pwr.any()
        # scope switch resets the cadence: next block fetches immediately
        s.tap_rates["g0"] = 384000
        s.set_scope("g0")
        assert s.wants("tap/g0")

    def test_planar_update_stays_planar(self, rng):
        """SpectrumEMA.update on a planar [2, T] tap must not device_put a
        complex host array (poisons restricted remote-TPU backends)."""
        import sdrreceiver_tpu.obs.spectrum as spec_mod

        planar = rng.normal(size=(2, 4096)).astype(np.float32)
        z = planar[0] + 1j * planar[1]

        orig = jnp.asarray
        seen_complex = []

        def guarded(x, *a, **k):
            arr = np.asarray(x) if isinstance(x, np.ndarray) else x
            if isinstance(arr, np.ndarray) and np.iscomplexobj(arr):
                seen_complex.append(arr.dtype)
            return orig(x, *a, **k)

        s = spec_mod.SpectrumEMA(nfft=2048)
        jnp_mod = spec_mod.jnp
        try:
            jnp_mod.asarray = guarded
            s.update(planar)
        finally:
            jnp_mod.asarray = orig
        assert not seen_complex, "complex host array reached jnp.asarray"
        # and the planar result equals the complex-input result
        s2 = spec_mod.SpectrumEMA(nfft=2048)
        s2.update(z.astype(np.complex64))
        np.testing.assert_allclose(s.pwr, s2.pwr, rtol=1e-5, atol=1e-5)

    def test_snapshot_symmetric_trim(self):
        from sdrreceiver_tpu.obs.spectrum import LiveScope

        s = LiveScope({"main": 1536000}, initial="main")
        # impose a known asymmetric curve: rising ramp
        s.ema.pwr = np.arange(8192, dtype=np.float64)
        snap = s.snapshot(512)
        db = np.asarray(snap["db"])
        curve = s.ema.smoothed
        # the folded curve's mean must sit at the curve's center (symmetric
        # trim); a one-sided trim of 502 points would bias it low
        assert abs(db.mean() - curve.mean()) < 1.0


class TestCliIntegration:
    def test_process_file_with_spectrum_and_checkpoint(self, plan, iq, tmp_path, capsys):
        from sdrreceiver_tpu.cli.main import main

        ini = tmp_path / "c.ini"
        ini.write_text(INI)
        iqf = tmp_path / "c.u8"
        iqfile.write_iq(iqf, iq, "u8")
        outdir = tmp_path / "out"
        ck = tmp_path / "ck.npz"
        rc = main(
            [
                "process-file",
                "-s",
                str(ini),
                "--iq",
                str(iqf),
                "--out",
                str(outdir),
                "--block",
                str(BLOCK),
                "--spectrum",
                "main",
                "--save-state",
                str(ck),
            ]
        )
        assert rc == 0
        info = json.loads(capsys.readouterr().out)
        assert "spectrum_main.npy" in info["outputs_written"]
        spec = np.load(outdir / "spectrum_main.npy")
        assert spec.shape == (8192 - 10,)
        assert ck.exists()

        # resume run must load cleanly
        rc = main(
            [
                "process-file",
                "-s",
                str(ini),
                "--iq",
                str(iqf),
                "--block",
                str(BLOCK),
                "--resume",
                str(ck),
            ]
        )
        assert rc == 0
