"""End-to-end CompiledReceiver tests: audio SNR vs the reference chain model,
streaming continuity, output wiring.  (SURVEY.md section 4: the offline
``process_file`` verification the reference never implemented.)"""

import jax.numpy as jnp
import numpy as np
import pytest

import refchain
from sdrreceiver_tpu.graph import compile_plan, build_plan, parse_ini_text

FS = 1536000
CENTER = 1545600000

SMALL_INI = f"""
sample_rate={FS}
center_frequency={CENTER}
zmq_address=tcp://*:6003
correct_dc_bias=1
[main_vfos]
size=2
1\\frequency=1545116000
1\\out_rate=384000
2\\frequency=1546096000
2\\out_rate=192000
2\\zmq_address=tcp://127.0.0.1:7777
2\\zmq_topic=IQFWD
[vfos]
size=3
1\\frequency=1545005146
1\\gain=5
1\\data_rate=600
1\\filter_bandwidth=4000
1\\topic=VFO01
2\\frequency=1545214573
2\\gain=5
2\\data_rate=600
2\\topic=VFO02
3\\frequency=1546005300
3\\gain=5
3\\data_rate=10500
3\\topic=VFO13
"""

BLOCK = 49152  # small block (chain divisor 128 divides it) for CPU test speed


def snr_db(got, want):
    err = got - want
    p_sig = np.mean(np.abs(want) ** 2)
    p_err = np.mean(np.abs(err) ** 2)
    return 10 * np.log10(p_sig / max(p_err, 1e-30))


@pytest.fixture(scope="module")
def rx():
    plan = build_plan(parse_ini_text(SMALL_INI))
    return compile_plan(plan, block_samples=BLOCK)


@pytest.fixture(scope="module")
def iq():
    """Two USB channels + an interferer + noise + DC offset, 4 blocks long."""
    t_len = 4 * BLOCK
    n = np.arange(t_len)
    rng = np.random.default_rng(42)
    x = np.zeros(t_len, dtype=np.complex128)
    for rf, tone, amp in [
        (1545005146, 1100.0, 0.4),  # VFO01: 1.1 kHz audio tone
        (1546005300, 2700.0, 0.3),  # VFO13: 2.7 kHz audio tone
        (1545500000, 0.0, 0.5),  # interferer far from both
    ]:
        x += amp * np.exp(2j * np.pi * ((rf - CENTER) + tone) * n / FS)
    x += 0.02 * (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len))
    x += 3.0 - 2.0j  # DC offset; correct_dc_bias=1 must remove it
    return x.astype(np.complex64)


@pytest.fixture(scope="module")
def outputs(rx, iq):
    state = rx.init_state()
    outs = []
    for i in range(0, len(iq), BLOCK):
        state, o = rx.step_iq(state, jnp.asarray(iq[i : i + BLOCK]))
        o = rx.split_audio(o)
        outs.append({k: np.asarray(v) for k, v in o.items()})
    cat = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    return cat


class TestWiring:
    def test_output_keys_and_shapes(self, rx, outputs):
        shapes = rx.output_shapes()
        assert set(outputs) == {
            "audio/VFO01",
            "audio/VFO02",
            "audio/VFO13",
            "iq/IQFWD",
        }
        for k, v in outputs.items():
            assert v.shape[0] == 4 * shapes[k][0], k
        assert outputs["audio/VFO01"].dtype == np.int16
        assert outputs["iq/IQFWD"].dtype == np.uint8

    def test_rates(self, rx):
        assert rx.rates() == {
            "audio/VFO01": 12000,
            "audio/VFO02": 12000,
            "audio/VFO13": 48000,
            "iq/IQFWD": 192000,
        }


class TestAudio:
    def test_vfo01_snr_vs_reference_chain(self, outputs, iq):
        """>= 60 dB vs the reference chain on the same IQ (BASELINE.md)."""
        audio_ref, pcm_ref = refchain.channel_chain(
            iq.astype(np.complex128),
            FS,
            main_mixer=CENTER - 1545116000,
            main_stages=2,
            sub_mixer=1545116000 - 1545005146,
            sub_stages=5,
            out_rate=12000,
            filter_bw=4000,
            gain=0.05,
        )
        got = outputs["audio/VFO01"].astype(np.float64)
        want = pcm_ref.astype(np.float64)
        # skip the filter warmup transient
        assert snr_db(got[500:], want[500:]) >= 60.0
        # DSP-only fidelity (same round-to-nearest quantizer on both sides):
        want_round = np.clip(np.round(audio_ref * 0.05 * 32768.0), -32768, 32767)
        assert snr_db(got[500:], want_round[500:]) >= 75.0

    def test_vfo13_snr_vs_reference_chain(self, outputs, iq):
        audio_ref, pcm_ref = refchain.channel_chain(
            iq.astype(np.complex128),
            FS,
            main_mixer=CENTER - 1546096000,
            main_stages=3,
            sub_mixer=1546096000 - 1546005300,
            sub_stages=2,
            out_rate=48000,
            filter_bw=0,
            gain=0.05,
        )
        got = outputs["audio/VFO13"].astype(np.float64)
        # absolute parity incl. the reference's truncating int16 cast: the
        # trunc-vs-round difference floors this at ~20*log10(rms/0.7) — at
        # this test's modest signal level that is ~55 dB (it passes 60 dB at
        # realistic near-full-scale audio levels; see test above for the
        # DSP-only bound)
        assert snr_db(got[500:], pcm_ref.astype(np.float64)[500:]) >= 50.0
        want_round = np.clip(np.round(audio_ref * 0.05 * 32768.0), -32768, 32767)
        assert snr_db(got[500:], want_round[500:]) >= 75.0

    def test_tone_frequencies(self, outputs):
        """Each channel's audio must peak at its injected tone frequency."""
        for key, rate, tone in [
            ("audio/VFO01", 12000, 1100.0),
            ("audio/VFO13", 48000, 2700.0),
        ]:
            a = outputs[key][1000:].astype(np.float64)
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
            peak = np.fft.rfftfreq(len(a), 1.0 / rate)[np.argmax(spec)]
            assert abs(peak - tone) < 15.0, (key, peak)

    def test_quiet_channel_is_quiet(self, outputs):
        """VFO02 has no signal: output should be near the noise floor."""
        a02 = outputs["audio/VFO02"].astype(np.float64)
        a01 = outputs["audio/VFO01"].astype(np.float64)
        assert np.sqrt(np.mean(a02**2)) < 0.1 * np.sqrt(np.mean(a01**2))


class TestStreaming:
    def test_block_size_invariance(self, rx, iq, outputs):
        """Processing with twice the block size gives bit-identical audio."""
        rx2 = compile_plan(rx.plan, block_samples=2 * BLOCK)
        state = rx2.init_state()
        outs = []
        for i in range(0, len(iq), 2 * BLOCK):
            state, o = rx2.step_iq(state, jnp.asarray(iq[i : i + 2 * BLOCK]))
            outs.append({k: np.asarray(v) for k, v in rx2.split_audio(o).items()})
        for k in outputs:
            cat = np.concatenate([o[k] for o in outs])
            np.testing.assert_array_equal(cat, outputs[k], err_msg=k)

    def test_invalid_block_rejected(self, rx):
        with pytest.raises(ValueError, match="divisor"):
            compile_plan(rx.plan, block_samples=1000)


class TestBurst:
    """step_many_* (k blocks per dispatch via lax.scan) must match k single
    steps — state carry and every output — to the cross-executable tolerance
    (tests/burstcmp.py: exact integer state, float-ULP elsewhere)."""

    def test_step_many_matches_sequential(self, rx, iq):
        from burstcmp import assert_outputs_close, assert_states_close

        k = 4
        blocks = jnp.asarray(iq.reshape(k, rx.block))
        state_m, outs_m = rx.step_many_iq(rx.init_state(), blocks)
        outs_m = {key: np.asarray(v) for key, v in outs_m.items()}
        per_block = rx.unstack_outputs(outs_m, k)

        state = rx.init_state()
        for i in range(k):
            state, o = rx.step_iq(state, blocks[i])
            assert_outputs_close(per_block[i], o, f"blk{i}")
            # split_audio consumes an unstacked burst frame unchanged
            assert set(rx.split_audio(per_block[i])) == set(rx.split_audio(
                {key: np.asarray(vv) for key, vv in o.items()}
            ))
        assert_states_close(rx, state_m, state)

    def test_step_many_u8_entry(self, rx):
        """The u8 burst entry matches repeated u8 single steps (dongle-format
        ingest is what bench.py and the live path feed)."""
        from burstcmp import assert_outputs_close, assert_states_close

        rng = np.random.default_rng(7)
        k = 3
        raw = rng.integers(0, 256, (k, 2 * rx.block)).astype(np.uint8)
        state_m, outs_m = rx.step_many_u8(rx.init_state(), jnp.asarray(raw))
        per_block = rx.unstack_outputs(
            {key: np.asarray(v) for key, v in outs_m.items()}, k
        )
        state = rx.init_state()
        for i in range(k):
            state, o = rx.step_u8(state, jnp.asarray(raw[i]))
            assert_outputs_close(per_block[i], o, f"blk{i}")
        assert_states_close(rx, state_m, state)


class TestCompressedIQ:
    def test_iq_forward_content(self, rx, iq, outputs):
        """The packed-nibble stream must decode back to the group baseband
        (coarse 4-bit fidelity)."""
        z = refchain.halfband_cascade(
            refchain.mix(refchain.dc_correct(iq.astype(np.complex128)), CENTER - 1546096000, FS),
            3,
        )
        packed = outputs["iq/IQFWD"]
        re = ((packed.astype(np.int8)) & np.int8(-16)).astype(np.float64) / 128.0
        im = (
            (((packed & 0x0F).astype(np.uint8) << 4).astype(np.uint8))
            .view(np.int8)
            .astype(np.float64)
            / 128.0
        )
        dec = re + 1j * im
        # correlation with the true baseband; bounded by the 4-bit nibble
        # quantization of a ~0.3-amplitude signal (~5 levels), so modest
        c = np.abs(np.vdot(dec[200:], z[200 : len(dec)])) / (
            np.linalg.norm(dec[200:]) * np.linalg.norm(z[200 : len(dec)]) + 1e-30
        )
        assert c > 0.85


class TestOverlapSaveIntegration:
    def test_oss_audio_path_matches_direct(self, rng):
        """Long audio filters through the overlap-save FFT engine must match
        the direct-conv path in the full receiver across streamed blocks."""
        from sdrreceiver_tpu.graph.compiler import CompiledReceiver

        ini = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
[main_vfos]
size=1
1\\frequency=1545116000
1\\out_rate=384000
[vfos]
size=1
1\\frequency=1545005146
1\\gain=5
1\\out_rate=48000
1\\filter_bandwidth=3000
1\\topic=VFO01
"""
        plan = build_plan(parse_ini_text(ini))
        # 3 kHz bw at 48 kHz -> 155 taps: above the 128-tap OSS threshold
        # 155 designed taps + the leading zero-delay tap
        assert plan.groups[0].buckets[0].audio_taps().shape[1] == 156
        block = 49152
        x = (rng.standard_normal(2 * block).astype(np.float32)).view(np.complex64)
        rx_direct = CompiledReceiver(plan, block, ossfft_min_taps=None)
        rx_oss = CompiledReceiver(plan, block, ossfft_min_taps=128)
        assert "g0/b0/audio_oss" in rx_oss._consts
        s1, s2 = rx_direct.init_state(), rx_oss.init_state()
        for _ in range(2):
            c = jnp.asarray(x)
            s1, o1 = rx_direct.step_iq(s1, c)
            s2, o2 = rx_oss.step_iq(s2, c)
            o1 = rx_direct.split_audio(o1)
            o2 = rx_oss.split_audio(o2)
            d = np.abs(
                np.asarray(o1["audio/VFO01"]).astype(np.int32)
                - np.asarray(o2["audio/VFO01"]).astype(np.int32)
            )
            assert d.max() <= 1
