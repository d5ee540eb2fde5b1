"""End-to-end audio at the non-power-of-two rates (BASELINE config 4):
1.92 Msps with /5 late decimation and 288 ksps with /6, vs the float64
reference-chain model."""

import jax.numpy as jnp
import numpy as np
import pytest

import refchain
from sdrreceiver_tpu.graph import build_plan, compile_plan, parse_ini_text
from sdrreceiver_tpu.io import iqfile
from test_receiver_e2e import snr_db

INI_192 = """
sample_rate=1920000
center_frequency=1545939000
zmq_address=tcp://*:6003
correct_dc_bias=1
[main_vfos]
size=1
1\\frequency=1545120000
1\\out_rate=240000
[vfos]
size=2
1\\frequency=1545014429
1\\gain=4
1\\data_rate=600
1\\topic=VFO41
2\\frequency=1545100000
2\\gain=4
2\\data_rate=10500
2\\topic=VFO51
"""

INI_288 = """
sample_rate=288000
center_frequency=1546100000
zmq_address=tcp://*:6004
[main_vfos]
size=1
1\\frequency=1546100000
1\\out_rate=288000
[vfos]
size=1
1\\frequency=1546045422
1\\gain=4
1\\data_rate=10500
1\\topic=VFO51
"""


class Test192M:
    """1.92M -> 240k main (3 stages) -> /5 chains (mainwindow.cpp:196-203)."""

    @pytest.fixture(scope="class")
    def setup(self):
        plan = build_plan(parse_ini_text(INI_192))
        # schedule sanity: 600bps -> 12k via 2 stages + /5; 10500 -> 48k via /5
        scheds = {
            (b.stages, b.late_factor, b.out_rate) for g in plan.groups for b in g.buckets
        }
        assert scheds == {(2, 5, 12000), (0, 5, 48000)}
        block = 7680 * 20  # divisor 3840 divides; ~0.08 s per block
        rx = compile_plan(plan, block)
        iq = iqfile.synthesize_channels(
            4 * block,
            1920000,
            1545939000,
            [(1545014429, 800.0, 0.4), (1545100000, 1900.0, 0.3)],
            noise=0.02,
            dc_offset=1 + 2j,
            seed=3,
        )
        state = rx.init_state()
        outs = []
        for i in range(0, len(iq), block):
            state, o = rx.step_iq(state, jnp.asarray(iq[i : i + block]))
            outs.append({k: np.asarray(v) for k, v in rx.split_audio(o).items()})
        cat = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
        return plan, iq, cat

    def test_low_rate_channel_snr(self, setup):
        plan, iq, outputs = setup
        audio_ref, pcm_ref = refchain.channel_chain(
            iq.astype(np.complex128),
            1920000,
            main_mixer=1545939000 - 1545120000,
            main_stages=3,
            sub_mixer=1545120000 - 1545014429,
            sub_stages=2,
            late_factor=5,
            out_rate=12000,
            gain=0.04,
        )
        got = outputs["audio/VFO41"].astype(np.float64)
        want_round = np.clip(np.round(audio_ref * 0.04 * 32768.0), -32768, 32767)
        assert snr_db(got[500:], want_round[500:]) >= 75.0

    def test_high_rate_channel_snr(self, setup):
        plan, iq, outputs = setup
        audio_ref, pcm_ref = refchain.channel_chain(
            iq.astype(np.complex128),
            1920000,
            main_mixer=1545939000 - 1545120000,
            main_stages=3,
            sub_mixer=1545120000 - 1545100000,
            sub_stages=0,
            late_factor=5,
            out_rate=48000,
            gain=0.04,
        )
        got = outputs["audio/VFO51"].astype(np.float64)
        want_round = np.clip(np.round(audio_ref * 0.04 * 32768.0), -32768, 32767)
        assert snr_db(got[500:], want_round[500:]) >= 75.0

    def test_tones(self, setup):
        _, _, outputs = setup
        for key, rate, tone in [
            ("audio/VFO41", 12000, 800.0),
            ("audio/VFO51", 48000, 1900.0),
        ]:
            a = outputs[key][600:].astype(np.float64)
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
            peak = np.fft.rfftfreq(len(a), 1.0 / rate)[np.argmax(spec)]
            assert abs(peak - tone) < 20.0, (key, peak)


class Test288K:
    """288k: zero half-band stages, pure /6 late chain (mainwindow.cpp:204-210)."""

    def test_div6_channel_snr(self):
        plan = build_plan(parse_ini_text(INI_288))
        (b,) = plan.groups[0].buckets
        assert (b.stages, b.late_factor, b.out_rate) == (0, 6, 48000)
        block = 57600
        rx = compile_plan(plan, block)
        iq = iqfile.synthesize_channels(
            4 * block,
            288000,
            1546100000,
            [(1546045422, 1500.0, 0.5)],
            noise=0.02,
            seed=4,
        )
        state = rx.init_state()
        got_parts = []
        for i in range(0, len(iq), block):
            state, o = rx.step_iq(state, jnp.asarray(iq[i : i + block]))
            got_parts.append(np.asarray(rx.split_audio(o)["audio/VFO51"]))
        got = np.concatenate(got_parts).astype(np.float64)

        audio_ref, _ = refchain.channel_chain(
            iq.astype(np.complex128),
            288000,
            main_mixer=0,
            main_stages=0,
            sub_mixer=1546100000 - 1546045422,
            sub_stages=0,
            late_factor=6,
            out_rate=48000,
            gain=0.04,
            dc=False,
        )
        want_round = np.clip(np.round(audio_ref * 0.04 * 32768.0), -32768, 32767)
        assert snr_db(got[500:], want_round[500:]) >= 75.0
        a = got[600:]
        spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
        peak = np.fft.rfftfreq(len(a), 1.0 / 48000)[np.argmax(spec)]
        assert abs(peak - 1500.0) < 20.0
