"""Config parsing + plan compilation against the reference's shipped inis."""

import numpy as np
import pytest

from sdrreceiver_tpu.graph import config as cfgmod
from sdrreceiver_tpu.graph import plan as planmod

REF_INI = "/root/reference/sample_ini"


class TestConfig:
    def test_sdr_25e(self):
        cfg = cfgmod.load_ini(f"{REF_INI}/sdr_25E.ini")
        assert cfg.sample_rate == 1536000
        assert cfg.center_frequency == 1545600000
        assert cfg.zmq_address == "tcp://*:6003"
        assert cfg.tuner_gain == 496
        assert cfg.correct_dc_bias is True
        assert cfg.mix_offset == 0
        assert len(cfg.main_vfos) == 2
        assert cfg.main_vfos[0] == cfgmod.MainVfoConfig(
            frequency=1545116000, out_rate=384000
        )
        assert len(cfg.vfos) == 27
        v1 = cfg.vfos[0]
        assert v1.frequency == 1545005146
        assert v1.gain == 5
        assert v1.data_rate == 600
        assert v1.topic == "VFO01"
        # the famous ``fiter_bandwidth`` typo rows must leave the filter off
        # for VFOs 2-18 while VFO 1 and 19+ have real filter_bandwidth
        assert v1.filter_bandwidth == 4000
        assert cfg.vfos[1].filter_bandwidth == 0
        assert cfg.vfos[18].filter_bandwidth == 10000

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            cfgmod.load_ini("/nonexistent/nope.ini")

    def test_validation(self):
        with pytest.raises(ValueError, match="sample_rate"):
            cfgmod.parse_ini_text("center_frequency=1\n").validate()
        with pytest.raises(ValueError, match="unsupported"):
            cfgmod.parse_ini_text("sample_rate=1000000\n").validate()

    def test_tuner_gain_default_only_overridden_when_positive(self):
        assert cfgmod.parse_ini_text("tuner_gain=0\n").tuner_gain == 496
        assert cfgmod.parse_ini_text("tuner_gain=280\n").tuner_gain == 280
        assert cfgmod.parse_ini_text("").tuner_gain == 496


class TestPlan25E:
    @pytest.fixture(scope="class")
    def plan(self):
        return planmod.build_plan(cfgmod.load_ini(f"{REF_INI}/sdr_25E.ini"))

    def test_buffers(self, plan):
        # 2*1536000/4 = 768000 bytes, multiple of 512 -> split 4
        assert plan.bufsplit == 4
        assert plan.block_samples == 384000
        assert plan.buflen_bytes == 768000

    def test_groups(self, plan):
        assert len(plan.groups) == 2
        g0, g1 = plan.groups
        assert (g0.mixer_freq, g0.out_rate, g0.stages) == (484000, 384000, 2)
        assert (g1.mixer_freq, g1.out_rate, g1.stages) == (-496000, 192000, 3)
        assert not g0.publishes_iq

    def test_buckets(self, plan):
        g0, g1 = plan.groups
        b0 = {(b.stages, b.late_factor, b.out_rate): b.channels for b in g0.buckets}
        assert b0 == {(5, 1, 12000): 11, (4, 1, 24000): 1}
        b1 = {(b.stages, b.late_factor, b.out_rate): b.channels for b in g1.buckets}
        assert b1 == {(2, 1, 48000): 15}

    def test_sub_mixers(self, plan):
        g0 = plan.groups[0]
        bucket600 = next(b for b in g0.buckets if b.out_rate == 12000)
        v1 = next(s for s in bucket600.subs if s.topic == "VFO01")
        # mixer = main_freq - sub_freq = 1545116000 - 1545005146
        assert v1.mixer_freq == 110854
        assert v1.gain == pytest.approx(0.05)
        assert v1.filter_bandwidth == 4000

    def test_block_divisor(self, plan):
        assert plan.block_divisor() == 128
        assert plan.num_channels() == 27
        assert len(plan.all_topics()) == 27
        assert plan.all_topics()[0] == "VFO01"

    def test_audio_bank_padding(self, plan):
        g0 = plan.groups[0]
        bucket600 = next(b for b in g0.buckets if b.out_rate == 12000)
        bank = bucket600.audio_taps()
        # VFO01 has a 4 kHz filter at 12 kHz -> 29 taps + the leading zero
        # modeling the reference FIR's extra one-sample delay
        # (jonti/dsp.cpp:59-71, pinned in tests/test_oracle.py); deltas stay
        # bare (the reference skips fir_usb for them -> no delay)
        assert bank.shape == (11, 30)
        filt = [i for i, s in enumerate(bucket600.subs) if s.filter_bandwidth > 0]
        for i in filt:
            assert bank[i, 0] == 0.0 and bank[i, 1] != 0.0
        deltas = [i for i, s in enumerate(bucket600.subs) if s.filter_bandwidth == 0]
        for i in deltas:
            assert bank[i, 0] == 1.0 and np.all(bank[i, 1:] == 0)


class TestPlanOtherRates:
    def test_54w_all_1920k(self):
        plan = planmod.build_plan(cfgmod.load_ini(f"{REF_INI}/sdr_54W_all.ini"))
        # 2*1920000/4 = 960000, multiple of 512 -> split 4
        assert plan.bufsplit == 4
        assert plan.block_samples == 480000
        g0 = plan.groups[0]
        assert (g0.out_rate, g0.stages) == (240000, 3)
        # 600 bps channels: /5 late chain, stages log2(240000/60000) = 2
        scheds = {(b.stages, b.late_factor, b.out_rate) for g in plan.groups for b in g.buckets}
        assert (2, 5, 12000) in scheds
        # 10500 channels: out 48000, stages log2(240000/240000) = 0, late 5
        assert (0, 5, 48000) in scheds
        for g in plan.groups:
            for b in g.buckets:
                if b.late_factor == 5:
                    # 49 designed taps + leading zero (reference FIR's extra delay,
                    # jonti/dsp.cpp:59-71)
                    assert len(b.late_taps()) == 50
                    assert b.late_taps()[0] == 0.0

    def test_288k(self):
        plan = planmod.build_plan(cfgmod.load_ini(f"{REF_INI}/sdr_54W_288K.ini"))
        # 2*288000/4 = 144000 not multiple of 512 -> split 5, 57600 samples
        assert plan.bufsplit == 5
        assert plan.block_samples == 57600
        g0 = plan.groups[0]
        assert (g0.out_rate, g0.stages) == (288000, 0)
        (b,) = g0.buckets
        # 288000/48000 = 6 -> /6 late, 0 halfband stages
        assert (b.stages, b.late_factor, b.out_rate) == (0, 6, 48000)
        # 73 designed taps + leading zero (reference FIR's extra delay)
        assert len(b.late_taps()) == 74
        assert b.late_taps()[0] == 0.0
        assert plan.block_samples % plan.block_divisor() == 0

    def test_cband(self):
        plan = planmod.build_plan(cfgmod.load_ini(f"{REF_INI}/CBAND_143E.ini"))
        assert len(plan.groups) == 3
        assert plan.num_channels() == 17
        # all explicit out_rate=48000
        for g in plan.groups:
            for b in g.buckets:
                assert b.out_rate == 48000

    def test_unmatched_sub_gets_direct_group(self):
        txt = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
[vfos]
size=1
1\\frequency=1545000000
1\\gain=5
1\\out_rate=48000
1\\topic=VFO99
"""
        plan = planmod.build_plan(cfgmod.parse_ini_text(txt))
        (g,) = plan.groups
        assert g.direct and g.out_rate == 1536000 and g.stages == 0
        (b,) = g.buckets
        assert b.stages == 5  # log2(1536000/48000)
        assert b.subs[0].mixer_freq == 600000

    def test_mix_offset_applied(self):
        txt = """
sample_rate=1536000
center_frequency=1545600000
mix_offset=-1000
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
        plan = planmod.build_plan(cfgmod.parse_ini_text(txt))
        s = plan.groups[0].buckets[0].subs[0]
        assert s.frequency == 1545005146 - 1000
        assert s.mixer_freq == 110854 + 1000

    def test_inconsistent_rates_rejected(self):
        txt = """
sample_rate=1536000
center_frequency=1545600000
[vfos]
size=1
1\\frequency=1545000000
1\\out_rate=50000
1\\topic=BAD01
"""
        with pytest.raises(ValueError, match="not (an integer|a power of two)"):
            planmod.build_plan(cfgmod.parse_ini_text(txt))

    def test_sub_without_rate_rejected(self):
        txt = """
sample_rate=1536000
center_frequency=1545600000
[vfos]
size=1
1\\frequency=1545000000
1\\topic=BAD02
"""
        with pytest.raises(ValueError, match="neither out_rate nor data_rate"):
            planmod.build_plan(cfgmod.parse_ini_text(txt))


class TestStrictReference:
    """Unmatched-sub handling: default = direct-from-input group with a
    warning; strict_reference = the reference's misprocessing through main
    group 0 (mainwindow.cpp:175-226), pinned structurally here."""

    INI = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
[main_vfos]
size=1
1\\frequency=1545116000
1\\out_rate=384000
[vfos]
size=2
1\\frequency=1545005146
1\\gain=5
1\\data_rate=600
1\\topic=VFO01
2\\frequency=1599000000
2\\gain=5
2\\data_rate=600
2\\topic=ORPHA
"""

    def test_default_plans_direct_group_with_warning(self):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan = planmod.build_plan(cfgmod.parse_ini_text(self.INI))
        assert any("ORPHA" in str(x.message) for x in w)
        assert any("direct-from-input" in str(x.message) for x in w)
        # orphan runs on its own synthetic group at the raw rate
        assert len(plan.groups) == 2
        direct = plan.groups[1]
        assert direct.direct and direct.out_rate == 1536000
        (b,) = direct.buckets
        assert b.subs[0].topic == "ORPHA"
        assert b.stages == 7  # log2(1536000/12000)
        assert b.nco_fs == 0  # group rate IS the raw rate here

    def test_strict_pushes_orphan_into_main0(self):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan = planmod.build_plan(
                cfgmod.parse_ini_text(self.INI), strict_reference=True
            )
        assert any("misprocessing" in str(x.message) for x in w)
        # no synthetic group: the orphan lands in main group 0 like the
        # reference's VFOsub[0].push_back (mainwindow.cpp:225)
        assert len(plan.groups) == 1
        g0 = plan.groups[0]
        orphan_buckets = [
            b for b in g0.buckets if any(s.topic == "ORPHA" for s in b.subs)
        ]
        assert len(orphan_buckets) == 1
        b = orphan_buckets[0]
        # raw-stream parameters: stages = log2(Fs/out), full-rate NCO
        # modulus, mixer = center - freq (main_vfo_freq stays 0)
        assert b.stages == 7
        assert b.nco_fs == 1536000
        assert b.mix_fs(g0.out_rate) == 1536000
        s = b.subs[0]
        assert s.mixer_freq == 1545600000 - 1599000000
        # the matched channel is unaffected
        matched = [
            b for b in g0.buckets if any(s.topic == "VFO01" for s in b.subs)
        ]
        assert matched[0].nco_fs == 0

    def test_strict_plan_compiles_and_runs(self):
        import warnings

        import jax.numpy as jnp
        import numpy as np

        from sdrreceiver_tpu.graph.compiler import CompiledReceiver

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            plan = planmod.build_plan(
                cfgmod.parse_ini_text(self.INI), strict_reference=True
            )
        block = plan.block_divisor() * 4
        rx = CompiledReceiver(plan, block)
        st = rx.init_state()
        _, o = rx.step_iq(st, jnp.zeros(block, jnp.complex64))
        audio = rx.split_audio(o)
        # the orphan emits (Tg0 >> 7) samples, labeled at its out_rate like
        # the reference's outputRate field (vfo.cpp:66-67,432)
        assert audio["audio/ORPHA"].shape == ((block >> 2) >> 7,)
        assert rx.rates()["audio/ORPHA"] == 12000

    def test_strict_without_mains_drops_orphans(self):
        txt = """
sample_rate=1536000
center_frequency=1545600000
[vfos]
size=1
1\\frequency=1545000000
1\\gain=5
1\\data_rate=600
1\\topic=VFO01
"""
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan = planmod.build_plan(
                cfgmod.parse_ini_text(txt), strict_reference=True
            )
        assert any("never process" in str(x.message) for x in w)
        assert plan.num_channels() == 0
