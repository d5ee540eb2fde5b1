"""Golden parity vs the COMPILED REFERENCE (VERDICT r1 item 3).

tests/oracle_build.py compiles the reference's own DSP sources
(/root/reference/{gnuradio/firfilter.cpp, jonti/dsp.cpp,
halfbanddecimator.cpp, oscillator.cpp}) into a test-only .so; every
comparison here is framework output vs that compiled code — not vs a
hand-written model (tests/refchain.py is hereby demoted to a convenience
model; this file is the oracle).

Findings encoded as assertions:
  * firfilter::low_pass == kernels.design.low_pass BIT-FOR-BIT.
  * FIRHilbert taps: the reference's normalization divides by a float32
    running sum and scales by a config-dependent Fs before rounding, so its
    own taps vary by +-1 ulp across configs; ours match within 1 ulp of any
    instantiation.
  * HalfBandDecimator streaming == kernels.halfband cascade to float
    round-off, state carried across blocks.
  * The reference Oscillator's amplitude renorm `1.95 - |v|^2`
    (oscillator.cpp:26-27) has fixed point sqrt(0.95) ~= 0.97468: the
    reference mixes at ~0.9747 amplitude (converging through a ~300-sample
    0.955..0.995 transient) and its float32 wavetable wanders up to ~0.13 rad
    of phase over its 1 s period.  Our integer-phase NCO is exact; audio
    therefore differs from the reference by a ~0.95 gain and its NCO noise,
    which is why chain parity is asserted (a) bit-tight with mixers at 0 Hz
    and (b) as better-fidelity-than-the-reference with live mixers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from oracle_build import Oracle
from sdrreceiver_tpu.graph import build_plan, parse_ini_text
from sdrreceiver_tpu.graph.compiler import CompiledReceiver
from sdrreceiver_tpu.kernels import (
    dc,
    design,
    fir,
    halfband,
    nco,
    polyphase,
    usbdemod,
)


@pytest.fixture(scope="module")
def oracle():
    return Oracle()


class TestDesigners:
    LOWPASS_CASES = [
        # (gain, fs, cutoff, transition) — every shape the app designs:
        (2.0, 12000.0, 4000.0, 1000.0),     # audio LPF, data_rate 600 + bw 4k
        (2.0, 48000.0, 3000.0, 750.0),      # narrow audio LPF at 48k
        (2.0, 240000.0, 24000.0, 12000.0),  # late /5 decimator (vfo.cpp:82-87)
        (2.0, 288000.0, 24000.0, 9600.0),   # late /6 decimator
        (2.0, 12000.0, 800.0, 200.0),       # long (145-tap) audio bank
        (1.0, 1536000.0, 100000.0, 25000.0),
    ]

    @pytest.mark.parametrize("case", LOWPASS_CASES)
    def test_low_pass_bit_exact(self, oracle, case):
        ref = oracle.low_pass(*case)
        ours = design.low_pass(*case, design.Window.HAMMING)
        assert len(ref) == len(ours)
        np.testing.assert_array_equal(ref, ours)

    def test_low_pass_sanity_checks_match(self, oracle):
        with pytest.raises(ValueError):
            oracle.low_pass(1.0, 48000.0, 30000.0, 1000.0)  # fc > fs/2
        with pytest.raises(ValueError):
            design.low_pass(1.0, 48000.0, 30000.0, 1000.0)

    @pytest.mark.parametrize("fs", [48000, 12000, 3000, 24000])
    def test_hilbert_within_1ulp_of_any_reference_instantiation(
        self, oracle, fs
    ):
        """vfo.cpp:137 passes samplesOut (buffer-length dependent!) as the
        FIRHilbert Fs; the Fs scales the taps before float32 rounding and
        cancels in the normalization only up to 1 ulp.  So the reference's
        own taps are config-dependent at the last bit; ours are the
        canonical (Fs-free) value, within 1 ulp of every instantiation."""
        ref = oracle.hilbert_taps(125, fs)
        ours = design.hilbert()
        ulp = np.spacing(np.abs(ref).max().astype(np.float32))
        assert np.abs(ref - ours).max() <= ulp

    def test_hilbert_center_and_symmetry(self, oracle):
        ref = oracle.hilbert_taps(125, 48000)
        assert ref[62] == 0.0
        np.testing.assert_array_equal(ref, -ref[::-1])


class TestHalfBand:
    def test_streaming_decimator_matches_cascade_stage(self, oracle, rng):
        """Our CHUNKED cascade stage vs the reference decimator fed the WHOLE
        signal (one call, so the reference's stale-carry quirk — see
        test_reference_carry_is_one_sample_stale — cannot contaminate the
        comparison; our chunked==whole invariant is proven separately)."""
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(
            np.complex64
        )
        ref = oracle.halfband_stream([x])

        rt = halfband.cascade_taps(1)
        hists = halfband.cascade_init(1, 1)
        outs = []
        for b in (x[:1024], x[1024:2048], x[2048:]):
            hists, y = halfband.cascade_apply(hists, jnp.asarray(b[None, :]), rt)
            outs.append(np.asarray(y[0]))
        ours = np.concatenate(outs)
        assert ref.shape == ours.shape
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=0)

    def test_reference_carry_is_one_sample_stale(self, oracle, rng):
        """Documented reference BUG, pinned: FIRQueueBackToFront copies
        queue[ptr-1-N, ptr-1) — one sample short of the true tail
        (jonti/dsp.cpp:163-173) — so the reference's OWN chunked output
        glitches at every buffer boundary, while this framework's carry is
        exact (chunked == whole, bit for bit).  This is the divergence the
        builder-authored model could never have exposed."""
        x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(
            np.complex64
        )
        ref_whole = oracle.halfband_stream([x])
        ref_chunk = oracle.halfband_stream([x[:64], x[64:]])
        # the reference diverges from itself right at the boundary (out 32)
        d = np.abs(ref_whole - ref_chunk)
        assert d[:32].max() < 1e-6
        assert d[32:38].max() > 1e-2

        rt = halfband.cascade_taps(1)
        _, ours_whole = halfband.cascade_apply(
            halfband.cascade_init(1, 1), jnp.asarray(x[None, :]), rt
        )
        hists = halfband.cascade_init(1, 1)
        parts = []
        for b in (x[:64], x[64:]):
            hists, y = halfband.cascade_apply(hists, jnp.asarray(b[None, :]), rt)
            parts.append(np.asarray(y[0]))
        np.testing.assert_array_equal(
            np.concatenate(parts), np.asarray(ours_whole[0])
        )

    def test_two_stage_chain(self, oracle, rng):
        """Two chained reference decimators == our 2-stage cascade."""
        x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)).astype(
            np.complex64
        )
        mid = oracle.halfband_stream([x])
        ref = oracle.halfband_stream([mid])  # whole-signal calls: no carry

        rt = halfband.cascade_taps(1)
        hists = halfband.cascade_init(1, 2)
        _, y = halfband.cascade_apply(hists, jnp.asarray(x[None, :]), rt)
        np.testing.assert_allclose(np.asarray(y[0]), ref, atol=4e-6, rtol=0)


class TestOscillator:
    def test_reference_amplitude_fixed_point(self, oracle):
        z = oracle.oscillator(48000, 1000.0, 48000)
        mag = np.abs(z)
        # transient ringing 0.955..0.995, converged to sqrt(0.95) after ~300
        assert abs(mag[:300].min() - 0.955) < 2e-3
        assert abs(mag[:300].max() - 0.995) < 2e-3
        np.testing.assert_allclose(mag[1000:], np.sqrt(0.95), atol=1e-4)

    def test_our_nco_is_closer_to_ideal_than_reference(self, oracle):
        fs, f, n = 48000, 1234.0, 48000
        ideal = np.exp(2j * np.pi * f * np.arange(1, n + 1) / fs)
        ref = oracle.oscillator(fs, f, n)
        st = nco.nco_init([-f], fs)  # our convention mixes by e^{-j2pi f n/fs}
        _, ours = nco.mix_block(st, jnp.ones(n, jnp.complex64), fs)
        ours = np.asarray(ours[0]).conj()  # phase 0 at n=0; ref starts at 1 step
        # align phasing: our NCO starts at phase 0, reference at one rotation
        ideal0 = np.exp(2j * np.pi * f * np.arange(n) / fs)
        err_ours = np.abs(ours - ideal0).max()
        err_ref = np.abs(ref - ideal).max()
        assert err_ours < 2e-5
        assert err_ref > 1e-2  # amplitude alone puts it ~0.025 off
        assert err_ours < err_ref / 100


def _run_ours(plan, iq, block, **kw):
    rx = CompiledReceiver(plan, block, **kw)
    state = rx.init_state()
    outs = []
    for i in range(0, len(iq), block):
        state, o = rx.step_iq(state, jnp.asarray(iq[i : i + block]))
        outs.append({k: np.asarray(v) for k, v in rx.split_audio(o).items()})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def _snr_db(sig, err):
    p = float(np.mean(np.abs(sig) ** 2))
    e = float(np.mean(np.abs(err) ** 2)) + 1e-30
    return 10.0 * np.log10(p / e)


class TestChainOracle:
    """Full single-channel chain vs the reference chain composed from the
    reference's own compiled objects (vfo.cpp composition, see
    oracle_wrapper.cpp)."""

    def test_zero_mixer_chain_parity(self, oracle, rng):
        """With both mixers at 0 Hz the only reference-vs-framework
        difference is the reference oscillator's sqrt(0.95) amplitude (and
        its ~300-sample transient): gain-compensated, the chains must agree
        to quantizer resolution — this pins every FILTER stage (cascades,
        Hilbert, delay, audio LPF) and the demod structure end to end
        against the compiled reference."""
        fs, block = 1536000, 96000
        main_stages, sub_stages = 2, 5  # 1.536M -> 384k -> 12k
        t = np.arange(4 * block)
        x = (
            0.3 * np.exp(2j * np.pi * 1000 * t / fs)  # 1 kHz in-band USB tone
            + 0.02 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
        ).astype(np.complex64)

        # measure the oracle oscillators' converged amplitude (float fixed
        # point of v *= 1.95-|v|^2), one factor per mixer stage
        a_main = float(np.abs(oracle.oscillator(fs, 0.0, 4000))[-1])
        a_sub = float(np.abs(oracle.oscillator(fs / 2**main_stages, 0.0, 4000))[-1])

        gain = 0.4
        # oracle gets the WHOLE signal in one call (its streaming carry is
        # one sample stale, see TestHalfBand); ours runs chunked as deployed
        ref = oracle.chain(
            [x], fs,
            main_mixer_freq=0.0, main_stages=main_stages,
            sub_mixer_freq=0.0, sub_stages=sub_stages,
            filter_bw=4000.0, gain=gain,
        )

        # our chain from the same shared kernels the compiler uses, with the
        # reference's amplitude factors folded into the gain
        hb = fir.prepare_taps(design.half_band(11), 1)
        hilb = fir.prepare_taps(design.hilbert(), 1)
        # leading zero tap = the plain FIR's extra one-sample delay
        # (jonti/dsp.cpp:59-71), exactly as plan.audio_taps() builds it
        at = fir.prepare_taps(
            np.concatenate([
                [np.float32(0.0)],
                design.low_pass(2.0, 12000.0, 4000.0, 1000.0, design.Window.HAMMING),
            ]), 1
        )
        ch = halfband.cascade_init(1, main_stages)
        cs = halfband.cascade_init(1, sub_stages)
        us = usbdemod.usb_init(1)
        ah = jnp.zeros((1, at.shape[1] - 1), jnp.float32)
        g = jnp.asarray([gain * a_main * a_sub], jnp.float32)
        outs = []
        for i in range(0, len(x), block):
            b = x[i : i + block]
            ch, y = halfband.cascade_apply(ch, jnp.asarray(b[None, :]), hb)
            cs, y = halfband.cascade_apply(cs, y, hb)
            us, audio = usbdemod.usb_block(us, y, hilb)
            ah, audio = fir.conv_block(ah, audio, at)
            outs.append(np.asarray(usbdemod.quantize_i16(audio, g)[0]))
        ours = np.concatenate(outs)
        assert ours.shape == ref.shape

        # skip the oscillator transient (~300 samples at fs -> ~1 at audio
        # rate... but FIR warmups dominate; skip the first 2000 audio samples)
        r, o = ref[2000:].astype(np.float64), ours[2000:].astype(np.float64)
        # reference casts float->short (truncation toward zero); ours rounds:
        # up to 1 LSB apart, plus sub-LSB float noise
        d = np.abs(r - o)
        assert d.max() <= 2.0
        assert _snr_db(r, r - o) > 60.0

    def test_live_tone_fidelity_beats_reference(self, oracle, rng):
        """sdr_25E-shaped single channel with REAL mixer frequencies: both
        receivers demodulate the same synthetic USB channel.  Three pinned
        facts:
          1. in-band tone quality is IDENTICAL (both noise-limited),
          2. our audio tracks the float64 ideal chain at >60 dB,
          3. the reference's own audio decoheres from that ideal (<10 dB):
             its float32 wavetable NCO (oscillator.cpp:15-30) accumulates
             phase error over each 1 s table period, a slow frequency
             wobble.  This is WHY sample-wise agreement with the reference
             is only meaningful with the mixers neutralized (previous test);
             against the live reference the framework can only be BETTER,
             not bit-equal."""
        import refchain

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
1\\gain=50
1\\data_rate=600
1\\topic=VFO01
"""
        plan = build_plan(parse_ini_text(ini))
        g = plan.groups[0]
        b = g.buckets[0]
        gain = float(b.gains()[0])  # ini gain/100 (mainwindow.cpp:219)
        assert gain == 0.5
        fs, block = plan.fs, 1536000 // 4
        tone = 1000.0
        rf_offset = 1545005146 - 1545600000  # channel freq rel. center
        t = np.arange(2 * block)
        x = (
            0.4 * np.exp(2j * np.pi * (rf_offset + tone) * t / fs)
            + 0.01 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
        ).astype(np.complex64)

        ref = oracle.chain(
            [x], fs,
            main_mixer_freq=g.mixer_freq, main_stages=g.stages,
            sub_mixer_freq=b.mixer_freqs()[0], sub_stages=b.stages,
            filter_bw=0.0, gain=gain,
        )
        ours = _run_ours(plan, x, block)["audio/VFO01"]
        assert ours.shape == ref.shape
        _, ideal = refchain.channel_chain(
            x.astype(np.complex128), fs, g.mixer_freq, g.stages,
            b.mixer_freqs()[0], b.stages, 1, b.out_rate, 0, gain, dc=False,
        )

        audio_fs = b.out_rate

        def band_snr(a, f0=tone, bw=10.0):
            a = a[2000:].astype(np.float64)
            w = np.hanning(len(a))
            spec = np.abs(np.fft.rfft(a * w)) ** 2
            f = np.fft.rfftfreq(len(a), 1.0 / audio_fs)
            inb = np.abs(f - f0) <= bw
            return 10.0 * np.log10(spec[inb].sum() / spec[~inb].sum())

        def peak_hz(a):
            a = a[2000:].astype(np.float64)
            spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
            return np.fft.rfftfreq(len(a), 1.0 / audio_fs)[np.argmax(spec)]

        # 1. both put the tone at 1 kHz with the same (noise-limited) quality
        assert abs(peak_hz(ref) - tone) <= 2.0
        assert abs(peak_hz(ours) - tone) <= 2.0
        snr_ref, snr_ours = band_snr(ref), band_snr(ours)
        assert snr_ref > 35.0
        assert snr_ours >= snr_ref - 0.5

        # 2./3. vs the float64 ideal chain: ours tracks it, the reference's
        # NCO wander decoheres it (measured: ~82 dB vs ~-5 dB)
        idl = ideal[2000:].astype(np.float64)
        snr_ideal_ours = _snr_db(idl, idl - ours[2000:].astype(np.float64))
        snr_ideal_ref = _snr_db(idl, idl - ref[2000:].astype(np.float64))
        assert snr_ideal_ours > 60.0
        assert snr_ideal_ref < 10.0


class TestChainOracleAltRates:
    """The ÷5/÷6 late chain and the DC EMA vs the COMPILED reference
    (VERDICT r2 item 4): usb_decimdemod's `check`-phase streaming carry
    (vfo.cpp:351-383) and the plain-FIR one-extra-sample delay of
    fir_decI/Q and fir_usb (jonti/dsp.cpp:59-71, the leading zero tap in
    BucketPlan.late_taps/audio_taps) are pinned here by reference code —
    not by the builder's refchain.py model.  Mixers at 0 Hz with the
    oracle oscillators' sqrt(0.95) amplitude folded into the gain (see
    TestChainOracle.test_zero_mixer_chain_parity for why live mixers
    cannot be compared sample-wise)."""

    def _ours_chain(
        self,
        x,
        block,
        main_stages,
        sub_stages,
        late,
        out_rate,
        filter_bw,
        gain,
        dc_correct=False,
    ):
        """The framework's bucket pipeline from the same shared kernels the
        compiler composes (graph/compiler.py:_bucket_step), chunked as
        deployed; oracle runs whole-signal (its carry is 1 sample stale)."""
        hb = fir.prepare_taps(design.half_band(11), 1)
        hilb = fir.prepare_taps(design.hilbert(), 1)
        ch = halfband.cascade_init(1, main_stages)
        cs = halfband.cascade_init(1, sub_stages)
        us = usbdemod.usb_init(1)
        lt = ah = None
        lh = ahh = None
        if late > 1:
            # leading zero tap = plain FIR extra delay, as late_taps() builds
            lt = fir.prepare_taps(
                np.concatenate(
                    [[np.float32(0.0)], polyphase.late_decim_taps(out_rate, late)]
                ),
                1,
            )
            lh = jnp.zeros((1, lt.shape[1] - 1), jnp.complex64)
        if filter_bw > 0:
            at = design.low_pass(
                2.0, float(out_rate), float(filter_bw), filter_bw / 4.0,
                design.Window.HAMMING,
            )
            ah = fir.prepare_taps(np.concatenate([[np.float32(0.0)], at]), 1)
            ahh = jnp.zeros((1, ah.shape[1] - 1), jnp.float32)
        dcm = dc.dc_init()
        g = jnp.asarray([gain], jnp.float32)
        outs = []
        for i in range(0, len(x), block):
            b = jnp.asarray(x[i : i + block])
            if dc_correct:
                dcm, b = dc.dc_block(dcm, b)
            chh, y = halfband.cascade_apply(ch, b[None, :], hb)
            ch = chh
            cs, y = halfband.cascade_apply(cs, y, hb)
            if late > 1:
                lh, y = fir.conv_block(lh, y, lt, late)
            us, audio = usbdemod.usb_block(us, y, hilb)
            if filter_bw > 0:
                ahh, audio = fir.conv_block(ahh, audio, ah)
            outs.append(np.asarray(usbdemod.quantize_i16(audio, g)[0]))
        return np.concatenate(outs)

    def test_late5_chain_parity(self, oracle, rng):
        """1.92M-class /5 chain: 3 main stages -> 240k, 2 sub stages -> 60k,
        /5 -> 12k audio with a 4 kHz LPF — the usb_decimdemod path
        (vfo.cpp:334-387) including its phase-skipping FIRUpdate carries."""
        fs, block = 1920000, 96000
        t = np.arange(8 * block)
        x = (
            0.3 * np.exp(2j * np.pi * 1000 * t / fs)
            + 0.02 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
        ).astype(np.complex64)
        a_main = float(np.abs(oracle.oscillator(fs, 0.0, 4000))[-1])
        a_sub = float(np.abs(oracle.oscillator(fs / 8, 0.0, 4000))[-1])
        gain = 0.4
        ref = oracle.chain(
            [x], fs,
            main_mixer_freq=0.0, main_stages=3,
            sub_mixer_freq=0.0, sub_stages=2,
            late_factor=5, filter_bw=4000.0, gain=gain,
        )
        ours = self._ours_chain(
            x, block, 3, 2, 5, 12000, 4000.0, gain * a_main * a_sub
        )
        assert ours.shape == ref.shape
        r, o = ref[600:].astype(np.float64), ours[600:].astype(np.float64)
        d = np.abs(r - o)
        assert d.max() <= 2.0  # truncating vs rounding quantizer: <=1 LSB + noise
        assert _snr_db(r, r - o) > 60.0

    def test_reference_wavetable_replays_transient_each_second(self, oracle):
        """Pinned reference artifact: the Oscillator wavetable is ONE second
        long and its construction loop bakes the 1.0 -> sqrt(0.95) amplitude
        convergence transient into entries 0..~300 (oscillator.cpp:13-27), so
        every time tick() wraps (oscillator.cpp:42-46) the amplitude ringing
        REPLAYS into the mix — a once-per-second glitch in every reference
        channel.  (Our NCO has no table and no transient.)  This is why the
        /6 chain-parity test below keeps its input under one second."""
        fs = 288000
        z = oracle.oscillator(fs, 0.0, 2 * fs)
        mag = np.abs(z)
        np.testing.assert_allclose(mag[1000:fs], np.sqrt(0.95), atol=1e-4)
        assert mag[fs : fs + 300].max() > 0.99  # the replayed transient
        assert mag[fs : fs + 300].min() < 0.9505

    def test_late6_chain_parity(self, oracle, rng):
        """288k-class /6 chain: zero half-band stages, pure /6 polyphase
        (mainwindow.cpp:204-210), no audio LPF — isolates the late FIR's
        check-phase carry and its one-sample delay.  Input kept under 1 s:
        past that the reference's wavetable wrap replays its amplitude
        transient (test above) and sample-wise comparison breaks down."""
        fs, block = 288000, 57600
        t = np.arange(4 * block)
        x = (
            0.3 * np.exp(2j * np.pi * 1500 * t / fs)
            + 0.02 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
        ).astype(np.complex64)
        a_main = float(np.abs(oracle.oscillator(fs, 0.0, 4000))[-1])
        a_sub = float(np.abs(oracle.oscillator(fs, 0.0, 4000))[-1])
        gain = 0.4
        ref = oracle.chain(
            [x], fs,
            main_mixer_freq=0.0, main_stages=0,
            sub_mixer_freq=0.0, sub_stages=0,
            late_factor=6, filter_bw=0.0, gain=gain,
        )
        ours = self._ours_chain(x, block, 0, 0, 6, 48000, 0.0, gain * a_main * a_sub)
        assert ours.shape == ref.shape
        r, o = ref[600:].astype(np.float64), ours[600:].astype(np.float64)
        d = np.abs(r - o)
        assert d.max() <= 2.0
        assert _snr_db(r, r - o) > 60.0

    def test_dc_ema_parity(self, oracle, rng):
        """The sdrj DC EMA (sdrj.cpp:277-283) vs our closed-form cumsum
        evaluation (kernels/dc.py): same recurrence, chunked, with a real
        DC offset riding on the signal."""
        fs, block = 1536000, 96000
        t = np.arange(8 * block)
        x = (
            (0.12 - 0.07j)  # DC bias the EMA must learn and remove
            + 0.3 * np.exp(2j * np.pi * 1000 * t / fs)
            + 0.02 * (rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
        ).astype(np.complex64)
        a_main = float(np.abs(oracle.oscillator(fs, 0.0, 4000))[-1])
        a_sub = float(np.abs(oracle.oscillator(fs / 4, 0.0, 4000))[-1])
        gain = 0.4
        ref = oracle.chain(
            [x], fs,
            main_mixer_freq=0.0, main_stages=2,
            sub_mixer_freq=0.0, sub_stages=5,
            late_factor=1, filter_bw=4000.0, gain=gain, dc_correct=True,
        )
        ours = self._ours_chain(
            x, block, 2, 5, 1, 12000, 4000.0, gain * a_main * a_sub,
            dc_correct=True,
        )
        assert ours.shape == ref.shape
        r, o = ref[600:].astype(np.float64), ours[600:].astype(np.float64)
        d = np.abs(r - o)
        # The reference's float32 EMA amplifies its per-step rounding by
        # 1/alpha = 1e6 (error recursion e' = a*e + rho with rho ~ eps*|DC|
        # gives steady state rho/(1-a) up to ~7e-3 of the bias), so 1-LSB
        # agreement with the compiled f32 recurrence is unattainable by the
        # reference's own arithmetic; the bound below still pins alpha, the
        # correct/subtract ordering and the streaming carry (measured:
        # max ~10 LSB, 69 dB).
        assert d.max() <= 16.0
        assert _snr_db(r, r - o) > 60.0
