"""NCO / DC / half-band cascade / polyphase / USB demod / compress kernels."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdrreceiver_tpu.core import stream
from sdrreceiver_tpu.kernels import (
    compress,
    dc,
    design,
    fir,
    halfband,
    ingest,
    nco,
    polyphase,
    usbdemod,
)


class TestNCO:
    def test_phasor_exact(self):
        """Block phasor equals e^{j 2 pi f n / fs} with zero drift."""
        fs, f, t_len = 48000, 1234, 4800
        st = nco.nco_init([f], fs)
        _, y = nco.mix_block(st, jnp.ones(t_len, jnp.complex64), fs)
        n = np.arange(t_len)
        expect = np.exp(2j * np.pi * f * n / fs)
        np.testing.assert_allclose(np.asarray(y[0]), expect, atol=2e-6)

    def test_negative_freq(self):
        fs, f, t_len = 48000, -7000, 1000
        st = nco.nco_init([f], fs)
        _, y = nco.mix_block(st, jnp.ones(t_len, jnp.complex64), fs)
        expect = np.exp(2j * np.pi * f * np.arange(t_len) / fs)
        np.testing.assert_allclose(np.asarray(y[0]), expect, atol=2e-6)

    def test_multichannel_fanout(self, rng):
        fs, t_len = 192000, 2048
        freqs = [1000, -2500, 77777]
        x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(np.complex64)
        st = nco.nco_init(freqs, fs)
        _, y = nco.mix_block(st, jnp.asarray(x), fs)
        n = np.arange(t_len)
        for c, f in enumerate(freqs):
            expect = x * np.exp(2j * np.pi * f * n / fs)
            np.testing.assert_allclose(np.asarray(y[c]), expect, atol=2e-5 * np.abs(x).max())

    def test_chunked_equals_whole_long_stream(self):
        """Phase carries exactly across many blocks — zero drift over >1 s of
        signal (the property the reference's 1-second wavetable provides,
        oscillator.cpp:15-30)."""
        fs, f = 1536000, 484000
        t_len = fs + 2304  # just over one second, not a multiple of fs
        st = nco.nco_init([f], fs)
        chunk = 768
        pieces = []
        x = jnp.ones(chunk, jnp.complex64)
        for _ in range(t_len // chunk):
            st, y = nco.mix_block(st, x, fs)
            pieces.append(np.asarray(y[0]))
        got = np.concatenate(pieces)
        n = np.arange(t_len)
        expect = np.exp(2j * np.pi * ((f * n) % fs) / fs)
        np.testing.assert_allclose(got, expect, atol=3e-6)

    def test_non_integer_freq_rejected(self):
        with pytest.raises(ValueError):
            nco.nco_init([10.5], 48000)


class TestDC:
    def _np_ref(self, x, m0=0.0, alpha=1e-6):
        """Per-sample golden model of sdrj.cpp:277-283 (float32)."""
        a = np.float32(1.0 - alpha)
        al = np.float32(alpha)
        m = np.complex64(m0)
        y = np.empty_like(x)
        for i, v in enumerate(x):
            m = m * a + al * v
            y[i] = v - m
        return y, m

    def test_matches_sequential(self, rng):
        x = (100 * (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)) + 30 - 14j).astype(
            np.complex64
        )
        mean = dc.dc_init()
        mean2, y = dc.dc_block(mean, jnp.asarray(x))
        y_ref, m_ref = self._np_ref(x)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(mean2), m_ref, rtol=1e-4, atol=1e-5)

    def test_chunked_equals_whole(self, rng):
        x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64) + 5.0
        xb = jnp.asarray(x)
        _, y_whole = dc.dc_block(dc.dc_init(), xb)
        _, outs = stream.run_chunked(lambda m, c: dc.dc_block(m, c), dc.dc_init(), xb, 512)
        np.testing.assert_allclose(
            stream.concat_outputs(outs), y_whole, rtol=1e-5, atol=1e-5
        )

    def test_removes_dc_asymptotically(self):
        """A constant input decays toward zero output with tau = 1/alpha."""
        alpha = 1e-3
        x = jnp.ones(20000, jnp.complex64)
        _, y = dc.dc_block(dc.dc_init(), x, alpha=alpha)
        # after 5 time constants the residual is ~e^-5
        assert abs(np.asarray(y)[-1]) < 1.5 * np.exp(-5000 * alpha)


class TestCascade:
    def test_two_stage_matches_numpy(self, rng):
        hb = design.half_band(11).astype(np.float64)
        x = (rng.standard_normal(400) + 1j * rng.standard_normal(400)).astype(np.complex64)
        # numpy golden: conv -> take even, twice
        s1 = np.convolve(x, hb)[: len(x)][::2]
        s2 = np.convolve(s1, hb)[: len(s1)][::2]
        rt = halfband.cascade_taps(1)
        hists = halfband.cascade_init(1, 2)
        _, y = halfband.cascade_apply(hists, jnp.asarray(x)[None], rt)
        np.testing.assert_allclose(np.asarray(y[0]), s2.astype(np.complex64), rtol=1e-4, atol=1e-5)

    def test_chunked_equals_whole_5_stages(self, rng):
        """A 1.536M->48k style 5-stage cascade, streamed in 8 chunks."""
        stages = 5
        t_len = 4096
        x = (rng.standard_normal((2, t_len)) + 1j * rng.standard_normal((2, t_len))).astype(
            np.complex64
        )
        xb = jnp.asarray(x)
        rt = halfband.cascade_taps(2)
        hists = halfband.cascade_init(2, stages)
        _, y_whole = halfband.cascade_apply(hists, xb, rt)

        def block_fn(h, c):
            return halfband.cascade_apply(h, c, rt)

        _, outs = stream.run_chunked(block_fn, hists, xb, chunk=512)
        np.testing.assert_allclose(
            stream.concat_outputs(outs), y_whole, rtol=1e-5, atol=1e-6
        )

    def test_tone_passes_stopband_rejected(self):
        """A passband tone survives the /2 stage; a stopband tone is killed."""
        fs, t_len = 96000, 8192
        n = np.arange(t_len)
        rt = halfband.cascade_taps(1)
        for f, keep in [(5000, True), (46000, False)]:
            x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
            _, y = halfband.cascade_apply(halfband.cascade_init(1, 1), jnp.asarray(x)[None], rt)
            power = float(np.mean(np.abs(np.asarray(y[0][200:])) ** 2))
            if keep:
                assert power > 0.8
            else:
                assert power < 1e-4


class TestPolyphase:
    @pytest.mark.parametrize("factor", [5, 6])
    def test_decimation_matches_reference_loop(self, rng, factor):
        """Golden model of vfo.cpp:334-387: full FIR at check==0 instants,
        update-only otherwise == strided convolution at stride L."""
        target = 48000
        c = polyphase.late_decim_taps(target, factor).astype(np.float64)
        t_len = factor * 120
        x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(np.complex64)
        expect = np.convolve(x, c)[: len(x)][::factor]
        rt = fir.prepare_taps(polyphase.late_decim_taps(target, factor))
        hist = stream.fir_history_init(1, rt.shape[1])
        _, y = polyphase.late_decim_apply(hist, jnp.asarray(x)[None], rt, factor)
        np.testing.assert_allclose(np.asarray(y[0]), expect.astype(np.complex64), rtol=1e-4, atol=1e-5)

    def test_taps_counts(self):
        # 49 taps for /5, 73 for /6 (from the reference's design params)
        assert len(polyphase.late_decim_taps(48000, 5)) == 49
        assert len(polyphase.late_decim_taps(48000, 6)) == 73


class TestUSBDemod:
    def test_usb_tone(self):
        """A +3 kHz complex baseband tone demodulates to a 3 kHz audio tone
        with amplitude ~2x (delay(I) - hilbert(Q) doubles in-band USB power)."""
        fs, t_len, f = 12000, 6000, 3000
        n = np.arange(t_len)
        x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
        st = usb_state = usbdemod.usb_init(1)
        rt = fir.prepare_taps(design.hilbert(), 1)
        _, audio = usbdemod.usb_block(st, jnp.asarray(x)[None], rt)
        a = np.asarray(audio[0][500:])
        expect = 2.0 * np.cos(2 * np.pi * f * (n[500:] - 62) / fs)
        err = a - expect
        assert np.sqrt(np.mean(err**2)) < 0.05

    def test_lsb_rejected(self):
        """A negative-frequency (LSB) tone must be suppressed."""
        fs, t_len, f = 12000, 6000, -3000
        n = np.arange(t_len)
        x = np.exp(2j * np.pi * f * n / fs).astype(np.complex64)
        rt = fir.prepare_taps(design.hilbert(), 1)
        _, audio = usbdemod.usb_block(usbdemod.usb_init(1), jnp.asarray(x)[None], rt)
        a = np.asarray(audio[0][500:])
        assert np.sqrt(np.mean(a**2)) < 0.05

    def test_chunked_equals_whole(self, rng):
        x = (rng.standard_normal((3, 1200)) + 1j * rng.standard_normal((3, 1200))).astype(
            np.complex64
        )
        xb = jnp.asarray(x)
        rt = fir.prepare_taps(design.hilbert(), 3)
        _, y_whole = usbdemod.usb_block(usbdemod.usb_init(3), xb, rt)

        def block_fn(s, c):
            return usbdemod.usb_block(s, c, rt)

        _, outs = stream.run_chunked(block_fn, usbdemod.usb_init(3), xb, chunk=150)
        np.testing.assert_allclose(
            stream.concat_outputs(outs), y_whole, rtol=1e-5, atol=1e-5
        )

    def test_quantize(self):
        audio = jnp.asarray([[0.5, -0.25, 2.0, -2.0, 1.0 / 32768.0]], jnp.float32)
        gains = jnp.asarray([0.05], jnp.float32)
        out = np.asarray(usbdemod.quantize_i16(audio, gains))
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out[0, :2], [819, -410])  # 0.5*0.05*32768 = 819.2
        assert out[0, 2] == 3277 and out[0, 3] == -3277


class TestCompress:
    def test_style1_packing(self):
        """Packed-nibble bytes per vfo.cpp:397-405."""
        x = jnp.asarray([0.5 + 0.25j, -0.5 - 0.25j, 0.99 + 0.0j], jnp.complex64)
        out = np.asarray(compress.compress_style1(x))
        # re=64 -> 0x40; im=32 -> 0x20 -> high nibble 0x2
        assert out[0] == (64 & 0xF0) | ((32 & 0xF0) >> 4)
        # re=-64=0xC0, im=-32=0xE0 -> 0xC0 | 0x0E
        assert out[1] == ((-64 & 0xF0) | ((-32 & 0xF0) >> 4)) & 0xFF
        assert out[2] == ((126 & 0xF0) | 0) & 0xFF  # 0.99*128=126.7 -> 126

    def test_style1_scale(self):
        x = jnp.asarray([1.0 + 1.0j], jnp.complex64)
        out = np.asarray(compress.compress_style1(x, scale=2.0))
        assert out[0] == (64 & 0xF0) | ((64 & 0xF0) >> 4)

    def test_style2_interleave(self):
        x = jnp.asarray([[0.5 + 0.25j, -1.0 + 0.75j]], jnp.complex64)
        out = np.asarray(compress.compress_style2(x))
        np.testing.assert_array_equal(out[0], [64, 32, -128, 96])


class TestIngest:
    def test_u8_lut(self):
        raw = jnp.asarray([0, 127, 255, 128], jnp.uint8)
        y = np.asarray(ingest.u8_iq_to_complex(raw))
        np.testing.assert_array_equal(y, [-127 + 0j, 128 + 1j])

    def test_f32_pairs(self):
        raw = jnp.asarray([1.0, -2.0, 3.0, 4.0], jnp.float32)
        y = np.asarray(ingest.f32_pairs_to_complex(raw))
        np.testing.assert_array_equal(y, [1 - 2j, 3 + 4j])

    def test_i8_forms_match_u8_lut(self, rng):
        """The fused-ingest i8 planes (flat and ROW form) carry u8 - 128;
        +1 after the kernel's f32 cast reproduces the LUT value u8 - 127
        exactly, and the row form is the flat form reshaped."""
        t = 1024
        raw = jnp.asarray(rng.integers(0, 256, 2 * t).astype(np.uint8))
        ref_r, ref_i = ingest.u8_iq_to_planar(raw)
        fr, fi = ingest.u8_iq_to_i8_planar(raw)
        np.testing.assert_array_equal(
            np.asarray(fr, np.float32) + 1.0, np.asarray(ref_r)
        )
        np.testing.assert_array_equal(
            np.asarray(fi, np.float32) + 1.0, np.asarray(ref_i)
        )
        rr, ri = ingest.u8_iq_to_i8_rows(raw)
        assert rr.shape == (t // 256, 256)
        np.testing.assert_array_equal(
            np.asarray(rr).reshape(-1), np.asarray(fr)
        )
        np.testing.assert_array_equal(
            np.asarray(ri).reshape(-1), np.asarray(fi)
        )
