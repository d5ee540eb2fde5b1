"""Golden-value tests for filter designers against the reference formulas.

The expected values below are recomputed here independently (numpy float64
versions of the published formulas at gnuradio/firfilter.cpp:64-119,174-253
and jonti/dsp.cpp:202-216) plus spot-check constants transcribed from the
reference's behavior.
"""

import numpy as np
import pytest

from sdrreceiver_tpu.kernels import design


class TestWindows:
    def test_hamming(self):
        w = design.window(design.Window.HAMMING, 5)
        n = np.arange(5)
        expect = 0.54 - 0.46 * np.cos(2 * np.pi * n / 4)
        np.testing.assert_allclose(w, expect, rtol=1e-12)

    def test_hann(self):
        w = design.window(design.Window.HANN, 9)
        expect = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(9) / 8)
        np.testing.assert_allclose(w, expect, atol=1e-12)

    def test_blackman(self):
        w = design.window(design.Window.BLACKMAN, 7)
        n = np.arange(7)
        expect = 0.42 - 0.5 * np.cos(2 * np.pi * n / 6) + 0.08 * np.cos(4 * np.pi * n / 6)
        np.testing.assert_allclose(w, expect, atol=1e-12)

    def test_unbuildable_types_raise(self):
        # same restriction as the reference build() (firfilter.cpp:174-188)
        for win in (design.Window.KAISER, design.Window.BARTLETT, design.Window.FLATTOP):
            with pytest.raises(ValueError):
                design.window(win, 11)

    def test_attenuation_table(self):
        # firfilter.cpp:141-171
        assert design.max_attenuation(design.Window.HAMMING) == 53
        assert design.max_attenuation(design.Window.HANN) == 44
        assert design.max_attenuation(design.Window.BLACKMAN) == 74
        assert design.max_attenuation(design.Window.BLACKMAN_HARRIS) == 92
        assert design.max_attenuation(design.Window.KAISER, beta=1.102) == pytest.approx(18.7)


class TestLowPass:
    def test_ntaps_rule(self):
        # ntaps = int(53 * Fs / (22 * tw)), forced odd (firfilter.cpp:108-119)
        assert design.compute_ntaps(48000, 2500) == 47
        assert design.compute_ntaps(12000, 1000) == 29
        # the reference /5 late-decim design: Fs=target*5, tw=target/4
        assert design.compute_ntaps(48000 * 5, 48000 / 4) == 49
        # /6: Fs=target*6, tw=target/5
        assert design.compute_ntaps(48000 * 6, 48000 / 5) == 73

    def test_dc_gain_normalization(self):
        taps = design.low_pass(2.0, 48000, 10000, 2500)
        assert taps.dtype == np.float32
        assert len(taps) % 2 == 1
        np.testing.assert_allclose(np.sum(taps.astype(np.float64)), 2.0, rtol=1e-6)

    def test_matches_formula(self):
        fs, fc, tw = 48000.0, 10000.0, 2500.0
        taps = design.low_pass(1.0, fs, fc, tw)
        ntaps = len(taps)
        m = (ntaps - 1) // 2
        w = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(ntaps) / (ntaps - 1))
        n = np.arange(-m, m + 1, dtype=np.float64)
        fw = 2 * np.pi * fc / fs
        ideal = np.where(n == 0, fw / np.pi, np.sin(n * fw) / np.where(n == 0, 1, n * np.pi))
        raw = ideal * w
        expect = raw / raw.sum()
        np.testing.assert_allclose(taps, expect, rtol=2e-5, atol=1e-9)

    def test_symmetric(self):
        taps = design.low_pass(1.0, 240000, 24000, 12000)
        np.testing.assert_allclose(taps, taps[::-1], rtol=1e-12)

    def test_sanity_checks(self):
        with pytest.raises(ValueError):
            design.low_pass(1.0, -1, 100, 10)
        with pytest.raises(ValueError):
            design.low_pass(1.0, 1000, 600, 10)  # fc > fs/2
        with pytest.raises(ValueError):
            design.low_pass(1.0, 1000, 100, 0)


class TestHilbert:
    def test_structure(self):
        c = design.hilbert()
        assert len(c) == 125
        assert c[62] == 0.0
        # anti-symmetric
        np.testing.assert_allclose(c, -c[::-1], atol=1e-9)
        # even offsets are zero: 1 - cos(pi*even) == 0
        np.testing.assert_allclose(c[62 % 2 :: 2], 0.0, atol=1e-12)
        # unit L2 norm after normalization (dsp.cpp:210-216)
        np.testing.assert_allclose(np.sum(c.astype(np.float64) ** 2), 1.0, rtol=1e-6)

    def test_formula_values(self):
        c = design.hilbert()
        # unnormalized c[n] = (1/(pi m))(1 - cos(pi m)), m = n - 62
        m = np.arange(125) - 62
        raw = np.zeros(125)
        nz = m != 0
        raw[nz] = (1 - np.cos(np.pi * m[nz])) / (np.pi * m[nz])
        expect = raw / np.sqrt(np.sum(raw.astype(np.float32) ** 2))
        np.testing.assert_allclose(c, expect, rtol=1e-5, atol=1e-9)

    def test_quadrature_response(self):
        """A 125-tap Hilbert should shift a mid-band tone by ~-90 degrees."""
        c = design.hilbert().astype(np.float64)
        fs, f = 12000.0, 3000.0
        n = np.arange(4000)
        x = np.cos(2 * np.pi * f * n / fs)
        y = np.convolve(x, c, mode="full")[: len(n)]
        # compare against delayed input: y should approximate sin of the
        # delayed phase (90 deg lag of cos), amplitude ~1
        d = 62
        expect = np.sin(2 * np.pi * f * (n[200:3000] - d) / fs)
        err = y[200:3000] - expect
        # the reference design is rectangular-truncated (no window,
        # dsp.cpp:202-216), so ~1% Gibbs amplitude ripple is inherent
        assert np.sqrt(np.mean(err**2)) < 0.02


class TestHalfBand:
    def test_tables_available(self):
        assert design.HALF_BAND_TAP_COUNTS == (11, 15, 21, 23, 51)

    def test_11_tap_values(self):
        """Exact constants from halfbanddecimator.h:66-79."""
        hb = design.half_band(11)
        np.testing.assert_array_equal(
            hb,
            np.array(
                [
                    0.0060431029837374152,
                    0.0,
                    -0.049372515458761493,
                    0.0,
                    0.29332944952052842,
                    0.5,
                    0.29332944952052842,
                    0.0,
                    -0.049372515458761493,
                    0.0,
                    0.0060431029837374152,
                ],
                dtype=np.float32,
            ),
        )

    def test_halfband_property(self):
        """Every table: odd taps zero except center; center ~0.5; DC gain ~1;
        |H(f)| + |H(fs/2 - f)| ~= 1 (the half-band symmetry)."""
        for ntaps in design.HALF_BAND_TAP_COUNTS:
            hb = design.half_band(ntaps).astype(np.float64)
            mid = ntaps // 2
            # the half-band structure: taps at even distance from center are
            # zero (except the ~0.5 center itself)
            dist = np.arange(ntaps) - mid
            assert np.all(hb[(dist % 2 == 0) & (dist != 0)] == 0.0)
            assert abs(hb[mid] - 0.5) < 1e-3
            assert abs(hb.sum() - 1.0) < 2e-3
            w = np.fft.rfft(hb, 4096)
            h = np.abs(w)
            np.testing.assert_allclose(h + h[::-1], 1.0 * np.ones_like(h), atol=5e-3)

    def test_unknown_length_raises(self):
        with pytest.raises(ValueError):
            design.half_band(13)
