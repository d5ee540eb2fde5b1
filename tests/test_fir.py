"""Block FIR kernels: convolution semantics + chunked==whole streaming."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdrreceiver_tpu.core import stream
from sdrreceiver_tpu.kernels import design, fir, ossfft


def np_causal_fir(x, c, stride=1):
    """Golden model: y[n] = sum_k c[k] x[n-k], zero history, n = 0, S, 2S..."""
    full = np.convolve(x, c)[: len(x)]
    return full[::stride]


class TestConvBlock:
    def test_matches_numpy_real(self, rng):
        c = design.low_pass(1.0, 48000, 8000, 4000)
        x = rng.standard_normal(512).astype(np.float32)
        rt = fir.prepare_taps(c)
        hist = stream.fir_history_init(1, len(c), jnp.float32)
        _, y = fir.conv_block(hist, jnp.asarray(x)[None], rt)
        np.testing.assert_allclose(y[0], np_causal_fir(x, c), rtol=1e-4, atol=1e-5)

    def test_matches_numpy_complex(self, rng):
        c = design.half_band(11)
        x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64)
        rt = fir.prepare_taps(c)
        hist = stream.fir_history_init(1, 11)
        _, y = fir.conv_block(hist, jnp.asarray(x)[None], rt)
        np.testing.assert_allclose(y[0], np_causal_fir(x, c), rtol=1e-4, atol=1e-5)

    def test_stride_decimation(self, rng):
        """stride=2 output == full output at even indices (the half-band
        phase convention, halfbanddecimator.cpp:48-66)."""
        c = design.half_band(11)
        x = (rng.standard_normal(128) + 1j * rng.standard_normal(128)).astype(np.complex64)
        rt = fir.prepare_taps(c)
        hist = stream.fir_history_init(1, 11)
        _, y2 = fir.conv_block(hist, jnp.asarray(x)[None], rt, stride=2)
        np.testing.assert_allclose(y2[0], np_causal_fir(x, c, stride=2), rtol=1e-4, atol=1e-5)

    def test_per_channel_taps_with_padding(self, rng):
        """Channels with different filters run as one grouped conv; trailing
        zero padding must not shift alignment.  A delta tap = passthrough."""
        c0 = design.low_pass(1.0, 48000, 6000, 3000)  # longer
        c1 = np.zeros_like(c0)
        c1[0] = 1.0  # identity channel
        x = rng.standard_normal((2, 300)).astype(np.float32)
        rt = fir.prepare_taps(np.stack([c0, c1]))
        hist = stream.fir_history_init(2, len(c0), jnp.float32)
        _, y = fir.conv_block(hist, jnp.asarray(x), rt)
        np.testing.assert_allclose(y[0], np_causal_fir(x[0], c0), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(y[1], x[1], atol=1e-6)

    @pytest.mark.parametrize("stride", [1, 2, 5, 6])
    def test_chunked_equals_whole(self, rng, stride):
        c = design.low_pass(2.0, 240000, 24000, 12000)
        x = (rng.standard_normal(1200) + 1j * rng.standard_normal(1200)).astype(np.complex64)
        rt = fir.prepare_taps(c, channels=3)
        xb = jnp.asarray(np.stack([x, 2 * x, x[::-1]]))
        hist = stream.fir_history_init(3, len(c))
        _, y_whole = fir.conv_block(hist, xb, rt, stride)

        def block_fn(h, xc):
            return fir.conv_block(h, xc, rt, stride)

        _, outs = stream.run_chunked(block_fn, hist, xb, chunk=120)
        y_chunked = stream.concat_outputs(outs)
        np.testing.assert_allclose(y_chunked, y_whole, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("stride", [1, 2, 5])
    def test_banded_matmul_strategy_matches_numpy(self, rng, stride):
        """Long filters (ntaps >= 16) with a block width in [128, 512] take
        the banded-matrix MXU path; per-channel taps and strides included.
        T=3000 admits widths {150..500}, so this pins the banded strategy
        itself (small-T tests fall through to the FMA ladder)."""
        c0 = design.hilbert()  # 125 taps
        c1 = np.zeros_like(c0)
        c1[3] = 1.0  # pure 3-sample delay channel
        t = np.stack([c0, c1])
        assert fir._banded_width(3000, stride, t.shape[1]) is not None
        x = rng.standard_normal((2, 3000)).astype(np.float32)
        rt = fir.prepare_taps(t)
        hist = stream.fir_history_init(2, t.shape[1], jnp.float32)
        _, y = fir.conv_block(hist, jnp.asarray(x), rt, stride=stride)
        for ci in range(2):
            np.testing.assert_allclose(
                y[ci], np_causal_fir(x[ci], t[ci], stride=stride),
                rtol=1e-4, atol=1e-4,
            )
        # channel-identical variant (scalar-coefficient matrix path)
        rt1 = fir.prepare_taps(c0, channels=2)
        _, y1 = fir.conv_block(hist, jnp.asarray(x), rt1, stride=stride)
        for ci in range(2):
            np.testing.assert_allclose(
                y1[ci], np_causal_fir(x[ci], c0, stride=stride),
                rtol=1e-4, atol=1e-4,
            )

    def test_stride_requires_divisible_block(self):
        rt = fir.prepare_taps(design.half_band(11))
        hist = stream.fir_history_init(1, 11)
        with pytest.raises(ValueError):
            fir.conv_block(hist, jnp.zeros((1, 101), jnp.complex64), rt, stride=2)


class TestDelay:
    def test_delay_semantics(self, rng):
        x = rng.standard_normal((2, 100)).astype(np.float32)
        hist = jnp.zeros((2, 62), jnp.float32)
        h2, y = fir.delay_apply(hist, jnp.asarray(x))
        np.testing.assert_allclose(y[:, 62:], x[:, :38], atol=0)
        np.testing.assert_allclose(y[:, :62], 0.0, atol=0)
        np.testing.assert_allclose(h2, x[:, 38:], atol=0)

    def test_delay_chunked(self, rng):
        x = rng.standard_normal((1, 400)).astype(np.float32)
        xb = jnp.asarray(x)
        hist = jnp.zeros((1, 62), jnp.float32)
        _, y_whole = fir.delay_apply(hist, xb)
        _, outs = stream.run_chunked(fir.delay_apply, hist, xb, chunk=40)
        np.testing.assert_allclose(stream.concat_outputs(outs), y_whole, atol=0)

    def test_block_shorter_than_delay(self, rng):
        x = rng.standard_normal((1, 300)).astype(np.float32)
        xb = jnp.asarray(x)
        hist = jnp.zeros((1, 62), jnp.float32)
        _, y_whole = fir.delay_apply(hist, xb)
        _, outs = stream.run_chunked(fir.delay_apply, hist, xb, chunk=20)
        np.testing.assert_allclose(stream.concat_outputs(outs), y_whole, atol=0)


class TestOverlapSaveFFT:
    """The kiss_fastfir-equivalent engine must match the direct FIR exactly
    (same streaming interface, property-tested — SURVEY.md section 2.3)."""

    @pytest.mark.parametrize("ntaps,nfft", [(47, None), (155, 512), (125, None)])
    def test_matches_direct(self, rng, ntaps, nfft):
        c = rng.standard_normal(ntaps).astype(np.float32) * 0.1
        x = (rng.standard_normal((2, 600)) + 1j * rng.standard_normal((2, 600))).astype(np.complex64)
        xb = jnp.asarray(x)
        rt = fir.prepare_taps(c, 2)
        filt = ossfft.oss_prepare(c, 2, nfft)
        hist = stream.fir_history_init(2, ntaps)
        _, y_direct = fir.conv_block(hist, xb, rt)
        _, y_fft = ossfft.oss_block(hist, xb, filt)
        np.testing.assert_allclose(y_fft, y_direct, rtol=2e-4, atol=2e-4)

    def test_chunked_equals_whole(self, rng):
        c = design.low_pass(1.0, 48000, 3000, 750)  # 155 taps
        filt = ossfft.oss_prepare(c, 1)
        x = (rng.standard_normal(2048) + 1j * rng.standard_normal(2048)).astype(np.complex64)
        xb = jnp.asarray(x)[None]
        hist = stream.fir_history_init(1, len(c))
        _, y_whole = ossfft.oss_block(hist, xb, filt)

        def block_fn(h, xc):
            return ossfft.oss_block(h, xc, filt)

        _, outs = stream.run_chunked(block_fn, hist, xb, chunk=256)
        np.testing.assert_allclose(
            stream.concat_outputs(outs), y_whole, rtol=1e-4, atol=1e-4
        )

    def test_real_rfft_path_matches_direct(self, rng):
        """Real inputs take the rfft/irfft half-spectrum path (the audio
        low-pass case the compiler wires oss in for); must equal the direct
        FIR and stay real-dtyped end to end (no complex64 upcast)."""
        c = design.low_pass(2.0, 12000, 3300, 825)  # 141 taps, audio-like
        x = rng.standard_normal((3, 750)).astype(np.float32)
        xb = jnp.asarray(x)
        rt = fir.prepare_taps(c, 3)
        filt = ossfft.oss_prepare(c, 3)
        hist = stream.fir_history_init(3, len(c), jnp.float32)
        _, y_direct = fir.conv_block(hist, xb, rt)
        nh, y_fft = ossfft.oss_block(hist, xb, filt)
        assert not jnp.iscomplexobj(y_fft)
        assert not jnp.iscomplexobj(nh)
        np.testing.assert_allclose(y_fft, y_direct, rtol=2e-4, atol=2e-4)
        # chunked == whole through the real path
        _, outs = stream.run_chunked(
            lambda h, xc: ossfft.oss_block(h, xc, filt), hist, xb, chunk=250
        )
        np.testing.assert_allclose(
            stream.concat_outputs(outs), y_fft, rtol=1e-4, atol=1e-4
        )

    def test_stride(self, rng):
        c = design.low_pass(2.0, 240000, 24000, 12000)
        filt = ossfft.oss_prepare(c, 1)
        rt = fir.prepare_taps(c, 1)
        x = (rng.standard_normal(500) + 1j * rng.standard_normal(500)).astype(np.complex64)
        xb = jnp.asarray(x)[None]
        hist = stream.fir_history_init(1, len(c))
        _, y_direct = fir.conv_block(hist, xb, rt, stride=5)
        _, y_fft = ossfft.oss_block(hist, xb, filt, stride=5)
        np.testing.assert_allclose(y_fft, y_direct, rtol=2e-4, atol=2e-4)
