"""Fused mix+cascade Pallas kernel vs the jnp reference kernels.

Runs in Pallas interpreter mode on CPU; the same kernel compiles on TPU
(validated separately on hardware by tools/kernel_solo.py / kernel_ab.py and the bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdrreceiver_tpu.kernels import halfband, nco
from sdrreceiver_tpu.pallas.frontend import MixCascadeKernel, supported


def jnp_reference(freqs, fs, stages, x):
    """mix + cascade via the golden jnp kernels (complex in, complex out)."""
    st = nco.nco_init(freqs, fs)
    _, z = nco.mix_block(st, jnp.asarray(x), fs)
    rt = halfband.cascade_taps(len(freqs))
    hists = halfband.cascade_init(len(freqs), stages)
    _, y = halfband.cascade_apply(hists, z, rt)
    return np.asarray(y)


def run_fused(freqs, fs, stages, x, chunks=1):
    """Drive the STATELESS composite kernel like the compiler does:
    chunk i is prefixed with the previous chunk's trailing warmup samples
    (zeros at stream start — the zero-history convention), the kernel's
    phase is rewound to the prefix start, and warm-up outputs are
    dropped."""
    from sdrreceiver_tpu.pallas.frontend import warmup_len

    c = len(freqs)
    t_len = x.shape[-1] // chunks
    warm = warmup_len(stages)
    k = MixCascadeKernel(c, stages, fs, freqs, t_len + warm, interpret=True)
    st = nco.nco_init(freqs, fs)
    outs = []
    xr = jnp.asarray(np.real(x).astype(np.float32))
    xi = jnp.asarray(np.imag(x).astype(np.float32))
    if xr.ndim == 1:
        xr = jnp.broadcast_to(xr, (c, xr.shape[0]))
        xi = jnp.broadcast_to(xi, (c, xi.shape[0]))
    prev_r = jnp.zeros((c, warm), jnp.float32)
    prev_i = jnp.zeros((c, warm), jnp.float32)
    for i in range(chunks):
        sl = slice(i * t_len, (i + 1) * t_len)
        ext_r = jnp.concatenate([prev_r, xr[:, sl]], axis=-1)
        ext_i = jnp.concatenate([prev_i, xi[:, sl]], axis=-1)
        ph = nco.phase_minus(st, fs, warm)
        yr, yi = k(ph, ext_r, ext_i)
        drop = warm >> stages
        outs.append(np.asarray(yr[:, drop:]) + 1j * np.asarray(yi[:, drop:]))
        prev_r, prev_i = ext_r[:, -warm:], ext_i[:, -warm:]
        st = dict(st)
        st["phase"] = nco.advance_per_block(st, fs, t_len)
    return np.concatenate(outs, axis=-1)


class TestSupported:
    def test_constraints(self):
        assert supported(1536000, 2, 1536 * 256)
        assert not supported(1536000, 2, 1000)  # not a multiple of 256
        assert not supported(1536000, 8, 256 * 64)  # too many stages
        assert not supported(5_000_000, 2, 256 * 64)  # fs too big for int32


class TestMixCascade:
    @pytest.mark.parametrize("stages", [0, 1, 2, 3, 5])
    def test_matches_jnp_single_channel(self, rng, stages):
        fs = 192000
        t_len = 256 * 32
        x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(
            np.complex64
        )
        freqs = np.array([48123])
        ref = jnp_reference(freqs, fs, stages, x)
        got = run_fused(freqs, fs, stages, x)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_matches_jnp_multichannel(self, rng):
        fs, stages = 384000, 3
        t_len = 256 * 16
        x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(
            np.complex64
        )
        freqs = np.array([110854, -95000, 0, 177777])
        ref = jnp_reference(freqs, fs, stages, x)
        got = run_fused(freqs, fs, stages, x)
        assert got.shape == ref.shape == (4, t_len >> stages)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_streaming_chunks_match_whole(self, rng):
        """Carried tails + phase across kernel invocations == one big call."""
        fs, stages = 192000, 2
        t_len = 256 * 64
        x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(
            np.complex64
        )
        freqs = np.array([12345, -4321])
        whole = run_fused(freqs, fs, stages, x, chunks=1)
        chunked = run_fused(freqs, fs, stages, x, chunks=4)
        np.testing.assert_allclose(chunked, whole, rtol=1e-5, atol=1e-6)

    def test_tone_decimation(self):
        """A passband tone survives the fused chain with correct frequency."""
        fs, stages = 1536000, 2
        t_len = 256 * 128
        n = np.arange(t_len)
        f_mix, f_tone = 484000, -483000  # tone lands at 1 kHz after mix
        x = np.exp(2j * np.pi * f_tone * n / fs).astype(np.complex64)
        got = run_fused(np.array([f_mix]), fs, stages, x)[0]
        out_rate = fs >> stages
        spec = np.abs(np.fft.fft(got[200:]))
        freqs_axis = np.fft.fftfreq(len(got) - 200, 1 / out_rate)
        peak = freqs_axis[np.argmax(spec)]
        assert abs(peak - 1000.0) < out_rate / len(spec) * 2


class TestPallasReceiver:
    """Full CompiledReceiver with use_pallas vs the jnp receiver."""

    INI = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
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
1\\gain=5
1\\data_rate=600
1\\filter_bandwidth=4000
1\\topic=VFO01
2\\frequency=1545124261
2\\gain=5
2\\data_rate=1200
2\\topic=VFO07
3\\frequency=1546005300
3\\gain=5
3\\data_rate=10500
3\\topic=VFO13
"""

    def test_matches_jnp_receiver(self, rng):
        from sdrreceiver_tpu.graph import build_plan, parse_ini_text
        from sdrreceiver_tpu.graph.compiler import CompiledReceiver
        from sdrreceiver_tpu.io import iqfile

        plan = build_plan(parse_ini_text(self.INI))
        block = 49152
        iq = iqfile.synthesize_channels(
            2 * block,
            1536000,
            1545600000,
            [(1545005146, 900.0, 10.0), (1546005300, 2100.0, 8.0)],
            noise=0.5,
            dc_offset=2 - 1j,
        )
        rx_ref = CompiledReceiver(plan, block)
        rx_pal = CompiledReceiver(plan, block, use_pallas=True, pallas_interpret=True)
        # both group fronts run in the ONE merged multi-stage kernel, and
        # every bucket gets its own fused kernel
        assert rx_pal._front_merged is not None
        assert rx_pal._front_merged[2] == [0, 1]
        assert len(rx_pal._kernels) == 3
        sr, sp = rx_ref.init_state(), rx_pal.init_state()
        for i in range(2):
            chunk = jnp.asarray(iq[i * block : (i + 1) * block])
            sr, oref = rx_ref.step_iq(sr, chunk)
            sp, opal = rx_pal.step_iq(sp, chunk)
            assert set(oref) == set(opal)
            for k in oref:
                d = np.abs(
                    np.asarray(opal[k]).astype(np.int32)
                    - np.asarray(oref[k]).astype(np.int32)
                )
                assert d.max() <= 1, (k, i, d.max())

    def test_burst_matches_single_steps(self, rng):
        """Pallas kernels traced inside the lax.scan burst: step_many_iq
        must be bit-identical to single fused steps."""
        from sdrreceiver_tpu.graph import build_plan, parse_ini_text
        from sdrreceiver_tpu.graph.compiler import CompiledReceiver
        from sdrreceiver_tpu.io import iqfile

        plan = build_plan(parse_ini_text(self.INI))
        block, k = 49152, 2
        iq = iqfile.synthesize_channels(
            k * block,
            1536000,
            1545600000,
            [(1545005146, 900.0, 10.0)],
            noise=0.5,
        )
        from burstcmp import assert_outputs_close, assert_states_close

        rx = CompiledReceiver(plan, block, use_pallas=True, pallas_interpret=True)
        sm, om = rx.step_many_iq(rx.init_state(), jnp.asarray(iq.reshape(k, block)))
        per = rx.unstack_outputs({key: np.asarray(v) for key, v in om.items()}, k)
        s = rx.init_state()
        for i in range(k):
            s, o = rx.step_iq(s, jnp.asarray(iq[i * block : (i + 1) * block]))
            assert_outputs_close(per[i], o, f"blk{i}")
        assert_states_close(rx, sm, s)


class TestPallasEdgeGroups:
    """Pallas mode on plans whose groups the bucket kernels must warm up
    WITHOUT a cascaded group front: a direct group (unmatched sub — its
    "group output" is the raw input stream) and a mix-only (stages == 0)
    main group.  Round-4 advisor finding: _prev_group_tail crashed on the
    first (no 'nco' leaf) and xtail_len under-budgeted the second."""

    DIRECT_INI = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
correct_dc_bias=1
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
2\\frequency=1559005000
2\\gain=5
2\\data_rate=600
2\\topic=ORPHN
"""

    STAGES0_INI = """
sample_rate=1536000
center_frequency=1545600000
zmq_address=tcp://*:6003
correct_dc_bias=1
[main_vfos]
size=1
1\\frequency=1545116000
1\\out_rate=1536000
[vfos]
size=1
1\\frequency=1545005146
1\\gain=5
1\\data_rate=600
1\\topic=VFO01
"""

    @pytest.mark.parametrize("ini", ["DIRECT_INI", "STAGES0_INI"])
    def test_matches_jnp_receiver(self, ini, rng):
        import warnings

        from sdrreceiver_tpu.graph import build_plan, parse_ini_text
        from sdrreceiver_tpu.graph.compiler import CompiledReceiver
        from sdrreceiver_tpu.io import iqfile

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            plan = build_plan(parse_ini_text(getattr(self, ini)))
        if ini == "DIRECT_INI":
            assert any(g.direct for g in plan.groups)
        else:
            assert all(g.stages == 0 and not g.direct for g in plan.groups)
        block = 49152
        iq = iqfile.synthesize_channels(
            2 * block,
            1536000,
            1545600000,
            [(1545005146, 900.0, 10.0), (1559005000, 700.0, 10.0)],
            noise=0.5,
            dc_offset=2 - 1j,
        )
        rx_ref = CompiledReceiver(plan, block)
        rx_pal = CompiledReceiver(
            plan, block, use_pallas=True, pallas_interpret=True
        )
        # the edge group's bucket kernels must actually have been built
        # (otherwise this test would only cover the jnp fallback)
        assert any("/b" in k for k in rx_pal._kernels), rx_pal._kernels
        sr, sp = rx_ref.init_state(), rx_pal.init_state()
        for i in range(2):
            chunk = jnp.asarray(iq[i * block : (i + 1) * block])
            sr, oref = rx_ref.step_iq(sr, chunk)
            sp, opal = rx_pal.step_iq(sp, chunk)
            assert set(oref) == set(opal)
            for k in oref:
                d = np.abs(
                    np.asarray(opal[k]).astype(np.int32)
                    - np.asarray(oref[k]).astype(np.int32)
                )
                assert d.max() <= 1, (k, i, d.max())


class TestFusedU8Path:
    """The u8 PRODUCT entry (fused i8 ingest+DC kernel + row-form plane
    plumbing through _front/_bucket_step) — the round-5 headline TPU path.
    Every other Pallas parity test drives step_iq, which bypasses it."""

    def _build(self):
        from sdrreceiver_tpu.graph import build_plan, parse_ini_text
        from sdrreceiver_tpu.graph.compiler import CompiledReceiver

        plan = build_plan(parse_ini_text(TestPallasReceiver.INI))
        block = 49152
        rx_ref = CompiledReceiver(plan, block)
        rx_pal = CompiledReceiver(
            plan, block, use_pallas=True, pallas_interpret=True
        )
        # the fused ingest+DC kernel and the row plumbing must be engaged,
        # otherwise this test silently degrades to the step_iq coverage
        assert rx_pal._dc_kernel_u8 is not None
        return plan, block, rx_ref, rx_pal

    def test_u8_step_matches_jnp_receiver(self, rng):
        plan, block, rx_ref, rx_pal = self._build()
        raw = jnp.asarray(
            rng.integers(0, 256, (3, 2 * block)).astype(np.uint8)
        )
        sr, sp = rx_ref.init_state(), rx_pal.init_state()
        for i in range(3):
            sr, oref = rx_ref.step_u8(sr, raw[i])
            sp, opal = rx_pal.step_u8(sp, raw[i])
            assert set(oref) == set(opal)
            for k in oref:
                d = np.abs(
                    np.asarray(opal[k]).astype(np.int32)
                    - np.asarray(oref[k]).astype(np.int32)
                )
                assert d.max() <= 1, (k, i, d.max())

    def test_u8_burst_matches_single_steps(self, rng):
        from burstcmp import assert_outputs_close, assert_states_close

        plan, block, _, rx = self._build()
        k = 2
        raw = jnp.asarray(
            rng.integers(0, 256, (k, 2 * block)).astype(np.uint8)
        )
        sm, om = rx.step_many_u8(rx.init_state(), raw)
        per = rx.unstack_outputs(
            {key: np.asarray(v) for key, v in om.items()}, k
        )
        s = rx.init_state()
        for i in range(k):
            s, o = rx.step_u8(s, raw[i])
            assert_outputs_close(per[i], o, f"blk{i}")
        assert_states_close(rx, sm, s)

    def test_u8_matches_iq_entry(self, rng):
        """step_u8 (rows path) and step_iq (complex entry) on the SAME
        signal agree to the quantizer LSB — pins the i8 value semantics
        (u8 - 127) and the row deinterleave ordering end to end."""
        plan, block, _, rx = self._build()
        raw = rng.integers(0, 256, 2 * block).astype(np.uint8)
        f = raw.astype(np.float32) - 127.0
        iq = (f[0::2] + 1j * f[1::2]).astype(np.complex64)
        s1, o1 = rx.step_u8(rx.init_state(), jnp.asarray(raw))
        s2, o2 = rx.step_iq(rx.init_state(), jnp.asarray(iq))
        for key in o1:
            d = np.abs(
                np.asarray(o1[key]).astype(np.int32)
                - np.asarray(o2[key]).astype(np.int32)
            )
            assert d.max() <= 1, (key, d.max())

    def test_f32_entry_matches_jnp_receiver(self, rng):
        """The f32-recording entry also runs the rows path when the DC
        kernel is present (process-file's path on TPU)."""
        plan, block, rx_ref, rx_pal = self._build()
        raw = rng.standard_normal((2, 2 * block)).astype(np.float32) * 30
        sr, sp = rx_ref.init_state(), rx_pal.init_state()
        for i in range(2):
            sr, oref = rx_ref.step_f32(sr, jnp.asarray(raw[i]))
            sp, opal = rx_pal.step_f32(sp, jnp.asarray(raw[i]))
            for k in oref:
                d = np.abs(
                    np.asarray(opal[k]).astype(np.int32)
                    - np.asarray(oref[k]).astype(np.int32)
                )
                assert d.max() <= 1, (k, i, d.max())
