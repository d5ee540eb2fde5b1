"""Honest microbenchmarks of layout candidates for the TPU hot path.

Round-3 finding: the receiver step is ~100x off roofline NOT because of
dispatch (that was a separate measurement fiction, see profile_stages.py)
but because of data layouts: minor-dim-2 deinterleaves and C=1 / small-C
1-D convolutions lower terribly on TPU.  This tool times candidate
formulations with the fetch-forced differential method so kernel design is
decided by data.

Run on the TPU:  python tools/layout_probe.py [--probe NAME]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

T = 1536000
R = 512            # fold rows (sublane-major axis of the 2-D layout)
HALO = 10          # 11-tap half-band history


def honest(make_body, xs_small, xs_big, reps=3):
    import jax
    import jax.numpy as jnp

    t = {}
    for xs in (xs_small, xs_big):
        body = make_body()

        @jax.jit
        def prog(xs):
            def b(acc, x):
                return acc + body(x), None
            s, _ = jax.lax.scan(b, jnp.zeros((), jnp.float32), xs)
            return s

        _ = float(prog(xs))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(prog(xs))
            best = min(best, time.perf_counter() - t0)
        t[xs.shape[0]] = best
    n1, n2 = xs_small.shape[0], xs_big.shape[0]
    return (t[n2] - t[n1]) / (n2 - n1)


def probes():
    import jax
    import jax.numpy as jnp

    P = {}

    # -- deinterleave candidates ------------------------------------------
    def base(x):
        return jnp.sum(x.astype(jnp.float32) - 127.0)
    P["base_u8_sum"] = lambda: base

    SelI = np.zeros((256, 128), np.float32)
    SelI[2 * np.arange(128), np.arange(128)] = 1
    SelQ = np.zeros((256, 128), np.float32)
    SelQ[2 * np.arange(128) + 1, np.arange(128)] = 1

    def mk_sel():
        si, sq = jnp.asarray(SelI), jnp.asarray(SelQ)

        def f(x):
            rows = x.astype(jnp.float32).reshape(-1, 256)
            i = rows @ si - 127.0
            q = rows @ sq - 127.0
            return jnp.sum(i) + 2.0 * jnp.sum(q)
        return f
    P["deint_mxu_selector"] = mk_sel

    def mk_bitcast():
        def f(x):
            u16 = jax.lax.bitcast_convert_type(
                x.reshape(-1, 2), jnp.uint16
            ).reshape(-1)
            i = (u16 & 0xFF).astype(jnp.float32) - 127.0
            q = (u16 >> 8).astype(jnp.float32) - 127.0
            return jnp.sum(i) + 2.0 * jnp.sum(q)
        return f
    P["deint_bitcast_u16"] = mk_bitcast

    def mk_lanestride():
        def f(x):
            rows = (x.astype(jnp.float32) - 127.0).reshape(-1, 256)
            return jnp.sum(rows[:, 0::2]) + 2.0 * jnp.sum(rows[:, 1::2])
        return f
    P["deint_lane_stride"] = mk_lanestride

    # -- complex64 vs planar elementwise ----------------------------------
    def mk_cmul():
        ph = jnp.exp(2j * jnp.pi * jnp.arange(T, dtype=jnp.float32) * 0.001).astype(jnp.complex64)

        def f(x):
            v = (x[:T].astype(jnp.float32) - 127.0).astype(jnp.complex64)
            y = v * ph
            return jnp.sum(y.real) + jnp.sum(y.imag)
        return f
    P["mix_complex64"] = mk_cmul

    def mk_pmul():
        n = jnp.arange(T, dtype=jnp.float32) * jnp.float32(0.001)
        def f(x):
            vr = x[:T].astype(jnp.float32) - 127.0
            vi = x[T:2 * T].astype(jnp.float32) - 127.0
            c, s = jnp.cos(n), jnp.sin(n)
            return jnp.sum(vr * c - vi * s) + jnp.sum(vr * s + vi * c)
        return f
    P["mix_planar_f32"] = mk_pmul

    def mk_pmul2d():
        L = T // R
        n2 = (jnp.arange(R, dtype=jnp.float32)[:, None] * L
              + jnp.arange(L, dtype=jnp.float32)[None, :]) * jnp.float32(0.001)
        def f(x):
            vr = (x[:T].astype(jnp.float32) - 127.0).reshape(R, L)
            vi = (x[T:2 * T].astype(jnp.float32) - 127.0).reshape(R, L)
            c, s = jnp.cos(n2), jnp.sin(n2)
            return jnp.sum(vr * c - vi * s) + jnp.sum(vr * s + vi * c)
        return f
    P["mix_planar_2d"] = mk_pmul2d

    # -- FIR formulations at full rate ------------------------------------
    rt11 = np.random.default_rng(1).standard_normal((1, 11)).astype(np.float32)

    def mk_conv1d():
        rt = jnp.asarray(rt11)
        def f(x):
            v = x[:T].astype(jnp.float32) - 127.0
            out = jax.lax.conv_general_dilated(
                v[None, None, :], rt[:, None, :], window_strides=(2,),
                padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(out)
        return f
    P["fir_conv_C1_1d"] = mk_conv1d

    def mk_convfold():
        rt = jnp.asarray(rt11)
        L = T // R
        def f(x):
            v = (x[:T].astype(jnp.float32) - 127.0).reshape(R, L)
            halo = jnp.concatenate(
                [jnp.zeros((1, HALO), jnp.float32), v[:-1, -HALO:]], axis=0)
            lhs = jnp.concatenate([halo, v], axis=1)[:, None, :]
            out = jax.lax.conv_general_dilated(
                lhs, rt[:, None, :], window_strides=(2,),
                padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(out)
        return f
    P["fir_conv_fold_batch"] = mk_convfold

    def mk_shiftadd():
        taps = rt11[0]
        L = T // R
        def f(x):
            v = (x[:T].astype(jnp.float32) - 127.0).reshape(R, L)
            halo = jnp.concatenate(
                [jnp.zeros((1, HALO), jnp.float32), v[:-1, -HALO:]], axis=0)
            ext = jnp.concatenate([halo, v], axis=1)
            acc = jnp.zeros((R, L), jnp.float32)
            for k in range(11):
                acc = acc + taps[k] * jax.lax.dynamic_slice_in_dim(ext, k, L, 1)
            return jnp.sum(acc)
        return f
    P["fir_shiftadd_fullrate"] = mk_shiftadd

    def mk_shiftadd_dec():
        # polyphase stride-2 via a [R, L/2, 2] reshape on the MAJOR axes:
        # even/odd phases become two [R, L/2] planes via one relayout
        taps = rt11[0]
        L = T // R
        def f(x):
            v = (x[:T].astype(jnp.float32) - 127.0).reshape(R, L)
            halo = jnp.concatenate(
                [jnp.zeros((1, HALO), jnp.float32), v[:-1, -HALO:]], axis=0)
            ext = jnp.concatenate([halo, v], axis=1)          # [R, L+10]
            acc = jnp.zeros((R, L), jnp.float32)
            for k in range(11):
                acc = acc + taps[k] * jax.lax.dynamic_slice_in_dim(ext, k, L, 1)
            # decimate: keep even time positions
            y = acc.reshape(R, L // 2, 2)[:, :, 0]
            return jnp.sum(y)
        return f
    P["fir_shiftadd_dec_reshape"] = mk_shiftadd_dec

    # matmul FIR: frames of 128 outputs as [L/128, 128+10] @ [138, 128]
    def mk_matmulfir():
        L = T // R
        K = 128
        band = np.zeros((K + HALO, K), np.float32)
        for j in range(K):
            band[j : j + 11, j] = rt11[0, ::-1]
        def f(x):
            v = (x[:T].astype(jnp.float32) - 127.0).reshape(R, L)
            halo = jnp.concatenate(
                [jnp.zeros((1, HALO), jnp.float32), v[:-1, -HALO:]], axis=0)
            ext = jnp.concatenate([halo, v], axis=1)          # [R, L+10]
            # frames: [R, L/K, K+10] — overlapping windows via two slices
            a = ext[:, :-HALO].reshape(R, L // K, K)
            b = ext[:, : HALO + (L // K - 1) * K + HALO]
            head = ext[:, 0 : L][:, :: 1]  # noop keep
            # build [R, L/K, K+10]: window w = ext[:, w*K : w*K + K+10]
            idx = (jnp.arange(L // K) * K)[:, None] + jnp.arange(K + HALO)[None, :]
            frames = ext[:, idx]                              # gather!
            y = jnp.einsum("rwk,kj->rwj", frames, jnp.asarray(band),
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(y)
        return f
    P["fir_matmul_banded_gather"] = mk_matmulfir

    return P


def main() -> int:
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", default=None)
    ap.add_argument("--n", type=int, nargs=2, default=(4, 16))
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    xs = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (args.n[1], 2 * T)).astype(np.uint8)))
    xs_s = xs[: args.n[0]]

    P = probes()
    names = [args.probe] if args.probe else list(P)
    for name in names:
        try:
            dt = honest(P[name], xs_s, xs)
            print(f"{name:28s} {dt * 1e6:10.0f} us", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED {str(e)[:120]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
