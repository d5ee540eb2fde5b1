"""Validate + time the fused Pallas front end on the real TPU.

Compares the compiled MixCascadeKernel against the jnp conv path at bench
scale and times both.  Run manually (slow remote compile):
    python tools/tpu_validate_pallas.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from sdrreceiver_tpu.kernels import halfband, nco
from sdrreceiver_tpu.pallas.frontend import MixCascadeKernel


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    fs, stages = 1536000, 2
    t_len = 1536000
    c = 1
    freqs = np.array([484000])
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(t_len) + 1j * rng.standard_normal(t_len)).astype(
        np.complex64
    )
    xr = jnp.asarray(x.real.copy())[None, :]
    xi = jnp.asarray(x.imag.copy())[None, :]

    # jnp reference path (all state passed as args — the axon backend cannot
    # fetch closure-captured device arrays at trace time)
    st = nco.nco_init(freqs, fs)
    rt = halfband.cascade_taps(c)

    @jax.jit
    def jnp_path(st_arg, hists, xc):
        _, z = nco.mix_block(st_arg, xc, fs)
        _, y = halfband.cascade_apply(hists, z, rt)
        return y

    xc = jnp.asarray(x)
    hists0 = halfband.cascade_init(c, stages)
    jnp_path_run = lambda: jnp_path(st, hists0, xc)
    t0 = time.time()
    ref = jnp_path_run()
    jax.block_until_ready(ref)
    print(f"jnp compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    n = 20
    for _ in range(n):
        ref = jnp_path_run()
    jax.block_until_ready(ref)
    jnp_dt = (time.time() - t0) / n
    print(f"jnp path: {jnp_dt*1e3:.3f} ms/block -> {t_len/jnp_dt/1e9:.2f} Gsps")

    # fused kernel
    k = MixCascadeKernel(c, stages, fs, freqs, t_len)
    phase = jnp.zeros((c,), jnp.int32)
    h = k.init_hists()
    t0 = time.time()
    yr, yi, h2 = k(phase, h, xr, xi)
    jax.block_until_ready((yr, yi))
    print(f"pallas compile+run {time.time()-t0:.1f}s")
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    refn = np.asarray(ref)[0]
    err = np.abs(got - refn)
    scale = np.abs(refn).max()
    print(f"maxerr {err.max():.3e} (rel {err.max()/scale:.3e})")
    ok = err.max() / scale < 1e-4
    print("CORRECT" if ok else "WRONG")

    t0 = time.time()
    for _ in range(n):
        yr, yi, h2 = k(phase, h, xr, xi)
    jax.block_until_ready((yr, yi))
    pal_dt = (time.time() - t0) / n
    print(f"pallas: {pal_dt*1e3:.3f} ms/block -> {t_len/pal_dt/1e9:.2f} Gsps")
    print(f"speedup vs jnp: {jnp_dt/pal_dt:.2f}x")

    # deeper cascade (the 12 kHz sub-chain shape) at group rate
    fs2, st2, t2, c2 = 384000, 5, 384000 - 384000 % (256 * 8), 11
    freqs2 = (np.arange(c2) * 9000 + 110854) % fs2
    k2 = MixCascadeKernel(c2, st2, fs2, freqs2, t2)
    x2r = jnp.asarray(rng.standard_normal((c2, t2)).astype(np.float32))
    x2i = jnp.asarray(rng.standard_normal((c2, t2)).astype(np.float32))
    ph2 = jnp.zeros((c2,), jnp.int32)
    h2 = k2.init_hists()
    t0 = time.time()
    o = k2(ph2, h2, x2r, x2i)
    jax.block_until_ready(o[:2])
    print(f"bucket kernel compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(n):
        o = k2(ph2, h2, x2r, x2i)
    jax.block_until_ready(o[:2])
    dt2 = (time.time() - t0) / n
    print(f"bucket 11ch x5stage: {dt2*1e3:.3f} ms/block ({c2*t2/dt2/1e9:.2f} Gsps-chan)")


if __name__ == "__main__":
    main()
