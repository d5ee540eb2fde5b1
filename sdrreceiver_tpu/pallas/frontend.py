"""Fused NCO-mix + half-band-cascade Pallas TPU kernel (the hot front end).

Covers reference hot loops 2-3 (SURVEY.md section 3.3): per-sample NCO mixing
(vfo.cpp:237-245) and the chained 11-tap half-band decimators
(halfbanddecimator.cpp:43-72) — fused into ONE kernel so the full-rate stream
is read from HBM once and every intermediate stays in VMEM.

Formulation (chosen for the MXU and for Mosaic-safe ops only):

  * time is tiled as rows of 256 samples: ``[R, 256]`` f32 planes (I and Q
    separately — no complex dtypes on TPU)
  * the NCO phasor is regenerated in-kernel from exact integer phase
    arithmetic (same scheme as kernels.nco, zero drift) + VPU sin/cos
  * each /2 stage is TWO banded-matrix dots on the MXU:
        y = z @ Mz  +  shifted_tails @ Mt
    where Mz[p, m] = c[2m - (p - ...)] encodes "conv + keep even phases" and
    Mt injects the 10 cross-row history samples; lanes halve per stage
    (256 -> 128 -> ... ) while R stays constant, so no reshapes are needed
  * cross-row history = ``pltpu.roll`` by one row + masking row 0 with the
    carried block-boundary state (the reference's FIRQueueBackToFront,
    jonti/dsp.cpp:163-173, lives in VMEM scratch between grid steps)
  * grid = (channels, time_tiles); TPU grids iterate sequentially with the
    last axis fastest, so each channel streams its tiles in order while the
    scratch carries its running tails; at tile 0 the scratch is (re)loaded
    from that channel's carried state input

Mosaic notes (validated on TPU v5e): sublane-offset *writes* and row-merging
reshapes hang or miscompile this backend's Mosaic pipeline — this kernel uses
only full-block writes, lane-offset reads, roll, iota/where, and dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import design

__all__ = ["MixCascadeKernel", "supported"]

LANES = 256  # input samples per row
_HIST = 10  # half-band history (11 taps - 1)


def supported(fs: int, stages: int, t_len: int) -> bool:
    """Static shape constraints for the fused kernel."""
    if t_len % LANES:
        return False
    if LANES >> stages < 1 or stages > 7:
        return False
    # int32 phase-math bounds: row*a_row and tile*f_tile stay < 2^31
    # (rows <= 512 by construction; tiles = t_len/(256*rows))
    if fs * 512 >= 2**31:
        return False
    if (t_len // (LANES * 8)) * fs >= 2**31:  # worst case rows=8
        return False
    return True


def _band_matrices(taps: np.ndarray, stages: int):
    """Per-stage (Mz [l, l/2], Mt [16, l/2]) banded matrices.

    Output m of a row = conv at flat position 2m:  y[m] = sum_k c[k] z[2m-k],
    with z[-10..-1] provided by the tail block (placed at Mt rows 6..15,
    row j of Mt = sample offset j-16).
    """
    mats = []
    c = taps.astype(np.float32)
    for s in range(stages):
        l = LANES >> s
        mz = np.zeros((l, l // 2), np.float32)
        mt = np.zeros((16, l // 2), np.float32)
        for m in range(l // 2):
            for p in range(l):
                k = 2 * m - p
                if 0 <= k <= _HIST:
                    mz[p, m] = c[k]
            for j in range(16):
                k = 2 * m - (j - 16)
                if 0 <= k <= _HIST:
                    mt[j, m] = c[k]
        # tail-extraction placement: tails16 = z @ pq puts the row's last 10
        # samples at slots 6..15 (scatter/.at[].set has no Mosaic lowering)
        pq = np.zeros((l, 16), np.float32)
        for j in range(_HIST):
            pq[l - _HIST + j, 6 + j] = 1.0
        mats.append((mz, mt, pq))
    return mats


class MixCascadeKernel:
    """Compiled fused front end for one (channel-batch, schedule) pair.

    ``__call__(phase, hists, xr, xi) -> (yr, yi, new_hists)`` where
      phase  int32 ``[C]`` NCO phase numerators (cycles * fs)
      hists  f32 ``[stages, C, 16]`` carried tails (last 10 samples per stage
             in slots 6..15, matching Mt's row layout)
      xr/xi  f32 ``[C, T]`` input planes
      yr/yi  f32 ``[C, T >> stages]`` decimated output planes
    """

    def __init__(
        self,
        channels: int,
        stages: int,
        fs: int,
        freqs_hz,
        t_len: int,
        taps: np.ndarray | None = None,
        interpret: bool = False,
        shared_input: bool = False,
    ):
        """``shared_input``: all channels mix the SAME input stream (the
        sub-VFO fan-out case, sdrj.cpp:288-294) — pass xr/xi as ``[1, T]``
        and every channel's grid step reads that one block (no [C, T]
        broadcast materialization in HBM)."""
        self.shared_input = bool(shared_input)
        if not supported(fs, stages, t_len):
            raise ValueError(
                f"unsupported fused shape: fs={fs} stages={stages} t_len={t_len}"
            )
        self.c = channels
        self.d = stages
        self.fs = fs
        self.t_len = t_len
        self.interpret = interpret
        taps = design.half_band(11) if taps is None else np.asarray(taps)
        self.mats = _band_matrices(taps, stages)

        rows_total = t_len // LANES
        r = rows_total
        for cand in (512, 480, 448, 384, 320, 256, 240, 192, 128, 96, 64, 48, 32, 16, 8):
            if rows_total % cand == 0:
                r = cand
                break
        self.rows = r
        self.n_tiles = rows_total // r

        f = np.mod(np.asarray(freqs_hz, dtype=np.int64), fs).astype(np.int64)
        if f.shape != (channels,):
            raise ValueError(f"freqs shape {f.shape} != ({channels},)")
        # static per-channel int32 constants for exact in-kernel phase math
        self.f_mod = f.astype(np.int32)  # f mod fs
        self.a_row = ((f * LANES) % fs).astype(np.int32)  # (f*256) mod fs
        self.f_tile = ((f * (LANES * r)) % fs).astype(np.int32)  # per-tile step
        self._call = jax.jit(self._build())

    # ------------------------------------------------------------------
    def _build(self):
        c_chan, d, fs = self.c, self.d, self.fs
        r, n_tiles = self.rows, self.n_tiles
        l_out = LANES >> d
        mats = self.mats
        two_pi_over_fs = np.float32(2.0 * np.pi / fs)

        def kernel(scal_ref, xr_ref, xi_ref, *refs):
            # refs: d*(mz, mt, pq) consts, then 2d hist-in, then outputs:
            mz_refs = [refs[3 * s] for s in range(d)]
            mt_refs = [refs[3 * s + 1] for s in range(d)]
            pq_refs = [refs[3 * s + 2] for s in range(d)]
            base = 3 * d
            hin_refs = refs[base : base + 2 * d]  # per stage: r-plane, i-plane
            base += 2 * d
            yr_ref, yi_ref = refs[base], refs[base + 1]
            hr_out = refs[base + 2 : base + 2 + 2 * d]
            scratch = refs[base + 2 + 2 * d :]  # 2d VMEM [1, 16] tails

            ci = pl.program_id(0)
            ti = pl.program_id(1)

            # (re)load carried tails at each channel's first tile
            @pl.when(ti == 0)
            def _():
                for s in range(2 * d):
                    scratch[s][:, :] = hin_refs[s][0, :, :]

            # ---- NCO phasor from exact integer phase ----
            phase0 = scal_ref[0, ci]
            f_mod = scal_ref[1, ci]
            a_row = scal_ref[2, ci]
            f_tile = scal_ref[3, ci]
            off = (phase0 + (ti * f_tile) % fs) % fs
            row_i = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (r, LANES), 1)
            m = (off + (row_i * a_row) % fs + (lane_i * f_mod) % fs) % fs
            theta = m.astype(jnp.float32) * two_pi_over_fs
            cosv = jnp.cos(theta)
            sinv = jnp.sin(theta)
            xr = xr_ref[0, :, :]
            xi = xi_ref[0, :, :]
            zr = xr * cosv - xi * sinv
            zi = xr * sinv + xi * cosv

            # ---- cascade ----
            row0 = jax.lax.broadcasted_iota(jnp.int32, (r, 16), 0) == 0
            planes = [zr, zi]
            for s in range(d):
                l = LANES >> s
                mz = mz_refs[s][:, :]
                mt = mt_refs[s][:, :]
                pq = pq_refs[s][:, :]
                for p in range(2):
                    z = planes[p]
                    tails = jnp.dot(
                        z,
                        pq,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    rolled = pltpu.roll(tails, 1, 0)
                    carried = scratch[2 * s + p][:, :]  # [1, 16], broadcasts
                    shifted = jnp.where(row0, carried, rolled)
                    # stash this tile's last-row tails for the next tile
                    scratch[2 * s + p][:, :] = rolled[0:1, :]
                    y = jnp.dot(
                        z,
                        mz,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    ) + jnp.dot(
                        shifted,
                        mt,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    planes[p] = y

            yr_ref[0, :, :] = planes[0]
            yi_ref[0, :, :] = planes[1]
            for s in range(2 * d):
                hr_out[s][0, :, :] = scratch[s][:, :]

        # ---- pallas_call wiring ----
        grid = (c_chan, n_tiles)
        if self.shared_input:
            x_index = lambda ci, ti: (0, ti, 0)
        else:
            x_index = lambda ci, ti: (ci, ti, 0)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [4, C]
            pl.BlockSpec((1, r, LANES), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, LANES), x_index, memory_space=pltpu.VMEM),
        ]
        for s in range(self.d):
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # mz
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # mt
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # pq
        for _ in range(2 * self.d):  # hist in [C, 1, 16]
            in_specs.append(
                pl.BlockSpec((1, 1, 16), lambda ci, ti: (ci, 0, 0), memory_space=pltpu.VMEM)
            )

        out_shapes = [
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
        ] + [
            jax.ShapeDtypeStruct((c_chan, 1, 16), jnp.float32)
            for _ in range(2 * self.d)
        ]
        out_specs = [
            pl.BlockSpec((1, r, l_out), lambda ci, ti: (ci, ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, l_out), lambda ci, ti: (ci, ti, 0), memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, 1, 16), lambda ci, ti: (ci, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(2 * self.d)
        ]
        scratch_shapes = [pltpu.VMEM((1, 16), jnp.float32) for _ in range(2 * self.d)]

        mats_flat = []
        for mz, mt, pq in mats:
            mats_flat += [mz, mt, pq]
        interpret = self.interpret

        shared = self.shared_input

        def call(phase, hists, xr, xi):
            # hists [d, C, 2, 16] -> per-(stage,plane) [C, 1, 16] inputs
            scal = jnp.stack(
                [
                    phase.astype(jnp.int32),
                    jnp.asarray(self.f_mod),
                    jnp.asarray(self.a_row),
                    jnp.asarray(self.f_tile),
                ]
            )
            n_in = 1 if shared else c_chan
            xr3 = xr.reshape(n_in, n_tiles * r, LANES)
            xi3 = xi.reshape(n_in, n_tiles * r, LANES)
            hist_args = []
            for s in range(d):
                for p in range(2):
                    hist_args.append(hists[s, :, p, :].reshape(c_chan, 1, 16))
            outs = pl.pallas_call(
                kernel,
                grid=grid,
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(scal, xr3, xi3, *mats_flat, *hist_args)
            yr = outs[0].reshape(c_chan, -1)
            yi = outs[1].reshape(c_chan, -1)
            if d == 0:
                return yr, yi, hists
            new_h = jnp.stack(
                [
                    jnp.stack(
                        [outs[2 + 2 * s][:, 0, :], outs[2 + 2 * s + 1][:, 0, :]],
                        axis=1,
                    )
                    for s in range(d)
                ]
            )
            return yr, yi, new_h

        return call

    # ------------------------------------------------------------------
    def init_hists(self) -> jnp.ndarray:
        """Zero carried tails: ``[stages, C, 2, 16]`` (slots 6..15 live)."""
        return jnp.zeros((self.d, self.c, 2, 16), jnp.float32)

    def __call__(self, phase, hists, xr, xi):
        return self._call(phase, hists, xr, xi)
