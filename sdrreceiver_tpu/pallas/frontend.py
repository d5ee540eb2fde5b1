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

__all__ = ["MixCascadeKernel", "supported", "warmup_len"]

LANES = 256  # default input samples per row
_HIST = 10  # half-band history (11 taps - 1)


def _tiling(t_len: int, stages: int) -> tuple[int, int] | None:
    """Pick (lanes, rows) for the time tiling ``[rows, lanes]`` per tile.

    Mosaic requires row-tile counts divisible by 8 unless the tile covers
    the whole row axis, so r is either an 8-multiple divisor of rows_total
    (preferring ~240-512: amortizes per-grid-step overhead while staying
    VMEM-comfortable) or all of it.  Measured round 4: narrower lanes (128)
    with more tiles ran ~4x SLOWER (tiny late-stage lane dims + per-step
    overhead), and a full single tile of [1500, 256] is fine — so 256 lanes
    is used unconditionally."""
    if t_len % LANES or (LANES >> stages) < 1:
        return None
    rows_total = t_len // LANES
    for cand in (512, 480, 448, 400, 384, 320, 256, 240, 192, 128, 96, 64,
                 48, 32, 16, 8):
        if rows_total % cand == 0:
            return LANES, cand
    return LANES, rows_total


def warmup_len(stages: int) -> int:
    """Input-halo length that washes a zero-initialized ``stages``-deep
    half-band cascade: stage s's 10-sample history is determined by the last
    ``10 * (2^{s+1} - 1)`` input samples, so after ``10 * (2^d - 1)`` inputs
    every output (and every stage tail) is independent of the initial
    histories.  Rounded up to a LANES multiple so a [halo | shard] extended
    block keeps the kernel's tiling constraints.  This is what lets a
    time-shard run the fused kernel with zero state: prepend this many
    neighbor samples, drop ``warmup >> stages`` outputs (dist/sharded.py)."""
    need = 10 * ((1 << stages) - 1)
    return max(LANES, -(-need // LANES) * LANES)


def supported(fs: int, stages: int, t_len: int) -> bool:
    """Static shape constraints for the fused kernel."""
    if stages > 7:
        return False
    tiling = _tiling(t_len, stages)
    if tiling is None:
        return False
    lanes, r = tiling
    # int32 phase-math bounds: row*a_row, lane*f_mod and tile*f_tile < 2^31
    if fs * max(r, lanes) >= 2**31:
        return False
    if (t_len // (lanes * r)) * fs >= 2**31:
        return False
    # the carried NCO phase state this kernel pairs with (kernels/nco.py)
    # requires fs * 2048 < 2^32 for its exact uint32 block advance
    if fs * 2048 >= 2**32:
        return False
    return True


def _band_matrices(taps: np.ndarray, stages: int, lanes: int):
    """Per-stage (Mz [l, l/2], Mt [16, l/2]) banded matrices.

    Output m of a row = conv at flat position 2m:  y[m] = sum_k c[k] z[2m-k],
    with z[-10..-1] provided by the tail block (placed at Mt rows 6..15,
    row j of Mt = sample offset j-16).
    """
    mats = []
    c = taps.astype(np.float32)
    for s in range(stages):
        l = lanes >> s
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
        precision: str | None = None,
        rows: int | None = None,
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
        self.lanes, self.rows = _tiling(t_len, stages)
        if rows is not None:  # benchmarking override (tools/kernel_probe.py)
            if (t_len // self.lanes) % rows or (
                rows % 8 and rows != t_len // self.lanes
            ):
                raise ValueError(f"invalid rows override {rows}")
            self.rows = rows
        if precision is None:
            import os

            precision = os.environ.get("SDRX_PALLAS_PRECISION", "highest")
        # Mosaic lowers only DEFAULT and HIGHEST dot precisions
        self.precision = {
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
        taps = design.half_band(11) if taps is None else np.asarray(taps)
        self.mats = _band_matrices(taps, stages, self.lanes)
        self.n_tiles = t_len // (self.lanes * self.rows)

        f = np.mod(np.asarray(freqs_hz, dtype=np.int64), fs).astype(np.int64)
        if f.shape != (channels,):
            raise ValueError(f"freqs shape {f.shape} != ({channels},)")
        # static per-channel int32 constants for exact in-kernel phase math
        self.f_mod = f.astype(np.int32)  # f mod fs
        self.a_row = ((f * self.lanes) % fs).astype(np.int32)  # per-row step
        self.f_tile = (
            (f * (self.lanes * self.rows)) % fs
        ).astype(np.int32)  # per-tile step
        self._call = jax.jit(self._build())

    # ------------------------------------------------------------------
    def _build(self):
        c_chan, d, fs = self.c, self.d, self.fs
        r, n_tiles = self.rows, self.n_tiles
        lanes = self.lanes
        l_out = lanes >> d
        mats = self.mats
        dot_prec = self.precision
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

            # ---- NCO phasor from exact integer phase, rank-1 factored ----
            # theta(row, lane) = theta_row(row) + theta_lane(lane): the
            # [r, lanes] phasor is the outer product of an [r, 1] row
            # phasor and a [1, lanes] lane phasor.  sin/cos run on r+lanes
            # elements instead of r*lanes (the full-rate transcendentals
            # were the single largest cost of the round-3 kernel), and the
            # mix applies both rotations as two cheap complex FMAs.  Both
            # factors use EXACT integer residues; the only extra rounding
            # is one f32 product per sample (~1e-7, far under the 60 dB
            # audio bound).
            phase0 = scal_ref[0, ci]
            f_mod = scal_ref[1, ci]
            a_row = scal_ref[2, ci]
            f_tile = scal_ref[3, ci]
            off = (phase0 + (ti * f_tile) % fs) % fs
            row_i = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
            m_row = (off + (row_i * a_row) % fs) % fs
            m_lane = (lane_i * f_mod) % fs
            th_row = m_row.astype(jnp.float32) * two_pi_over_fs
            th_lane = m_lane.astype(jnp.float32) * two_pi_over_fs
            cr, sr = jnp.cos(th_row), jnp.sin(th_row)  # [r, 1]
            cl, sl = jnp.cos(th_lane), jnp.sin(th_lane)  # [1, lanes]
            xr = xr_ref[0, :, :]
            xi = xi_ref[0, :, :]
            ar = xr * cl - xi * sl  # lane rotation (broadcast over rows)
            ai = xr * sl + xi * cl
            zr = ar * cr - ai * sr  # row rotation (broadcast over lanes)
            zi = ar * sr + ai * cr

            # ---- cascade ----
            row0 = jax.lax.broadcasted_iota(jnp.int32, (r, 16), 0) == 0
            planes = [zr, zi]
            for s in range(d):
                l = lanes >> s
                mz = mz_refs[s][:, :]
                mt = mt_refs[s][:, :]
                pq = pq_refs[s][:, :]
                for p in range(2):
                    z = planes[p]
                    # pq is a 0/1 selector; the copy must stay exact, and
                    # Mosaic lowers only DEFAULT/HIGHEST dots (DEFAULT
                    # would round the copied tails to bf16)
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
                        precision=dot_prec,
                    ) + jnp.dot(
                        shifted,
                        mt,
                        preferred_element_type=jnp.float32,
                        precision=dot_prec,
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
            pl.BlockSpec((1, r, lanes), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lanes), x_index, memory_space=pltpu.VMEM),
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
            xr3 = xr.reshape(n_in, n_tiles * r, lanes)
            xi3 = xi.reshape(n_in, n_tiles * r, lanes)
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
