"""Fused NCO-mix + half-band-cascade Pallas TPU kernel (the hot front end).

Covers reference hot loops 2-3 (SURVEY.md section 3.3): per-sample NCO mixing
(vfo.cpp:237-245) and the chained 11-tap half-band decimators
(halfbanddecimator.cpp:43-72) — fused into ONE kernel so the full-rate stream
is read from HBM once and every intermediate stays in VMEM.

Formulation (round 4 — the "composite" kernel):

  * time is tiled as rows of 256 samples: ``[R, 256]`` f32 planes (I and Q
    separately — no complex dtypes on TPU)
  * the NCO phasor is EXACT-integer-phase, rank-1 factored: sin/cos run on
    r + 256 elements (row phasor x lane phasor), and the mix applies both
    rotations as two broadcast complex FMAs
  * the d-stage /2 cascade is collapsed by the noble identity into ONE
    composite FIR h (x) (h^2) (x) ... (x) (h^(2^(d-1))) of length
    10*(2^d - 1) + 1, evaluated at stride 2^d as ONE banded-matrix MXU dot
    per plane (round 5 — the "concatenated band" form):

        yp = z @ [M0 | M1 | ... | MK]        (one [r, 256] x [256, W] dot)
        y  = yp[:, :l] + roll(yp[:, l:2l], 1) + roll(yp[:, 2l:3l], 2) + ..

    where Mk[j, m] = hc[m*2^d - j + k*256] is the contribution of input
    rows k back, l = l_out = 256 >> d and W = (K+1)*l.  Rolling the
    narrow OUTPUT blocks ([r, l_out]) replaces rolling the wide INPUT
    plane ([r, 256]) K times and collapses K+1 skinny dots into one:
    measured on v5e (round 5), the d=5 11-channel bucket kernel's dot
    chain fell 214 -> 90 us — the big sublane rolls and per-dot overhead,
    not the MACs, were the cost.  (Round 4 ran y = sum_k prev_k(z) @ Mk
    with prev_k = pltpu.roll(z, k, 0); round 3's per-stage ladder was
    slower still.)  The composite form also does FEWER MACs than the
    staged cascade (311/32 vs ~21 per input sample at d=5).
  * NO carried filter state: the caller prepends ``warmup_len(d)`` input
    samples (the carried ``xtail`` state or the left time-shard's halo —
    dist/sharded.py uses the identical scheme) and drops the warm-up
    outputs; a zero-state FIR forgets its initialization after its extent,
    so the post-warmup outputs are exactly the streamed ones.  Cross-TILE
    continuity inside one call is a [1, 256] scratch row per plane per
    prev-depth (whole-buffer writes only — Mosaic-safe).
  * grid = (channels, time_tiles); TPU grids iterate sequentially with the
    last axis fastest, so each channel streams its tiles in order while the
    scratch carries its trailing rows; at tile 0 the scratch zeroes (the
    warm-up prefix absorbs it)

Mosaic notes (validated on TPU v5e): sublane-offset *writes* and row-merging
reshapes hang or miscompile this backend's Mosaic pipeline — this kernel uses
only full-block writes, sublane/lane-offset reads, row rolls, iota/where,
and dots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import design

__all__ = [
    "MixCascadeKernel",
    "supported",
    "warmup_len",
    "pick_warmup",
    "composite_taps",
]

LANES = 256  # input samples per row
_HIST = 10  # half-band history (11 taps - 1)


def composite_taps(stages: int, taps=None) -> np.ndarray:
    """The d-stage /2 cascade as ONE input-rate FIR (noble identity):
    ``hc = h * (h up 2) * (h up 4) * ...``, length ``10*(2^d - 1) + 1``;
    the cascade output is ``y[m] = sum_q hc[q] x[2^d m - q]``.  float64
    accumulation, f32 cast at the end."""
    h = np.asarray(
        design.half_band(11) if taps is None else taps, dtype=np.float64
    )
    hc = np.array([1.0])
    for s in range(stages):
        up = np.zeros((len(h) - 1) * (1 << s) + 1)
        up[:: 1 << s] = h
        hc = np.convolve(hc, up)
    return hc.astype(np.float32)


def warmup_len(stages: int) -> int:
    """Input-halo length that washes out a zero-state composite cascade
    filter, rounded up to a LANES multiple (whole rows).  The filter
    extent is ``10*(2^d - 1)``; an extra ``10*2^(d-1)`` guarantees the
    LAST stage's final 10 input samples are also exact, which is what
    lets per-stage canonical histories be re-derived from a stream tail
    (halfband.cascade_tails_from_tail).  Callers prepend this many
    samples (carried xtail / left-shard halo) and drop
    ``warmup_len >> stages`` outputs."""
    need = 10 * ((1 << stages) - 1) + 10 * (1 << max(stages - 1, 0))
    return max(LANES, -(-need // LANES) * LANES)


def pick_warmup(stages: int, data_len: int, fs: int,
                base: int | None = None) -> int:
    """Warm-up length for a kernel over ``data_len`` samples: at least
    :func:`warmup_len`, padded by whole rows so ``data_len + warm`` tiles
    well.  The padding matters because the int32 phase bound caps the row
    count per tile at ``2^31 / fs`` — e.g. 1.536 Ms + one warm-up row is
    6001 rows, which has no 8-multiple divisor, forcing an unsupported
    6001-row single tile; +48 rows tiles as 27 x 224.  Extra warm-up is
    harmless (more washout, more dropped outputs, <=2% extra samples);
    the largest supported per-tile row count wins (ties -> least warm)."""
    if base is None:
        base = warmup_len(stages)
    fallback = None
    for extra in range(65):
        warm = base + extra * LANES
        t = data_len + warm
        if t % LANES:
            break  # data_len not row-aligned; padding can't fix that
        if not supported(fs, stages, t):
            continue
        if fallback is None:
            fallback = warm
        lanes, r = _tiling(t, stages)
        # smallest warm whose tiling is decent: one full-axis tile (the
        # best-measured shape when the phase bound allows it) or >= 32
        # rows per tile (tile-count penalties are mild beyond that)
        if r == t // lanes or r >= 32:
            return warm
    return base if fallback is None else fallback


def _tiling(t_len: int, stages: int) -> tuple[int, int] | None:
    """(lanes, rows) per tile: rows is an 8-multiple divisor of the row
    count (Mosaic's sublane rule) or all of it; measured round 4: tile
    count barely matters (320 us at 5, 15 or 125 tiles for the same work),
    so any compliant choice is fine."""
    if t_len % LANES or (LANES >> stages) < 1:
        return None
    rows_total = t_len // LANES
    for cand in (512, 480, 448, 400, 384, 320, 256, 240, 192, 128, 96, 64,
                 48, 32, 16, 8):
        if rows_total % cand == 0:
            return LANES, cand
    return LANES, rows_total


def supported(fs: int, stages: int, t_len: int) -> bool:
    """Static shape constraints for the fused kernel (``t_len`` INCLUDES
    the warm-up prefix)."""
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


def _band_matrices(hc: np.ndarray, stages: int, lanes: int):
    """(n_prev + 1) banded matrices [lanes, lanes >> d]:

        y[row, m] = sum_k  prev_k(z)[row] @ Mk[:, m]

    where prev_k is z rolled back k rows; Mk[j, m] = hc[m*2^d - j + k*lanes]
    (column j of prev_k holds z[(row-k)*lanes + j])."""
    l_out = lanes >> stages
    dec = 1 << stages
    n_prev = -(-(len(hc) - 1) // lanes)
    mats = []
    for k in range(n_prev + 1):
        m = np.zeros((lanes, l_out), np.float32)
        for out in range(l_out):
            for j in range(lanes):
                q = out * dec - j + k * lanes
                if 0 <= q < len(hc):
                    m[j, out] = hc[q]
        mats.append(m)
    return mats


class MixCascadeKernel:
    """Compiled fused front end for one (channel-batch, schedule) pair.

    ``__call__(phase, xr, xi) -> (yr, yi)`` where
      phase  int32 ``[C]`` NCO phase numerators at the FIRST input sample
             (callers feeding a warm-up prefix pass the phase at the
             prefix start — see ``phase_back`` for the exact offset math)
      xr/xi  f32 ``[C, T]`` (or ``[1, T]`` with shared_input) planes,
             warm-up prefix included
      yr/yi  f32 ``[C, T >> stages]`` decimated output planes (drop the
             first ``warmup_len >> stages`` columns for streamed outputs)

    Stateless by design: streaming continuity comes from the warm-up
    prefix (see module docstring), which is also what makes the SAME
    kernel per-time-shard-callable under shard_map (dist/sharded.py).
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
        # ``stages`` may be one int (all channels share a schedule — the
        # bucket case) or a per-channel sequence (the merged-groups case:
        # several main VFOs mixing the same full-rate stream with DIFFERENT
        # cascade depths; each channel gets its own band matrices, padded
        # to the widest output, and __call__ returns the raw [C, R, l_out]
        # planes for the caller to slice per channel)
        self.multi = not np.isscalar(stages)
        self.stages_list = (
            [int(d) for d in stages] if self.multi else [int(stages)] * channels
        )
        d_chk = max(self.stages_list)
        if not supported(fs, d_chk, t_len):
            raise ValueError(
                f"unsupported fused shape: fs={fs} stages={stages} t_len={t_len}"
            )
        self.c = channels
        self.d = d_chk
        self.fs = fs
        self.t_len = t_len
        self.interpret = interpret
        self.lanes, self.rows = _tiling(t_len, d_chk)
        if rows is not None:  # benchmarking override (tools/kernel_probe.py)
            if (t_len // self.lanes) % rows or (
                rows % 8 and rows != t_len // self.lanes
            ):
                raise ValueError(f"invalid rows override {rows}")
            self.rows = rows
        if precision is None:
            import os

            precision = os.environ.get("SDRX_PALLAS_PRECISION", "highest")
        # Mosaic lowers only DEFAULT and HIGHEST dot precisions natively;
        # "bf16x3" hand-rolls a 3-pass split (z_hi@M_hi + z_lo@M_hi +
        # z_hi@M_lo, all DEFAULT).  Measured r4 (same session): bf16x3 ==
        # HIGHEST in cost (~1.44 ms step vs DEFAULT 0.78 ms) — Mosaic's
        # HIGHEST is evidently already a bf16x3 pass — so HIGHEST is the
        # default (full accuracy at the same price); DEFAULT stays
        # available for experiments but bf16-rounds the filter taps
        # (-54 dB response error) and the signal (-48 dB broadband).
        if precision not in ("default", "highest", "bf16x3"):
            raise ValueError(f"unknown precision {precision!r}")
        self.prec_mode = precision
        self.l_out = self.lanes >> min(self.stages_list)
        per_chan = [
            _band_matrices(composite_taps(d, taps), d, self.lanes)
            for d in self.stages_list
        ]
        self.n_prev = max(len(m) - 1 for m in per_chan)
        # ONE concatenated band matrix [lanes, W], W = (n_prev+1)*l_out:
        # block k holds Mk (the contribution of input rows k back); the
        # kernel does a single dot and rolls the narrow output blocks
        # (module docstring).  Multi: per-channel stack [C, lanes, W],
        # zero-padded in both the output columns (shallower channels emit
        # more outputs) and the prev depth (deeper channels reach back
        # further).
        w_cat = (self.n_prev + 1) * self.l_out
        if self.multi:
            mcat = np.zeros((channels, self.lanes, w_cat), np.float32)
            for ci, mc in enumerate(per_chan):
                for k, mk in enumerate(mc):
                    mcat[ci, :, k * self.l_out : k * self.l_out + mk.shape[1]] = mk
        else:
            mcat = np.zeros((self.lanes, w_cat), np.float32)
            for k, mk in enumerate(per_chan[0]):
                mcat[:, k * self.l_out : k * self.l_out + mk.shape[1]] = mk
        self.mats = [mcat]
        self.n_tiles = t_len // (self.lanes * self.rows)
        if self.n_prev > self.rows:
            raise ValueError("tile too short for the composite band reach")

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

    def phase_back(self, phase, n_back: int):
        """Phase ``n_back`` samples BEFORE ``phase`` (uint32 [C] exact):
        what __call__ wants when the input is prefixed with n_back warm-up
        samples."""
        back = (self.f_mod.astype(np.int64) * n_back) % self.fs
        return (
            phase.astype(jnp.uint32)
            + jnp.asarray((self.fs - back).astype(np.uint32))
        ) % jnp.uint32(self.fs)

    # ------------------------------------------------------------------
    def _build(self):
        if (self.shared_input and self.c > 1
                and (self.n_tiles == 1 or self.c <= 8)):
            # shared-input multi-channel (sub-VFO buckets, merged group
            # fronts): grid over TILES only, looping channels in-kernel,
            # so the shared input block is DMA'd ONCE per tile instead of
            # once per (channel, tile) — measured 266 -> 159 us for c=22
            # d=5 on v5e (round 5), bit-identical.  Cross-tile carry uses
            # statically-indexed per-channel scratch (a Python loop over
            # channels, so no dynamic sublane-offset writes); gated to
            # C <= 8 for multi-tile shapes to bound the scratch count
            # (single-tile shapes need no scratch at all — the warm-up
            # prefix absorbs the zero boundary).
            return self._build_chanloop()
        return self._build_grid()

    def _build_chanloop(self):
        c_chan, fs = self.c, self.fs
        r, n_tiles = self.rows, self.n_tiles
        lanes = self.lanes
        l_out = self.l_out
        multi = self.multi
        n_prev = self.n_prev
        prec_mode = self.prec_mode
        split = prec_mode == "bf16x3"
        if split:
            import ml_dtypes

            mats_hi = [
                m.astype(ml_dtypes.bfloat16).astype(np.float32)
                for m in self.mats
            ]
            mats_in = mats_hi + [m - h for m, h in zip(self.mats, mats_hi)]
        else:
            mats_in = list(self.mats)
        n_mats = len(mats_in)
        dot_prec = {
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST,
            "bf16x3": jax.lax.Precision.DEFAULT,
        }[prec_mode]
        two_pi_over_fs = np.float32(2.0 * np.pi / fs)

        def kernel(scal_ref, xr_ref, xi_ref, *refs):
            yr_ref, yi_ref = refs[n_mats], refs[n_mats + 1]
            # per (channel, plane, prev-depth) trailing-yp-row scratch,
            # indexed STATICALLY by the Python channel loop (no dynamic
            # sublane-offset writes — the Mosaic hazard)
            scr = refs[n_mats + 2 :]
            ti = pl.program_id(0)

            if scr:
                @pl.when(ti == 0)
                def _():
                    for s in scr:
                        s[:, :] = jnp.zeros_like(s[:, :])

            def m_ref(k, ci):
                if multi:
                    return refs[k][ci, :, :]
                return refs[k][:, :]

            def band_dot(op, ci):
                mh = m_ref(0, ci)
                if split:
                    hi = op.astype(jnp.bfloat16).astype(jnp.float32)
                    lo = op - hi
                    ml = m_ref(1, ci)
                    return (
                        jnp.dot(hi, mh, preferred_element_type=jnp.float32,
                                precision=dot_prec)
                        + jnp.dot(lo, mh, preferred_element_type=jnp.float32,
                                  precision=dot_prec)
                        + jnp.dot(hi, ml, preferred_element_type=jnp.float32,
                                  precision=dot_prec)
                    )
                return jnp.dot(op, mh, preferred_element_type=jnp.float32,
                               precision=dot_prec)

            row_i = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
            xr = xr_ref[0, :, :]
            xi = xi_ref[0, :, :]
            for ci in range(c_chan):
                phase0 = scal_ref[0, ci]
                f_mod = scal_ref[1, ci]
                a_row = scal_ref[2, ci]
                f_tile = scal_ref[3, ci]
                off = (phase0 + (ti * f_tile) % fs) % fs
                m_row = (off + (row_i * a_row) % fs) % fs
                m_lane = (lane_i * f_mod) % fs
                th_row = m_row.astype(jnp.float32) * two_pi_over_fs
                th_lane = m_lane.astype(jnp.float32) * two_pi_over_fs
                cr, sr = jnp.cos(th_row), jnp.sin(th_row)
                cl, sl = jnp.cos(th_lane), jnp.sin(th_lane)
                ar = xr * cl - xi * sl
                ai = xr * sl + xi * cl
                zr = ar * cr - ai * sr
                zi = ar * sr + ai * cr
                for p, (z, y_ref) in enumerate(((zr, yr_ref), (zi, yi_ref))):
                    sc = (scr[(ci * 2 + p) * n_prev : (ci * 2 + p + 1) * n_prev]
                          if scr else [])
                    yp = band_dot(z, ci)
                    acc = yp[:, :l_out]
                    for k in range(1, n_prev + 1):
                        sh = pltpu.roll(
                            yp[:, k * l_out : (k + 1) * l_out], k, 0
                        )
                        for j in range(k):
                            boundary = (
                                sc[n_prev - k + j][
                                    0:1, k * l_out : (k + 1) * l_out
                                ]
                                if sc
                                else jnp.zeros_like(sh[0:1])
                            )
                            sh = jnp.where(row_i == j, boundary, sh)
                        acc = acc + sh
                    y_ref[ci, :, :] = acc
                    for j in range(n_prev):
                        if sc:
                            sc[j][:, :] = yp[
                                r - n_prev + j : r - n_prev + j + 1, :
                            ]

        mat_spec = (
            pl.BlockSpec((c_chan, lanes, (n_prev + 1) * l_out),
                         lambda ti: (0, 0, 0), memory_space=pltpu.VMEM)
            if multi
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [4, C]
            pl.BlockSpec((1, r, lanes), lambda ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lanes), lambda ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
        ] + [mat_spec for _ in range(n_mats)]
        out_shapes = [
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((c_chan, r, l_out), lambda ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_chan, r, l_out), lambda ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
        ]
        w_cat = (n_prev + 1) * l_out
        scratch_shapes = (
            []
            if n_tiles == 1
            else [pltpu.VMEM((1, w_cat), jnp.float32)
                  for _ in range(2 * n_prev * c_chan)]
        )
        interpret = self.interpret

        def call(phase, xr, xi):
            scal = jnp.stack(
                [
                    phase.astype(jnp.int32),
                    jnp.asarray(self.f_mod),
                    jnp.asarray(self.a_row),
                    jnp.asarray(self.f_tile),
                ]
            )
            xr3 = xr if xr.ndim == 3 else xr.reshape(1, n_tiles * r, lanes)
            xi3 = xi if xi.ndim == 3 else xi.reshape(1, n_tiles * r, lanes)
            outs = pl.pallas_call(
                kernel,
                grid=(n_tiles,),
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(scal, xr3, xi3, *(jnp.asarray(m) for m in mats_in))
            if multi:
                return outs[0], outs[1]  # [C, R, l_out]; caller slices
            return (
                outs[0].reshape(c_chan, -1),
                outs[1].reshape(c_chan, -1),
            )

        return call

    def _build_grid(self):
        c_chan, d, fs = self.c, self.d, self.fs
        r, n_tiles = self.rows, self.n_tiles
        lanes = self.lanes
        l_out = self.l_out
        multi = self.multi
        n_prev = self.n_prev
        prec_mode = self.prec_mode
        split = prec_mode == "bf16x3"
        if split:
            # host-side split of each band matrix into exact bf16 head +
            # f32 residual; the kernel gets both (ml_dtypes = numpy bf16,
            # no device round-trip at build time)
            import ml_dtypes

            mats_hi = [
                m.astype(ml_dtypes.bfloat16).astype(np.float32)
                for m in self.mats
            ]
            mats_in = mats_hi + [
                m - h for m, h in zip(self.mats, mats_hi)
            ]
        else:
            mats_in = list(self.mats)
        n_mats = len(mats_in)
        dot_prec = {
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST,
            "bf16x3": jax.lax.Precision.DEFAULT,
        }[prec_mode]
        two_pi_over_fs = np.float32(2.0 * np.pi / fs)

        def kernel(scal_ref, xr_ref, xi_ref, *refs):
            if multi:  # per-channel band matrices: [1, lanes, l_out] blocks
                m_refs = [lambda mr=refs[k]: mr[0, :, :] for k in range(n_mats)]
            else:
                m_refs = [lambda mr=refs[k]: mr[:, :] for k in range(n_mats)]
            yr_ref, yi_ref = refs[n_mats], refs[n_mats + 1]
            # per plane, n_prev trailing-row buffers [1, lanes]
            scr = refs[n_mats + 2 :]

            ci = pl.program_id(0)
            ti = pl.program_id(1)

            @pl.when(ti == 0)
            def _():
                for s in scr:
                    s[:, :] = jnp.zeros_like(s[:, :])

            # ---- NCO phasor from exact integer phase, rank-1 factored ----
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

            # ---- composite cascade: ONE concatenated-band dot per plane,
            # then roll the narrow output blocks (module docstring) ----
            def band_dot(op):
                mh = m_refs[0]()
                if split:
                    hi = op.astype(jnp.bfloat16).astype(jnp.float32)
                    lo = op - hi
                    ml = m_refs[1]()
                    return (
                        jnp.dot(hi, mh, preferred_element_type=jnp.float32,
                                precision=dot_prec)
                        + jnp.dot(lo, mh, preferred_element_type=jnp.float32,
                                  precision=dot_prec)
                        + jnp.dot(hi, ml, preferred_element_type=jnp.float32,
                                  precision=dot_prec)
                    )
                return jnp.dot(op, mh, preferred_element_type=jnp.float32,
                               precision=dot_prec)

            for p, (z, y_ref) in enumerate(((zr, yr_ref), (zi, yi_ref))):
                sc = scr[p * n_prev : (p + 1) * n_prev]
                yp = band_dot(z)  # [r, (n_prev+1)*l_out]
                acc = yp[:, :l_out]
                for k in range(1, n_prev + 1):
                    blk = yp[:, k * l_out : (k + 1) * l_out]
                    sh = pltpu.roll(blk, k, 0)
                    # rows j < k belong to the previous tile: trailing-row
                    # yp scratch sc[n_prev - k + j] (zeros at tile 0)
                    for j in range(k):
                        sh = jnp.where(
                            row_i == j,
                            sc[n_prev - k + j][
                                0:1, k * l_out : (k + 1) * l_out
                            ],
                            sh,
                        )
                    acc = acc + sh
                y_ref[0, :, :] = acc
                # stash this tile's trailing yp rows for the next tile
                # (whole-buffer writes only; sublane/lane-offset READS are
                # fine)
                for j in range(n_prev):
                    sc[j][:, :] = yp[r - n_prev + j : r - n_prev + j + 1, :]

        # ---- pallas_call wiring ----
        grid = (c_chan, n_tiles)
        if self.shared_input:
            x_index = lambda ci, ti: (0, ti, 0)
        else:
            x_index = lambda ci, ti: (ci, ti, 0)
        w_cat = (n_prev + 1) * l_out
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [4, C]
            pl.BlockSpec((1, r, lanes), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, lanes), x_index, memory_space=pltpu.VMEM),
        ] + [
            (
                pl.BlockSpec((1, lanes, w_cat), lambda ci, ti: (ci, 0, 0),
                             memory_space=pltpu.VMEM)
                if multi
                else pl.BlockSpec(memory_space=pltpu.VMEM)
            )
            for _ in range(n_mats)
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
            jax.ShapeDtypeStruct((c_chan, n_tiles * r, l_out), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec((1, r, l_out), lambda ci, ti: (ci, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, l_out), lambda ci, ti: (ci, ti, 0),
                         memory_space=pltpu.VMEM),
        ]
        scratch_shapes = [
            pltpu.VMEM((1, w_cat), jnp.float32) for _ in range(2 * n_prev)
        ]
        interpret = self.interpret
        shared = self.shared_input

        def call(phase, xr, xi):
            scal = jnp.stack(
                [
                    phase.astype(jnp.int32),
                    jnp.asarray(self.f_mod),
                    jnp.asarray(self.a_row),
                    jnp.asarray(self.f_tile),
                ]
            )
            n_in = 1 if shared else c_chan
            # accept pre-shaped [n_in, R, lanes] row planes: the 1-D->rows
            # reshape at this boundary is an XLA layout conversion costing
            # ~170 us per plane-pair on a 1.536 Ms block (round 5) unless
            # the producer already emits rows
            xr3 = xr if xr.ndim == 3 else xr.reshape(n_in, n_tiles * r, lanes)
            xi3 = xi if xi.ndim == 3 else xi.reshape(n_in, n_tiles * r, lanes)
            outs = pl.pallas_call(
                kernel,
                grid=grid,
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(scal, xr3, xi3, *(jnp.asarray(m) for m in mats_in))
            if multi:
                return outs[0], outs[1]  # [C, R, l_out]; caller slices
            return outs[0].reshape(c_chan, -1), outs[1].reshape(c_chan, -1)

        return call

    # ------------------------------------------------------------------
    def __call__(self, phase, xr, xi):
        return self._call(phase, xr, xi)
