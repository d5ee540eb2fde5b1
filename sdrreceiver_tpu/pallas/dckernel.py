"""Fused DC-EMA removal Pallas kernel (sdrj.cpp:277-283 block-parallel).

kernels/dc.py evaluates the one-pole EMA's closed form with XLA ops; its
honest cost on a 1.536 Ms block is ~250-460 us — several full HBM passes
(pad/reshape/prefix/broadcast/subtract all materialize).  This kernel does
the whole thing in ONE read + ONE write per plane with the prefix math on
the MXU.

``in_dtype=jnp.int8`` additionally fuses the u8 INGEST conversion
(jonti/sdr.cpp:43-49's LUT: value - 127) into the same pass: the caller
deinterleaves the raw u8 stream at u8 width (a cheap XLA lane shuffle on
1/4 the f32 bytes), XORs 0x80 and bitcasts to int8 (i8 = u8 - 128), and
the kernel computes ``f32(i8) + 1 = u8 - 127`` on load — Mosaic cannot
cast uint8 directly, but int8 -> f32 it can.  This removes the separate
XLA u8->f32 materialization pass (~200 us on a 1.536 Ms block; the fused
read is 3 MB of i8 instead of 12 MB of f32):

  * within a 256-lane row:   v = z @ W,  W[i,j] = alpha * a^(j-i) (i<=j)
    (kernels/dc._prefix_matrix — the same matrix, so the two evaluations
    agree to float rounding)
  * across the rows of a tile: row carries e = Rm @ v[:, -1] with
    Rm[r,t] = a^(256*(r-t)) (t<r) — one tiny MXU dot instead of a cumsum
  * across tiles: one f32 carry scalar per plane in SMEM scratch (the TPU
    grid runs tiles sequentially), seeded from the carried block mean

Output m[row, j] = a^(j+1) * (a^(256*row)*carry + e[row]) + v[row, j];
y = z - m; the new carried mean is m at the last sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kernels import dc as dc_mod

__all__ = ["DcKernel", "dc_supported"]

_LANES = 256


def _rows_for(t_len: int, lanes: int = _LANES) -> tuple[int, int] | None:
    if t_len % lanes:
        return None
    rows_total = t_len // lanes
    for cand in (512, 480, 448, 400, 384, 320, 256, 240, 192, 128, 96, 64,
                 48, 32, 16, 8):
        if rows_total % cand == 0:
            return cand, rows_total // cand
    return rows_total, 1


def dc_supported(t_len: int) -> bool:
    return t_len % _LANES == 0


class DcKernel:
    """``(mean [2], xr [T], xi [T]) -> (new_mean [2], yr [T], yi [T])``.

    With ``in_dtype=jnp.int8`` the planes are int8 (u8 XOR 0x80 bitcast —
    see module docstring) and the kernel converts on load."""

    def __init__(self, t_len: int, alpha: float = dc_mod.DEFAULT_ALPHA,
                 interpret: bool = False, in_dtype=jnp.float32,
                 prefix_precision: str = "default"):
        if not dc_supported(t_len):
            raise ValueError(f"t_len {t_len} not a multiple of {_LANES}")
        self.t_len = t_len
        self.alpha = float(alpha)
        self.rows, self.n_tiles = _rows_for(t_len)
        self.interpret = interpret
        self.prefix_precision = prefix_precision
        self.in_dtype = jnp.dtype(in_dtype)
        if self.in_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.int8)):
            raise ValueError(f"unsupported in_dtype {in_dtype}")
        self._call = jax.jit(self._build())

    def _build(self):
        r, n_tiles = self.rows, self.n_tiles
        alpha = self.alpha
        convert_i8 = self.in_dtype == jnp.dtype(jnp.int8)
        prefix_precision = self.prefix_precision
        w = dc_mod._prefix_matrix(alpha, _LANES)  # [256, 256] upper-tri
        i = np.arange(r, dtype=np.float64)
        # e[row] = m_end(row-1) sans carry = sum_{t<=row-1} a^(256*(row-1-t)) tot[t]
        rm = np.tril(
            dc_mod.decay_pow(alpha, _LANES * (i[:, None] - 1 - i[None, :])), -1
        ).astype(np.float32)  # [r, r] strictly-lower decay
        a_j1 = dc_mod.decay_pow(
            alpha, np.arange(1, _LANES + 1, dtype=np.float64)
        ).astype(np.float32)[None, :]  # [1, 256]
        a_row = dc_mod.decay_pow(alpha, _LANES * i).astype(np.float32)[
            :, None
        ]  # [r, 1]
        a_tile = np.float32(dc_mod.decay_pow(alpha, _LANES * r))
        a_blk = np.float32(dc_mod.decay_pow(alpha, _LANES))

        def kernel(mean_ref, xr_ref, xi_ref, w_ref, rm_ref, aj_ref, ar_ref,
                   mout_ref, yr_ref, yi_ref, carry):
            ti = pl.program_id(0)

            @pl.when(ti == 0)
            def _():
                carry[0, 0] = mean_ref[0, 0]
                carry[0, 1] = mean_ref[0, 1]

            # DEFAULT dot precision (the default): Mosaic's DEFAULT
            # bf16-rounds both operands, but the prefix values are
            # ~alpha*T_row*|x| ~ 0.03 signal-LSB, so the 0.4% relative
            # rounding lands at ~1e-4 LSB — four orders below the int16
            # quantum and the reference's own 16-LSB DC tolerance
            # (test_oracle) — while HIGHEST (bf16x3-priced) made these
            # [256, 256] dots the kernel's dominant cost
            hp = {"default": jax.lax.Precision.DEFAULT,
                  "highest": jax.lax.Precision.HIGHEST}[prefix_precision]
            for p, (x_ref, y_ref) in enumerate(
                ((xr_ref, yr_ref), (xi_ref, yi_ref))
            ):
                z = x_ref[:, :]
                if convert_i8:
                    # fused ingest: i8 = u8 - 128, LUT value = u8 - 127
                    z = z.astype(jnp.float32) + np.float32(1.0)
                v = jnp.dot(z, w_ref[:, :],
                            preferred_element_type=jnp.float32, precision=hp)
                tot = v[:, _LANES - 1 :]  # [r, 1] row totals
                e = jnp.dot(rm_ref[:, :], tot,
                            preferred_element_type=jnp.float32, precision=hp)
                c0 = carry[0, p]
                base = ar_ref[:, :] * c0 + e  # [r, 1]
                m = aj_ref[:, :] * base + v  # [r, 256]
                y_ref[:, :] = z - m
                # m_end(r-1) = a^256 * (a^(256(r-1))*c0 + e[r-1]) + tot[r-1]
                carry[0, p] = (
                    a_tile * c0 + a_blk * e[r - 1, 0] + tot[r - 1, 0]
                )

            @pl.when(ti == n_tiles - 1)
            def _():
                mout_ref[0, 0] = carry[0, 0]
                mout_ref[0, 1] = carry[0, 1]

        grid = (n_tiles,)
        x_index = lambda ti: (ti, 0)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mean [1, 2]
            pl.BlockSpec((r, _LANES), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Rm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_j1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # a_row
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * r, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * r, _LANES), jnp.float32),
        ]
        out_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((r, _LANES), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((r, _LANES), x_index, memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.SMEM((1, 2), jnp.float32)]
        interpret = self.interpret
        t_len = self.t_len

        def call(mean, xr, xi):
            # row-shaped ([T/256, 256]) planes pass through without the
            # 1-D<->rows reshapes: each reshape at a pallas_call boundary
            # is an XLA layout conversion (~170 us/plane-pair on a 1.536 Ms
            # block, round 5) unless producer and consumer agree on rows
            rows_in = xr.ndim == 2
            outs = pl.pallas_call(
                kernel,
                grid=grid,
                out_shape=out_shapes,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=interpret,
            )(
                mean.reshape(1, 2),
                xr if rows_in else xr.reshape(-1, _LANES),
                xi if rows_in else xi.reshape(-1, _LANES),
                jnp.asarray(w),
                jnp.asarray(rm),
                jnp.asarray(a_j1),
                jnp.asarray(a_row),
            )
            m2, yr3, yi3 = outs
            if rows_in:
                return m2.reshape(2), (yr3, yi3)
            return m2.reshape(2), (yr3.reshape(t_len), yi3.reshape(t_len))

        return call

    def __call__(self, mean, x):
        """Drop-in for kernels.dc.dc_block_planar: ``mean [2]``,
        ``x = (re, im)`` each ``[T]``."""
        return self._call(mean, x[0], x[1])
