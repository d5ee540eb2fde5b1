"""Front-end sample conversion: raw RTL u8 IQ -> planar float baseband.

Reference: a 256-entry lookup table ``(i - 127) * 1.0`` applied on the USB
callback thread (jonti/sdr.cpp:43-49,119-129) and the float-pair -> complex
packing + optional DC removal in sdrj::demodData (sdrj.cpp:266-286).

TPU layout note (round-3 honest profiling, tools/layout_probe.py): the
obvious ``reshape(-1, 2)`` + column-slice deinterleave puts 2 in the lane
dimension and costs ~3.5 ms per 1.536 Ms block — ~50x the HBM roofline.
Reshaping to ``[rows, 256]`` and LANE-STRIDED slicing (``[:, 0::2]``)
lowers to an efficient lane shuffle (~70 us measured).  The planar
functions are the product path; the ``*_to_complex`` wrappers exist for
API compatibility and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "u8_iq_to_planar",
    "u8_iq_to_i8_planar",
    "u8_iq_to_i8_rows",
    "f32_pairs_to_planar",
    "f32_pairs_to_rows",
    "u8_iq_to_complex",
    "f32_pairs_to_complex",
]

_LANES = 256  # deinterleave row width (full 128-lane I and Q per row)


def _deinterleave(v: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[2T]`` interleaved -> (``[T]`` I, ``[T]`` Q) via lane-strided rows."""
    n = v.shape[0]
    if n % _LANES == 0:
        rows = v.reshape(-1, _LANES)
        return rows[:, 0::2].reshape(-1), rows[:, 1::2].reshape(-1)
    pairs = v.reshape(-1, 2)  # small/odd blocks: layout cost is negligible
    return pairs[:, 0], pairs[:, 1]


def u8_iq_to_planar(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[2T] uint8`` interleaved I,Q -> planar ``([T] f32, [T] f32)``,
    value (v - 127) — the reference LUT scale exactly (jonti/sdr.cpp:43-49:
    scale 1.0, offset 127, NOT the textbook 127.5)."""
    v = raw.astype(jnp.float32) - np.float32(127.0)
    return _deinterleave(v)


def u8_iq_to_i8_planar(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[2T] uint8`` interleaved -> planar ``([T] i8, [T] i8)`` holding
    ``u8 - 128`` (XOR 0x80 + bitcast).  The fused-ingest form for the
    Pallas DC kernel (pallas/dckernel.py, in_dtype=int8): the deinterleave
    runs at u8 width (1/4 the f32 bytes) and the value conversion
    ``f32(i8) + 1 = u8 - 127`` happens on load inside the kernel —
    Mosaic cannot cast uint8, but int8 it can."""
    x = jax.lax.bitcast_convert_type(raw ^ np.uint8(0x80), jnp.int8)
    return _deinterleave(x)


def u8_iq_to_i8_rows(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """:func:`u8_iq_to_i8_planar` in ROW form: ``[2T] u8`` ->
    ``([T/256, 256] i8, [T/256, 256] i8)``.

    The row shape is the layout the Pallas kernels tile on.  Flattening to
    1-D between kernels forces XLA layout conversions at every
    pallas_call boundary — measured ~170 us per plane-pair round trip on a
    1.536 Ms block (round 5) — so the u8 product path keeps full-rate
    planes as rows end to end.  Requires ``2T % 512 == 0``."""
    x = jax.lax.bitcast_convert_type(raw ^ np.uint8(0x80), jnp.int8)
    rows = x.reshape(-1, 2 * _LANES)
    return rows[:, 0::2], rows[:, 1::2]


def f32_pairs_to_planar(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[2T] float32`` interleaved I,Q -> planar pair (sdrj.cpp:271-276)."""
    return _deinterleave(raw)


def f32_pairs_to_rows(raw: jax.Array) -> tuple[jax.Array, jax.Array]:
    """``[2T] f32`` interleaved -> ``([T/256, 256], [T/256, 256])`` row
    planes (see :func:`u8_iq_to_i8_rows` for why rows).  Requires
    ``2T % 512 == 0``."""
    rows = raw.reshape(-1, 2 * _LANES)
    return rows[:, 0::2], rows[:, 1::2]


def u8_iq_to_complex(raw: jax.Array) -> jax.Array:
    """Complex-API wrapper over :func:`u8_iq_to_planar`."""
    return jax.lax.complex(*u8_iq_to_planar(raw))


def f32_pairs_to_complex(raw: jax.Array) -> jax.Array:
    """Complex-API wrapper over :func:`f32_pairs_to_planar`."""
    return jax.lax.complex(*f32_pairs_to_planar(raw))
