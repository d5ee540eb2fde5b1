"""Front-end sample conversion: raw RTL u8 IQ -> complex float baseband.

Reference: a 256-entry lookup table ``(i - 127) * 1.0`` applied on the USB
callback thread (jonti/sdr.cpp:43-49,119-129) and the float-pair -> complex
packing + optional DC removal in sdrj::demodData (sdrj.cpp:266-286).  On TPU
the "LUT" is just arithmetic on the VPU (a gather would be slower than the
subtract), fused by XLA into whatever follows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["u8_iq_to_complex", "f32_pairs_to_complex"]


def u8_iq_to_complex(raw: jax.Array) -> jax.Array:
    """``[2T] uint8`` interleaved I,Q -> ``[T] complex64``, value (v - 127).

    Matches the reference LUT scale exactly (jonti/sdr.cpp:43-49: scale 1.0,
    offset 127 — NOT the textbook 127.5).
    """
    v = raw.astype(jnp.float32) - np.float32(127.0)
    pairs = v.reshape(-1, 2)
    return jax.lax.complex(pairs[:, 0], pairs[:, 1])


def f32_pairs_to_complex(raw: jax.Array) -> jax.Array:
    """``[2T] float32`` interleaved I,Q -> ``[T] complex64`` (sdrj.cpp:271-276)."""
    pairs = raw.reshape(-1, 2)
    return jax.lax.complex(pairs[:, 0], pairs[:, 1])
