"""Planar (real/imag-split) state pytrees for restricted TPU transfer paths.

Some remote TPU backends cannot device->host copy complex64 buffers — and
worse, ANY complex64 *argument* to a jitted executable leaves every output
of that executable untransferable (UNIMPLEMENTED), with the first failed
copy breaking the backend session.  The receiver therefore keeps its
streaming-state pytree planar across the jit boundary: every complex leaf
is split into ``{"re": f32, "im": f32}`` on the way out of a step and
recombined on the way in.  XLA fuses the split/join into the step program,
so the planar form costs nothing on device; it also makes the state
directly checkpointable from a restricted backend (core/checkpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["to_planar", "from_planar"]

_RE, _IM = "re", "im"


def _is_planar_leaf(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {_RE, _IM}


def _split(leaf):
    if jnp.iscomplexobj(leaf):
        return {_RE: leaf.real, _IM: leaf.imag}
    return leaf


def _join(leaf):
    if _is_planar_leaf(leaf):
        return jax.lax.complex(
            jnp.asarray(leaf[_RE], jnp.float32),
            jnp.asarray(leaf[_IM], jnp.float32),
        )
    return leaf


def to_planar(tree):
    """Split every complex leaf into a ``{"re", "im"}`` float pair."""
    return jax.tree.map(_split, tree)


def from_planar(tree):
    """Inverse of :func:`to_planar` (identity on already-complex trees)."""
    return jax.tree.map(_join, tree, is_leaf=_is_planar_leaf)
