"""The streaming state as ONE packed f32 vector across the jit boundary.

The receiver's state pytree has ~120 small leaves (FIR histories, NCO
phases, the DC mean).  Crossing a jit boundary costs ~2-3.5 us PER BUFFER
on the remote-TPU runtime (measured round 3: 120 tiny in/out arrays = 277 us
per call vs 21 us for one array), so threading the pytree directly costs
more than the whole DSP compute.  StateVec packs every leaf into a single
f32 vector at the boundary — XLA lowers the pack/unpack slices to a handful
of fused copies (~100 KB total), and the step becomes a 4-buffer program.

Leaf storage rules (exact round-trips):
  * float32  -> stored as-is
  * complex64 -> real half then imag half (planar, so no complex buffer ever
    materializes — restricted backends cannot transfer complex64)
  * uint32 (NCO phase numerators) -> bitcast to f32 (bit-exact)

The packing order is the deterministic jax pytree flatten order of the
template, captured as a named spec so checkpoints can address leaves by
path (core/checkpoint).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["StateVec"]


def _key_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


class StateVec:
    """Pack/unpack a fixed-structure state pytree to/from one f32 vector."""

    def __init__(self, template):
        """``template``: the state pytree (or its jax.eval_shape result)."""
        flat, self.treedef = jax.tree_util.tree_flatten_with_path(template)
        self.spec = []  # (key, shape, dtype, offset, length)
        off = 0
        for path, leaf in flat:
            shape = tuple(leaf.shape)
            dtype = jnp.dtype(leaf.dtype)
            n = int(np.prod(shape)) if shape else 1
            store = 2 * n if dtype == jnp.complex64 else n
            if dtype not in (
                jnp.dtype(jnp.float32),
                jnp.dtype(jnp.complex64),
                jnp.dtype(jnp.uint32),
            ):
                raise TypeError(
                    f"state leaf {_key_str(path)!r} has unsupported dtype "
                    f"{dtype} (f32/c64/u32 only)"
                )
            self.spec.append((_key_str(path), shape, dtype, off, store))
            off += store
        self.size = off

    # ------------------------------------------------------------- traced
    def pack(self, state) -> jax.Array:
        """State pytree -> [size] f32 vector (traced; order = spec order)."""
        leaves = jax.tree_util.tree_leaves(state)
        if len(leaves) != len(self.spec):
            raise ValueError(
                f"state has {len(leaves)} leaves, spec has {len(self.spec)}"
            )
        parts = []
        for leaf, (key, shape, dtype, off, store) in zip(leaves, self.spec):
            v = jnp.asarray(leaf)
            if v.shape != shape:
                raise ValueError(
                    f"state leaf {key!r} has shape {v.shape}, expected {shape}"
                )
            v = v.reshape(-1) if shape else v.reshape(1)
            if dtype == jnp.complex64:
                parts.append(jnp.real(v))
                parts.append(jnp.imag(v))
            elif dtype == jnp.uint32:
                parts.append(jax.lax.bitcast_convert_type(v, jnp.float32))
            else:
                parts.append(v)
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)

    def unpack(self, vec: jax.Array):
        """[size] f32 vector -> state pytree (traced)."""
        leaves = []
        for key, shape, dtype, off, store in self.spec:
            v = vec[off : off + store]
            if dtype == jnp.complex64:
                n = store // 2
                v = jax.lax.complex(v[:n], v[n:])
            elif dtype == jnp.uint32:
                v = jax.lax.bitcast_convert_type(v, jnp.uint32)
            leaves.append(v.reshape(shape))
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    # ---------------------------------------------------------------- host
    def export_named(self, vec) -> dict[str, np.ndarray]:
        """Host-side: packed vector -> {path: numpy leaf} (for checkpoints)."""
        host = np.asarray(vec)
        out: dict[str, np.ndarray] = {}
        for key, shape, dtype, off, store in self.spec:
            v = host[off : off + store]
            if dtype == jnp.complex64:
                n = store // 2
                v = (v[:n] + 1j * v[n:]).astype(np.complex64)
            elif dtype == jnp.uint32:
                v = v.view(np.uint32)
            out[key] = v.reshape(shape)
        return out

    def import_named(self, named: dict[str, np.ndarray]) -> np.ndarray:
        """Host-side: {path: numpy leaf} -> packed vector (for resume).

        Raises KeyError/ValueError with the offending path on mismatch."""
        vec = np.zeros(self.size, np.float32)
        for key, shape, dtype, off, store in self.spec:
            if key not in named:
                raise KeyError(f"checkpoint missing state entry {key!r}")
            v = np.asarray(named[key])
            if v.shape != shape:
                raise ValueError(
                    f"checkpoint entry {key!r} has shape {v.shape}, "
                    f"expected {shape}"
                )
            if dtype == jnp.complex64:
                n = store // 2
                v = v.astype(np.complex64).reshape(-1)
                vec[off : off + n] = v.real
                vec[off + n : off + store] = v.imag
            elif dtype == jnp.uint32:
                vec[off : off + store] = (
                    v.astype(np.uint32).reshape(-1).view(np.float32)
                )
            else:
                vec[off : off + store] = v.astype(np.float32).reshape(-1)
        return vec
