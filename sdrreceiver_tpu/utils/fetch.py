"""Device->host fetching that works on restricted remote-TPU backends.

The axon remote backend implements device->host copies only for standalone
<=2D non-complex buffers.  Multi-output jit programs can return results as
offset views into one device arena, whose transfer raises UNIMPLEMENTED.
``fetch_np`` first materializes a leaf into its own buffer with a jitted
copy (cheap, stays on device), then transfers — safe on every backend; on
CPU it degrades to one extra memcpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fetch_np", "fetch_outputs"]

_copy = jax.jit(lambda a: jnp.copy(a))


def _need_copy(x) -> bool:
    # On the axon remote backend a FAILED direct transfer can poison the
    # session stream, so never even try it there — always go through the
    # jitted standalone copy.  Other backends transfer directly.  Resolved
    # PER ARRAY (not cached globally): one process can hold arrays on both
    # a CPU test backend and a restricted remote backend, and the first
    # array seen must not decide for the rest.
    try:
        platform = x.devices().pop().platform if hasattr(x, "devices") else "cpu"
    except Exception:
        platform = "cpu"
    return platform not in ("cpu", "gpu")


def fetch_np(x) -> np.ndarray:
    """Host numpy array of a device array, via a standalone device copy."""
    if isinstance(x, np.ndarray):
        return x
    if not _need_copy(x):
        return np.asarray(x)
    return np.asarray(_copy(x))


def fetch_outputs(outputs: dict) -> dict[str, np.ndarray]:
    """Fetch a receiver step's output dict to host."""
    return {k: fetch_np(v) for k, v in outputs.items()}
