"""Block-streaming substrate.

The whole framework is built on one functional convention:

    state', y = block_fn(state, x)

where ``x``/``y`` are channel-batched arrays (``[chan, time]`` or ``[time]``)
and ``state`` is an explicit pytree of carried DSP state — FIR histories, NCO
phase integers, DC-EMA means, decimator phases.  This replaces the reference's
mutable per-object state (circular-buffer pointers in jonti/dsp.cpp:32-173,
oscillator wavetable pointer in oscillator.cpp:39-50, the function-local
static DC accumulator in sdrj.cpp:280).

The defining property, enforced by tests for every kernel: processing a signal
in chunks must equal processing it whole (the invariant the reference's
FIRQueueBackToFront maintains by hand, jonti/dsp.cpp:163-173).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

State = Any
T = TypeVar("T")

__all__ = ["run_chunked", "concat_outputs", "fir_history_init"]


def fir_history_init(
    channels: int | None, ntaps: int, dtype=jnp.complex64
) -> jax.Array:
    """Zero FIR history for an ``ntaps``-tap filter: the last ``ntaps - 1``
    input samples.  Zero-initialized exactly like the reference's freshly
    zeroed queue (jonti/dsp.cpp:46-49): the first outputs of the stream see
    zero history."""
    hist = ntaps - 1
    shape = (hist,) if channels is None else (channels, hist)
    return jnp.zeros(shape, dtype=dtype)


def run_chunked(
    block_fn: Callable[[State, jax.Array], tuple[State, T]],
    state: State,
    x: jax.Array,
    chunk: int,
) -> tuple[State, list[T]]:
    """Drive ``block_fn`` over ``x`` split into ``chunk``-sized time slices.

    Used by tests to assert chunked == whole, and by offline file processing
    to stream arbitrarily long recordings through a fixed-shape jitted step.
    ``x`` is split along its last (time) axis, which must divide evenly.
    """
    total = x.shape[-1]
    if total % chunk:
        raise ValueError(f"time length {total} not divisible by chunk {chunk}")
    outs: list[T] = []
    for start in range(0, total, chunk):
        state, y = block_fn(state, x[..., start : start + chunk])
        outs.append(y)
    return state, outs


def concat_outputs(outs: Iterable[Any]) -> Any:
    """Concatenate a list of identically-structured pytree outputs along the
    trailing (time) axis."""
    outs = list(outs)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=-1), *outs
    )


def tree_allclose(a: Any, b: Any, rtol=1e-5, atol=1e-6) -> bool:
    """Structural allclose over two pytrees (test helper)."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    if ta != tb:
        return False
    return all(np.allclose(x, y, rtol=rtol, atol=atol) for x, y in zip(la, lb))
