"""Host pipeline runner: double-buffered ingest -> device step -> egress.

Replaces the reference's thread/ring-buffer runtime (USB callback thread ->
20-slot ring -> dispatcher thread, jonti/sdr.cpp:100-184).  JAX dispatch is
asynchronous, so the pipeline overlap falls out naturally: enqueue the step
for block N, then convert/publish the outputs of block N-1 while the device
computes — a two-deep software pipeline with no explicit threads.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..obs.metrics import PipelineMetrics
from ..utils.fetch import fetch_np

__all__ = ["run_pipeline"]


def run_pipeline(
    rx,
    blocks: Iterable[np.ndarray],
    on_outputs: Callable[[dict[str, np.ndarray]], int] | None = None,
    raw_u8: bool = False,
    max_blocks: int | None = None,
    realtime_fs: int | None = None,
    state=None,
    return_state: bool = False,
    fetch_filter: Callable[[str], bool] | None = None,
    burst: int = 1,
):
    """Drive a CompiledReceiver over a block source.

    Args:
      rx: CompiledReceiver.
      blocks: iterator of ``[T] complex64`` (or ``[2T] uint8`` if raw_u8).
      on_outputs: callback receiving each step's host-side outputs
        (e.g. ``EgressHub.publish_outputs``); returns messages sent.
      raw_u8: feed raw dongle bytes and do the LUT on device.
      max_blocks: stop after N blocks.
      realtime_fs: if set, pace ingestion to this many samples/second
        (simulates the dongle's 4-or-5-buffers-per-second cadence).
      state: resume from this state pytree (default: fresh rx.init_state()).
      return_state: also return the final state (for checkpointing).
      fetch_filter: optional per-key predicate; outputs whose key fails it
        are never copied device->host (e.g. inactive scope taps — the key
        set is static per compile, which tap gets FETCHED is a runtime
        choice, evaluated fresh each block).
      burst: process this many blocks per device dispatch via the
        ``step_many_*`` lax.scan entries (offline-throughput mode — the
        dispatch floor is paid once per ``burst`` blocks; callbacks still
        fire once per block, in order).  Incompatible with ``realtime_fs``
        (pacing needs per-block dispatch); a tail shorter than ``burst``
        runs through single steps so no extra executable is compiled.

    Returns PipelineMetrics (or (metrics, final_state) with return_state).
    """
    burst = max(1, int(burst))
    if burst > 1 and realtime_fs:
        raise ValueError(
            "burst > 1 is an offline-throughput mode; realtime pacing "
            "requires per-block dispatch (burst=1)"
        )
    metrics = PipelineMetrics()
    metrics.start()
    if state is None:
        state = rx.init_state()

    def step(s, block):
        # dispatch on block dtype: u8 = raw dongle bytes (device LUT),
        # f32 = interleaved pairs (packed on device — remote TPU backends
        # cannot transfer complex host arrays), complex = direct
        if block.dtype == jnp.uint8:
            return rx.step_u8(s, block)
        if block.dtype == jnp.float32:
            return rx.step_f32(s, block)
        return rx.step_iq(s, block)

    if raw_u8:
        step = rx.step_u8

    if burst > 1:
        return _run_burst(
            rx, blocks, on_outputs, max_blocks, state, return_state,
            fetch_filter, burst, metrics, raw_u8,
        )

    pending: dict[str, jax.Array] | None = None
    t_block = rx.block
    next_deadline = time.perf_counter()

    for i, block in enumerate(blocks):
        if max_blocks is not None and i >= max_blocks:
            break
        t0 = time.perf_counter()
        state, outs = step(state, block)
        sent = 0
        if pending is not None and on_outputs is not None:
            # publish the previous block's outputs while this one computes;
            # packed pcm buffers are split into audio/<topic> rows AFTER the
            # host fetch (zero-copy numpy views)
            sent = on_outputs(
                rx.split_audio(
                    {
                        k: fetch_np(v)
                        for k, v in pending.items()
                        if fetch_filter is None or fetch_filter(k)
                    }
                )
            )
        pending = outs
        # record COMPUTE time before any pacing sleep — under realtime mode
        # block_latency would otherwise measure the pacing interval, not the
        # work, exactly where the 250 ms live budget matters
        t_compute = time.perf_counter() - t0
        slack = 0.0
        if realtime_fs:
            next_deadline += t_block / realtime_fs
            slack = next_deadline - time.perf_counter()
            if slack > 0:
                time.sleep(slack)
            else:
                # behind realtime: resync instead of sprinting — a real
                # dongle delivers at wall-clock pace, so lost time is lost
                # (the reference drops buffers when behind, jonti/sdr.cpp:104)
                next_deadline = time.perf_counter()
        metrics.record_block(
            t_block, t_compute, sent,
            pacing_slack=slack if realtime_fs else None,
        )

    if pending is not None:
        jax.block_until_ready(pending)
        if on_outputs is not None:
            metrics.messages_sent += on_outputs(
                rx.split_audio(
                    {
                        k: fetch_np(v)
                        for k, v in pending.items()
                        if fetch_filter is None or fetch_filter(k)
                    }
                )
            )
    metrics.finish()
    if return_state:
        return metrics, state
    return metrics


def _run_burst(
    rx, blocks, on_outputs, max_blocks, state, return_state,
    fetch_filter, burst, metrics, raw_u8=False,
):
    """Burst body of run_pipeline: ``burst`` blocks per device dispatch
    (step_many_* lax.scan entries), same double-buffered overlap — publish
    the previous unit's frames while the current unit computes.  A tail
    shorter than ``burst`` runs through single steps so no second scan
    executable is ever compiled (a new shape costs ~20-40 s over a
    remote-TPU tunnel)."""
    import itertools

    t_block = rx.block

    def publish(outs, k):
        """Fetch one unit (stacked if k, single frame if k is None) and fire
        the per-block callback in block order."""
        if on_outputs is None:
            jax.block_until_ready(outs)
            return 0
        host = {
            key: fetch_np(v)
            for key, v in outs.items()
            if fetch_filter is None or fetch_filter(key)
        }
        frames = [host] if k is None else rx.unstack_outputs(host, k)
        return sum(on_outputs(rx.split_audio(f)) for f in frames)

    def step1(s, b):
        # raw_u8 forces the u8 entry exactly like the single-block runner
        # does (a caller relying on it must not get different behavior in
        # burst mode); otherwise dispatch on block dtype
        if raw_u8 or b.dtype == jnp.uint8:
            return rx.step_u8(s, b)
        if b.dtype == jnp.float32:
            return rx.step_f32(s, b)
        return rx.step_iq(s, b)

    def record(k, t_compute, sent):
        """Metrics attribution under burst is approximate by construction:
        the unit's wall time is split evenly over its k blocks, and ``sent``
        (the PREVIOUS unit's publish count, due to double buffering) is
        attributed to the current unit's first block.  Totals are exact;
        per-block latency/messages are estimates when burst > 1."""
        metrics.record_block(t_block, t_compute / k, sent)
        for _ in range(k - 1):
            metrics.record_block(t_block, t_compute / k, 0)

    it = iter(blocks)
    if max_blocks is not None:
        it = itertools.islice(it, max_blocks)
    pending: tuple[dict, int | None] | None = None
    while True:
        stack = list(itertools.islice(it, burst))
        if not stack:
            break
        if len(stack) == burst:
            t0 = time.perf_counter()
            arr = jnp.asarray(np.stack(stack))
            if raw_u8 or arr.dtype == jnp.uint8:
                state, outs = rx.step_many_u8(state, arr)
            elif arr.dtype == jnp.float32:
                state, outs = rx.step_many_f32(state, arr)
            else:
                state, outs = rx.step_many_iq(state, arr)
            sent = publish(*pending) if pending is not None else 0
            pending = (outs, burst)
            record(burst, time.perf_counter() - t0, sent)
        else:
            for b in stack:
                t0 = time.perf_counter()
                state, outs = step1(state, jnp.asarray(b))
                sent = publish(*pending) if pending is not None else 0
                pending = (outs, None)
                record(1, time.perf_counter() - t0, sent)
    if pending is not None:
        metrics.messages_sent += publish(*pending)
    metrics.finish()
    if return_state:
        return metrics, state
    return metrics
