"""Device-mesh construction for the channelizer.

Axes:
  ``time``  time-block sharding of the full-rate wideband front end (ingest,
            DC removal, main-VFO mix + cascade) — the FLOP-dominant part
  ``chan``  channel sharding of the per-bucket sub-VFO pipelines

The reference's analog is one dispatcher thread doing everything serially
(jonti/sdr.cpp:147-184); multi-host deployment guidance (SURVEY.md section
2.4): keep whole main-VFO groups on one host so halos ride ICI, use DCN only
for dispatching distinct groups.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["make_mesh", "TIME_AXIS", "CHAN_AXIS"]

TIME_AXIS = "time"
CHAN_AXIS = "chan"


def make_mesh(
    n_time: int | None = None,
    n_chan: int | None = None,
    devices=None,
) -> jax.sharding.Mesh:
    """Build a ``(time, chan)`` mesh.

    Defaults: all available devices on the ``time`` axis (the front end is
    where the samples/second are).  ``n_time * n_chan`` must equal the device
    count when both are given.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_time is None and n_chan is None:
        n_time, n_chan = n, 1
    elif n_time is None:
        n_time = n // n_chan
    elif n_chan is None:
        n_chan = n // n_time
    if n_time * n_chan != n:
        raise ValueError(f"{n_time}x{n_chan} mesh != {n} devices")
    arr = np.asarray(devices).reshape(n_time, n_chan)
    return jax.sharding.Mesh(arr, (TIME_AXIS, CHAN_AXIS))
