"""Multi-host deployment over DCN: two partitioning modes.

**groups** (SURVEY.md section 2.4's original rule): each host owns WHOLE
main-VFO groups (front end + all its buckets); halos stay intra-host and DCN
carries nothing per-sample.  Simple and collective-free, but its scaling
ceiling is the group-cost balance — CBAND_143E's 3 unequal groups cap 2-host
efficiency at ~0.82 (``assignment_report``).

  * :func:`assign_groups` — deterministic balanced assignment of plan groups
    to ``n_hosts`` by front-end+bucket FLOP cost (largest-first greedy)
  * :func:`host_subplan` — a ReceiverPlan containing only this host's groups
  * :func:`assignment_report` — the balance-efficiency ceiling of this mode

**global** (round 4, BASELINE config 5): every host runs the FULL plan over
ONE global ``(time, chan)`` mesh spanning all processes' devices — the
existing ShardedReceiver time/channel sharding, with its ppermute halos
(10 samples/stage) and the replicated-output gather riding DCN.  Compute
splits exactly evenly regardless of group shapes (balance efficiency 1.0 by
construction); the DCN cost is the KB-scale halo exchange plus the ~MB-scale
output all-gather per 0.25 s block (:func:`global_report` quantifies both).
Egress stays per-host: :func:`egress_owner` deterministically assigns each
group's topics to one host, so ZMQ subscribers see each topic from exactly
one publisher, as in groups mode.

  * :func:`global_mesh` — the all-processes ``(time, chan)`` mesh
  * :func:`egress_owner` — group index -> publishing host
  * :func:`global_report` — balance + DCN traffic model for the artifact

:func:`initialize` does the ``jax.distributed`` bring-up for both modes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..graph.plan import GroupPlan, ReceiverPlan

__all__ = [
    "initialize",
    "distributed_subplan",
    "group_costs",
    "assign_groups",
    "host_subplan",
    "assignment_report",
    "global_mesh",
    "egress_owner",
    "global_report",
    "output_key_owner",
    "key_owner",
]


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Bring up jax.distributed (no-op when single-process).

    Returns (process_id, num_processes).
    """
    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def distributed_subplan(
    plan: ReceiverPlan,
    coordinator_address: str,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[ReceiverPlan, dict]:
    """Full multi-host bring-up for one process: join the coordination
    service, then restrict the plan to this process's groups.

    Every process computes the SAME deterministic assignment (greedy
    largest-first over the cost model), so no control traffic beyond the
    jax.distributed handshake is needed.  Each host then runs its sub-plan
    on its local devices and owns its own ZMQ egress — the only cross-host
    data plane the reference has either (zmqpublisher.cpp:82-96); DCN
    carries nothing per-sample, which is what makes N-host scaling
    ~linear (see docs/SCALING.md for the measurement methodology).

    Returns ``(subplan, info)``; ``info`` reports the assignment and this
    host's topics for logs/summaries.  A host whose subplan is empty (more
    hosts than groups) gets an empty plan and should idle.
    """
    pid, n = initialize(coordinator_address, num_processes, process_id)
    assign = assign_groups(plan, n)
    sub = host_subplan(plan, assign, pid)
    info = {
        "process_id": pid,
        "num_processes": n,
        "coordinator": coordinator_address,
        "assignment": {int(k): int(v) for k, v in assign.items()},
        "local_groups": [g.index for g in sub.groups],
        "local_topics": [
            s.topic for g in sub.groups for b in g.buckets for s in b.subs
        ],
        "balance_efficiency": assignment_report(plan, n)["balance_efficiency"],
    }
    return sub, info


def group_costs(plan: ReceiverPlan) -> dict[int, float]:
    """FLOPs/block attributable to each group (front end + its buckets) —
    a per-group view of obs.metrics.group_cost_model, the single cost
    function shared with the roofline report (one model, no drift)."""
    from ..obs.metrics import group_cost_model

    return {
        gidx: c["flops_per_block"]
        for gidx, c in group_cost_model(plan).items()
    }


def assign_groups(plan: ReceiverPlan, n_hosts: int) -> dict[int, int]:
    """group index -> host id, greedy largest-first onto the lightest host."""
    if n_hosts < 1:
        raise ValueError("n_hosts must be >= 1")
    costs = group_costs(plan)
    loads = [0.0] * n_hosts
    assign: dict[int, int] = {}
    for gidx, cost in sorted(costs.items(), key=lambda kv: -kv[1]):
        host = int(np.argmin(loads))
        assign[gidx] = host
        loads[host] += cost
    return assign


def host_subplan(plan: ReceiverPlan, assignment: dict[int, int], host: int) -> ReceiverPlan:
    """The plan restricted to one host's groups (indices preserved)."""
    groups = tuple(g for g in plan.groups if assignment.get(g.index) == host)
    return dataclasses.replace(plan, groups=groups)


def global_mesh(n_chan: int = 1, devices=None):
    """One ``(time, chan)`` mesh over EVERY process's devices.

    With N processes x D local devices, time = N*D/n_chan.  The existing
    ShardedReceiver then runs unmodified: its shard_map halo ppermutes and
    the replicated state/output gathers become DCN collectives between
    hosts.  This is BASELINE config 5's "channels x time-blocks across
    N >= 2 hosts" shape."""
    import jax

    from .mesh import make_mesh

    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_chan:
        raise ValueError(
            f"{len(devices)} global devices not divisible by n_chan={n_chan}"
        )
    return make_mesh(
        n_time=len(devices) // n_chan, n_chan=n_chan, devices=devices
    )


def egress_owner(plan: ReceiverPlan, n_hosts: int) -> dict[int, int]:
    """group index -> host that PUBLISHES its topics in global-mesh mode.

    Compute is evenly split by the mesh; only egress (cheap) needs an
    owner so each topic appears on exactly one host's ZMQ socket.  Reuses
    the deterministic group assignment, so groups-mode consumers see the
    same topic->host mapping."""
    return assign_groups(plan, n_hosts)


def output_key_owner(plan: ReceiverPlan, n_hosts: int) -> dict[str, int]:
    """Step-output key pattern -> owning host (global-mesh egress filter).

    Keys are the PACKED step outputs; ownership is per group, so a host's
    fetch filter can skip whole packed buffers it will not publish.
    Entries ending in ``/`` (``pcm/g<i>/``) are PREFIXES; all others
    (``iq/<topic>``) are EXACT keys — one zmq topic being a prefix of
    another (``iq/A`` vs ``iq/AB``) must not make the match
    order-dependent."""
    own = egress_owner(plan, n_hosts)
    keys: dict[str, int] = {}
    for g in plan.groups:
        keys[f"pcm/g{g.index}/"] = own[g.index]
        if g.publishes_iq:
            keys[f"iq/{g.zmq_topic}"] = own[g.index]
    return keys


def key_owner(owner_map: dict[str, int], key: str) -> int | None:
    """Owning host of one step-output key under an
    :func:`output_key_owner` map, or None if unowned (taps etc.).

    Map entries ending in ``/`` are prefixes; all others match exactly —
    so ``iq/A`` owning host never captures ``iq/AB`` (they are distinct
    exact keys, order-independent)."""
    for pat, h in owner_map.items():
        if key.startswith(pat) if pat.endswith("/") else key == pat:
            return h
    return None


def global_report(plan: ReceiverPlan, n_hosts: int, n_time: int) -> dict:
    """Balance + DCN traffic model of the global-mesh mode (the eff(N)
    artifact's analytic half; the measured half is the multi-process run).

    Compute balance is exact by construction (every host processes
    block/n_time-sample time shards of every group).  DCN carries (a) the
    per-stage halo ppermutes that cross a host boundary (~10 complex
    samples per stage per block) and (b) the replicated output gather."""
    costs = group_costs(plan)
    total = sum(costs.values())
    halo_bytes = 0
    for g in plan.groups:
        if g.direct:
            continue
        # 10-sample complex64 halo per cascade stage crossing each of the
        # n_hosts-1 host boundaries (dist/halo.right_halo)
        halo_bytes += g.stages * 10 * 8 * (n_hosts - 1)
    out_bytes = 0
    tg = plan.block_samples
    for g in plan.groups:
        t_out = tg >> g.stages
        for b in g.buckets:
            out_bytes += 2 * b.channels * ((t_out >> b.stages) // b.late_factor)
        if g.publishes_iq:
            out_bytes += t_out
    return {
        "mode": "global",
        "n_hosts": n_hosts,
        "n_time": n_time,
        "balance_efficiency": 1.0,
        "flops_per_block_per_host": round(total / n_hosts / 1e6, 3),
        "halo_bytes_per_block": halo_bytes,
        "output_gather_bytes_per_block": out_bytes,
        # DCN seconds per block at a conservative 5 GB/s effective host
        # link, vs the 0.25 s realtime block budget
        "dcn_fraction_of_block": round(
            (halo_bytes + out_bytes) / 5e9 / (plan.block_samples / plan.fs), 6
        ),
    }


def assignment_report(plan: ReceiverPlan, n_hosts: int) -> dict:
    costs = group_costs(plan)
    assign = assign_groups(plan, n_hosts)
    loads = [0.0] * n_hosts
    for gidx, host in assign.items():
        loads[host] += costs[gidx]
    total = sum(loads)
    peak = max(loads) if loads else 0.0
    # efficiency = achievable speedup / ideal speedup given the partition
    eff = (total / peak / n_hosts) if peak > 0 else 1.0
    return {
        "n_hosts": n_hosts,
        "assignment": {int(k): int(v) for k, v in assign.items()},
        "host_flops_per_block": [round(l / 1e6, 3) for l in loads],
        "balance_efficiency": round(eff, 4),
    }
