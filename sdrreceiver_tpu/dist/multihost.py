"""Multi-host deployment: group-per-host partitioning over DCN.

SURVEY.md section 2.4's deployment rule: FIR-history halos must ride ICI, so
each host owns WHOLE main-VFO groups (a group's front end + all its buckets),
and the only cross-host traffic is control + the host-local ZMQ egress.  This
module implements that partitioning:

  * :func:`assign_groups` — deterministic balanced assignment of plan groups
    to ``n_hosts`` by front-end+bucket FLOP cost (largest-first greedy)
  * :func:`host_subplan` — a ReceiverPlan containing only this host's groups
    (planning rules untouched; group indices preserved for topic routing)
  * :func:`initialize` — ``jax.distributed`` bring-up for a JobSet-style
    launch; each process then builds its sub-plan receiver over its local
    chips with the usual ``(time, chan)`` mesh

Scaling efficiency target (BASELINE.md): >=90% at N>=2 hosts — achieved by
construction here since hosts share no data-plane traffic; the binding
constraint is cost balance, reported by :func:`assignment_report`.
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
