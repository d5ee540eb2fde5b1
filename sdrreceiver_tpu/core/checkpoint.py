"""Streaming-state checkpoint/resume.

The reference is a stateless-restart stream processor — kill it and every FIR
history, NCO phase and DC mean restarts from zero (SURVEY.md section 5:
"Checkpoint / resume: none").  For a long-running service that matters: a
restart glitches every channel for ~ntaps samples and loses phase continuity.
Here the whole receiver state is one pytree, so checkpointing is trivial:
flatten with stable key paths into a compressed .npz, restore onto any
backend.  Includes the plan fingerprint so a stale checkpoint against a
changed config is rejected loudly.
"""

from __future__ import annotations

import hashlib
import io as _io
import json
import pathlib

import jax
import numpy as np

__all__ = ["plan_fingerprint", "save_state", "load_state"]


def plan_fingerprint(plan) -> str:
    """Stable hash of the execution-relevant plan fields."""
    desc = {
        "fs": plan.fs,
        "center": plan.center_frequency,
        "dc": plan.dc_correct,
        "groups": [
            {
                "mixer": g.mixer_freq,
                "stages": g.stages,
                "direct": g.direct,
                "buckets": [
                    {
                        "stages": b.stages,
                        "late": b.late_factor,
                        "out": b.out_rate,
                        "mixers": [int(m) for m in b.mixer_freqs()],
                        "fbw": [s.filter_bandwidth for s in b.subs],
                    }
                    for b in g.buckets
                ],
            }
            for g in plan.groups
        ],
    }
    return hashlib.sha256(json.dumps(desc, sort_keys=True).encode()).hexdigest()[:16]


def _key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str | pathlib.Path, state, plan) -> None:
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {_key(p): np.asarray(v) for p, v in flat}
    arrays["__fingerprint__"] = np.frombuffer(
        plan_fingerprint(plan).encode(), dtype=np.uint8
    )
    buf = _io.BytesIO()
    np.savez_compressed(buf, **arrays)
    pathlib.Path(path).write_bytes(buf.getvalue())


def load_state(path: str | pathlib.Path, template_state, plan):
    """Restore a checkpoint into the structure of ``template_state``."""
    with np.load(pathlib.Path(path), allow_pickle=False) as z:
        fp = bytes(z["__fingerprint__"]).decode()
        if fp != plan_fingerprint(plan):
            raise ValueError(
                f"checkpoint fingerprint {fp} does not match the current plan "
                f"{plan_fingerprint(plan)} — config changed since the save"
            )
        flat, treedef = jax.tree_util.tree_flatten_with_path(template_state)
        leaves = []
        for p, tmpl in flat:
            k = _key(p)
            if k not in z:
                raise ValueError(f"checkpoint missing state entry {k!r}")
            arr = z[k]
            if arr.shape != tmpl.shape or arr.dtype != np.asarray(tmpl).dtype:
                raise ValueError(
                    f"checkpoint entry {k!r} has {arr.shape}/{arr.dtype}, "
                    f"expected {tmpl.shape}/{np.asarray(tmpl).dtype}"
                )
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template_state), leaves
        )
