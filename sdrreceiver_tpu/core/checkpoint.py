"""Streaming-state checkpoint/resume.

The reference is a stateless-restart stream processor — kill it and every FIR
history, NCO phase and DC mean restarts from zero (SURVEY.md section 5:
"Checkpoint / resume: none").  For a long-running service that matters: a
restart glitches every channel for ~ntaps samples and loses phase continuity.

Checkpoints store the CANONICAL named state (CompiledReceiver.export_state —
the jnp-mode layout, with fused-kernel tails converted to per-stage
histories) in a compressed .npz, so a save from any execution mode (jnp /
Pallas / sharded) resumes into any other.  Includes the plan fingerprint so
a stale checkpoint against a changed config is rejected loudly; the
fingerprint deliberately does NOT encode the execution mode.
"""

from __future__ import annotations

import hashlib
import io as _io
import json
import pathlib

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


def save_state(path: str | pathlib.Path, named: dict, plan) -> None:
    """Write canonical named state leaves (from ``rx.export_state(vec)``)."""
    arrays = {k: np.asarray(v) for k, v in named.items()}
    arrays["__fingerprint__"] = np.frombuffer(
        plan_fingerprint(plan).encode(), dtype=np.uint8
    )
    buf = _io.BytesIO()
    np.savez_compressed(buf, **arrays)
    pathlib.Path(path).write_bytes(buf.getvalue())


def load_state(path: str | pathlib.Path, plan) -> dict:
    """Read canonical named state leaves (feed to ``rx.import_state``).

    Verifies the plan fingerprint; shape/key validation against the target
    execution mode happens in import_state, which knows that mode's spec."""
    with np.load(pathlib.Path(path), allow_pickle=False) as z:
        fp = bytes(z["__fingerprint__"]).decode()
        if fp != plan_fingerprint(plan):
            raise ValueError(
                f"checkpoint fingerprint {fp} does not match the current plan "
                f"{plan_fingerprint(plan)} — config changed since the save"
            )
        return {k: z[k] for k in z.files if k != "__fingerprint__"}
