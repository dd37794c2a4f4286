"""Checkpoint save/restore (orbax, ``<checkpoint_path>/<step>/`` layout).

Mirrors the reference's checkpoint story (/root/reference/pupperv3_mjx/
utils.py:202-211: orbax PyTreeCheckpointer into a per-step directory,
optionally mirrored to an artifact store) and extends it with full
train-state resume (params + optimizer + normalizer + env rng), the gap
SURVEY §5 calls out. The per-step directory layout is kept because the
export tooling walks it.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(current_step: int, params: Any, checkpoint_path) -> str:
    """Save a param pytree under ``checkpoint_path/<step>/`` (reference
    utils.py:202-211 semantics). The artifact-store upload lives in
    ``MetricsLogger.log_artifact`` (puppax/tools/metrics.py), wired after
    each save by scripts/train.py — not here."""
    path = (Path(checkpoint_path) / str(current_step)).resolve()
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, params, force=True)
    return str(path)


def latest_checkpoint_step(checkpoint_path) -> Optional[int]:
    """Highest-step subdirectory, or None (reference download_checkpoint
    picks the max step suffix, utils.py:352-360)."""
    p = Path(checkpoint_path)
    if not p.is_dir():
        return None
    steps = [int(d.name) for d in p.iterdir() if d.is_dir() and d.name.isdigit()]
    return max(steps) if steps else None


def download_checkpoint(
    project_name: str,
    entity_name: str,
    run_number: int,
    save_path="checkpoint",
):
    """Fetch the highest-step checkpoint artifact of a W&B run
    (reference utils.py:316-368 behavior: match run by ``-<run_number>``
    suffix, pick the max ``checkpoint_*_<step>`` artifact). Requires wandb
    to be installed and configured; raises ImportError otherwise."""
    import wandb

    api = wandb.Api()
    runs = [
        r
        for r in api.runs(f"{entity_name}/{project_name}")
        if r.name.endswith(f"-{run_number}")
    ]
    if not runs:
        raise LookupError(f"no run ending in -{run_number}")
    artifacts = [
        a for a in runs[0].logged_artifacts() if "checkpoint" in a.name
    ]
    if not artifacts:
        raise LookupError("run has no checkpoint artifacts")
    latest = max(artifacts, key=lambda a: int(a.name.split("_")[-1].split(":")[0]))
    latest.download(str(save_path))
    return str(save_path)


def restore_checkpoint(checkpoint_path, step: Optional[int] = None, target: Any = None):
    """Restore the params saved at ``step`` (default: latest)."""
    if step is None:
        step = latest_checkpoint_step(checkpoint_path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {checkpoint_path}")
    path = (Path(checkpoint_path) / str(step)).resolve()
    checkpointer = ocp.PyTreeCheckpointer()
    if target is not None:
        return checkpointer.restore(path, item=target)
    return checkpointer.restore(path)
