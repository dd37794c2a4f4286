"""Metrics logging: pluggable host-side sinks + the training progress fn.

The reference logged through W&B + a live matplotlib errorbar plot
(/root/reference/pupperv3_mjx/utils.py:72-112). W&B is not available in
every deployment, so the framework makes the sink pluggable (SURVEY §5
'metrics'): a JSONL file sink is the default, a W&B adapter attaches when
wandb is importable and configured, and ``make_progress_fn`` builds the
``progress_fn(step, metrics)`` callback the PPO trainer calls.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional


class MetricsLogger:
    """Fan-out metrics sink. ``log(metrics, step)`` mirrors wandb.log."""

    def __init__(self, jsonl_path: Optional[str] = None, use_wandb: bool = False):
        self._jsonl_path = jsonl_path
        self._wandb = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
        if use_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    self._wandb = wandb
            except ImportError:
                pass

    def log(self, metrics: Dict, step: int) -> None:
        if self._jsonl_path:
            record = {"step": step, "ts": time.time()}
            record.update(
                {k: float(v) for k, v in metrics.items() if _is_scalar(v)}
            )
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_artifact(self, path: str, name: str) -> None:
        """Upload a checkpoint/model directory as a run artifact (the
        reference uploads every orbax checkpoint with ``wandb.log_model``,
        /root/reference/pupperv3_mjx/utils.py:208-211). JSONL runs record
        a pointer line instead — the artifact already lives on disk at
        ``path``."""
        if self._jsonl_path:
            with open(self._jsonl_path, "a") as f:
                f.write(
                    json.dumps(
                        {"artifact": name, "path": str(path), "ts": time.time()}
                    )
                    + "\n"
                )
        if self._wandb is not None:
            self._wandb.log_model(path=str(path), name=name)


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def plot_progress_curve(
    x_data: List, y_data: List, ydataerr: List, path: str, max_y: float = 40.0
) -> None:
    """Render the eval-reward errorbar curve to ``path`` (PNG).

    Headless equivalent of the reference's live matplotlib display
    (/root/reference/pupperv3_mjx/utils.py:97-112): same errorbar plot and
    axis labels, re-rendered to a file each eval epoch instead of inline.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.set_xlabel("# environment steps")
    ax.set_ylabel("reward per episode")
    if x_data:
        ax.set_title(f"y={y_data[-1]:.3f}")
        ax.set_ylim([min(0.0, min(y_data)), max(max_y, max(y_data) * 1.25)])
    ax.errorbar(x_data, y_data, yerr=ydataerr)
    fig.savefig(path)
    plt.close(fig)


def make_progress_fn(
    logger: MetricsLogger,
    times: Optional[List] = None,
    x_data: Optional[List] = None,
    y_data: Optional[List] = None,
    ydataerr: Optional[List] = None,
    plot_path: Optional[str] = None,
):
    """Build a ``progress_fn(step, metrics)`` that appends the eval-reward
    curve (the reference ``progress`` contract, utils.py:72-112). When
    ``plot_path`` is set, the errorbar curve is re-rendered there each call
    (the headless stand-in for the reference's inline display)."""
    times = times if times is not None else []
    x_data = x_data if x_data is not None else []
    y_data = y_data if y_data is not None else []
    ydataerr = ydataerr if ydataerr is not None else []

    def progress(num_steps: int, metrics: Dict) -> None:
        times.append(time.time())
        if "eval/episode_reward" in metrics:
            x_data.append(num_steps)
            y_data.append(float(metrics["eval/episode_reward"]))
            ydataerr.append(float(metrics.get("eval/episode_reward_std", 0.0)))
            if plot_path is not None:
                try:
                    plot_progress_curve(x_data, y_data, ydataerr, plot_path)
                except ImportError:
                    pass  # matplotlib is an optional host-side extra
        logger.log(metrics, step=num_steps)

    progress.times = times
    progress.x_data = x_data
    progress.y_data = y_data
    progress.ydataerr = ydataerr
    return progress
