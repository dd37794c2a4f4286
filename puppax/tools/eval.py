"""Policy visualization: scripted-command rollout -> video + metrics.

Parity with the reference ``visualize_policy`` callback
(/root/reference/pupperv3_mjx/utils.py:214-293): a 560-step rollout
cycling through 7 canonical joystick commands every 80 steps, rendered to
mp4 at half the control rate and logged through the pluggable metrics
sink (instead of being hardwired to W&B).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from puppax.tools import video
from puppax.tools.metrics import MetricsLogger


def visualize_policy(
    current_step: int,
    make_policy: Callable,
    params,
    eval_env,
    jit_step: Callable,
    jit_reset: Callable,
    output_folder: str,
    vx: float = 0.5,
    vy: float = 0.4,
    wz: float = 1.5,
    n_steps: int = 560,
    render_every: int = 2,
    camera: str = "tracking_cam",
    logger: Optional[MetricsLogger] = None,
) -> Optional[str]:
    """Roll out the policy under a scripted command sequence and render.

    ``params`` is the callback tuple ``(normalizer, PPONetworkParams)``;
    the policy factory receives ``(params[0], params[1].policy)`` exactly
    like the reference (utils.py:242). Returns the video path (None if
    rendering is unavailable, e.g. headless CI without GL).
    """
    inference_fn = make_policy((params[0], params[1].policy))
    jit_inference_fn = jax.jit(inference_fn)

    command_seq = jnp.array(
        [
            [0.0, 0.0, 0.0],
            [vx, 0.0, 0.0],
            [-vx, 0.0, 0.0],
            [0.0, vy, 0.0],
            [0.0, -vy, 0.0],
            [0.0, 0.0, wz],
            [0.0, 0.0, -wz],
        ]
    )
    commands_per_phase = max(1, n_steps // len(command_seq))

    rng = jax.random.PRNGKey(0)
    state = jit_reset(rng)
    state.info["command"] = command_seq[0]
    rollout = [state.pipeline_state]

    for i in range(n_steps):
        act_rng, rng = jax.random.split(rng)
        state.info["command"] = command_seq[min(i // commands_per_phase, 6)]
        ctrl, _ = jit_inference_fn(state.obs, act_rng)
        state = jit_step(state, ctrl)
        rollout.append(state.pipeline_state)

    os.makedirs(output_folder, exist_ok=True)
    filename = os.path.join(output_folder, f"step_{current_step}_policy.mp4")
    fps = int(1.0 / eval_env.dt / render_every)
    try:
        frames = video.render_trajectory(
            eval_env.mj_model, rollout[::render_every], camera=camera
        )
    except RuntimeError:
        return None
    path = video.write_video(filename, frames, fps=fps)
    if logger is not None:
        logger.log(
            {
                "eval/video/command/vx": vx,
                "eval/video/command/vy": vy,
                "eval/video/command/wz": wz,
                "eval/video_path": path,
            },
            step=current_step,
        )
    return path
