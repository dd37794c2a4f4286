"""Host-side rendering of rollout trajectories (eval-only path).

Replaces the reference's brax ``PipelineEnv.render`` + mediapy mp4 writing
(/root/reference/pupperv3_mjx/environment.py:545-547, utils.py:278-284):
qpos trajectories are copied off-device once and rendered with the MuJoCo C
renderer. Video writing degrades gracefully: mediapy if installed, else
ffmpeg binary, else raw .npz frames.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional, Sequence

# Headless GL backend selection lives in puppax/__init__.py (MUJOCO_GL=egl
# when no display AND libEGL exists — mujoco binds the backend at its
# FIRST import, and package __init__ always runs before this module). No
# unguarded fallback here: forcing egl without libEGL would make `import
# mujoco` itself raise and break physics for the whole process.
import mujoco
import numpy as np


def render_trajectory(
    mj_model: mujoco.MjModel,
    trajectory: List,
    camera: Optional[str] = "tracking_cam",
    height: int = 240,
    width: int = 320,
) -> Sequence[np.ndarray]:
    """Render a list of PhysicsState (or qpos arrays) into RGB frames."""
    try:
        renderer = mujoco.Renderer(mj_model, height=height, width=width)
    except Exception as exc:  # no GL context available (headless CI)
        raise RuntimeError(f"renderer unavailable: {exc}") from exc
    data = mujoco.MjData(mj_model)
    frames = []
    for s in trajectory:
        qpos = np.asarray(s.qpos if hasattr(s, "qpos") else s)
        data.qpos[:] = qpos
        mujoco.mj_forward(mj_model, data)
        renderer.update_scene(data, camera=camera)
        frames.append(renderer.render())
    renderer.close()
    return frames


def write_video(path: str, frames: Sequence[np.ndarray], fps: float) -> str:
    """Write frames to mp4 (mediapy -> ffmpeg -> .npz fallback chain)."""
    try:
        import mediapy as media

        media.write_video(path, frames, fps=fps)
        return path
    except ImportError:
        pass
    if shutil.which("ffmpeg"):
        with tempfile.TemporaryDirectory() as tmp:
            for i, f in enumerate(frames):
                raw = os.path.join(tmp, f"{i:06d}.ppm")
                _write_ppm(raw, f)
            subprocess.run(
                [
                    "ffmpeg", "-y", "-loglevel", "error",
                    "-framerate", str(fps),
                    "-i", os.path.join(tmp, "%06d.ppm"),
                    "-pix_fmt", "yuv420p", path,
                ],
                check=True,
            )
        return path
    # last resort: raw frames next to the requested path
    alt = os.path.splitext(path)[0] + ".npz"
    np.savez_compressed(alt, frames=np.stack(frames), fps=fps)
    return alt


def _write_ppm(path: str, frame: np.ndarray) -> None:
    h, w = frame.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6 {w} {h} 255\n".encode())
        f.write(np.ascontiguousarray(frame[..., :3], dtype=np.uint8).tobytes())
