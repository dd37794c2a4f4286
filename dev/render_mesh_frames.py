"""Render mesh-visual frames of a policy rollout (VERDICT r1 item 4).

Replays the exported pretrained policy (examples/pretrained_pupper_policy
.json) through the CPU env, then renders the qpos trajectory with the
REAL mesh-bearing robot model (/root/reference/test/test_pupper_model.xml,
13 STL visual meshes) through the headless EGL path in tools/video.py —
the same render path the reference drove via brax's PipelineEnv.render
(/root/reference/pupperv3_mjx/environment.py:545-547). The physics tables
of the mesh model are bit-identical to the bundled mesh-free model
(tests/test_mesh_model.py), so bundled-env qpos replays directly.

Usage:  python dev/render_mesh_frames.py [out.png]
Writes a 2x2 grid of frames (PNG) — defaults to
docs/media/pupper_mesh_render.png.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from puppax.configs import get_config  # noqa: E402
from puppax.env import PupperV3Env  # noqa: E402
from puppax.export.params import apply_exported_policy  # noqa: E402
from puppax.model.mjcf import load_model  # noqa: E402
from puppax.tools import video  # noqa: E402

REFERENCE_XML = "/root/reference/test/test_pupper_model.xml"
POLICY = os.path.join(os.path.dirname(__file__), "..", "examples",
                      "pretrained_pupper_policy.json")
N_STEPS = 240
FRAME_STEPS = (60, 120, 180, 239)


def main(out_path):
    with open(POLICY) as f:
        exported = json.load(f)

    env = PupperV3Env(
        path=None,
        reward_config=get_config(),
        # must match the exported policy's obs pipeline (JSON metadata)
        action_scale=float(exported["action_scale"]),
        observation_history=int(exported["observation_history"]),
        maximum_pitch_command=float(exported["maximum_pitch_command"]),
        maximum_roll_command=float(exported["maximum_roll_command"]),
        position_control_kp=float(exported["kp"]),
        dof_damping=float(exported["kd"]),
    )
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    state = reset(jax.random.PRNGKey(0))
    # drive a fixed forward-walk command
    state.info["command"] = jnp.asarray([0.4, 0.0, 0.0])
    traj = [np.asarray(state.pipeline_state.qpos)]
    for _ in range(N_STEPS):
        act = apply_exported_policy(exported, np.asarray(state.obs))
        state = step(state, jnp.asarray(act, jnp.float32))
        state.info["command"] = jnp.asarray([0.4, 0.0, 0.0])
        traj.append(np.asarray(state.pipeline_state.qpos))

    mesh = load_model(REFERENCE_XML)
    frames = video.render_trajectory(
        mesh.mj_model, [traj[i] for i in FRAME_STEPS],
        camera="tracking_cam", height=360, width=480,
    )
    grid = np.vstack([np.hstack(frames[:2]), np.hstack(frames[2:])])
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    plt.imsave(out_path, grid)
    dist = float(traj[-1][0] - traj[0][0]), float(traj[-1][1] - traj[0][1])
    print(f"rendered {len(frames)} mesh frames -> {out_path}; "
          f"base displacement over {N_STEPS} steps: {dist}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         os.path.join(os.path.dirname(__file__), "..", "docs", "media",
                      "pupper_mesh_render.png"))
