#!/usr/bin/env python
"""Measure free-running divergence between puppax and the independent
reference-replay oracle (tests/oracle_env) at seed 0, f64, 200 steps.

Used to set the tolerances in tests/test_reference_parity.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from puppax.configs import get_config
from puppax.env import PupperV3Env
from tests.oracle_env.reference_env import ReferencePupperEnv

REF_XML = "/root/reference/test/test_pupper_model.xml"

kwargs = dict(
    action_scale=0.75,
    observation_history=2,
    maximum_pitch_command=10.0,
    maximum_roll_command=10.0,
)

cfg = get_config()
env = PupperV3Env(path=None, reward_config=cfg, dtype=jnp.float64, **kwargs)
oracle = ReferencePupperEnv(reward_config=cfg, path=REF_XML, **kwargs)

rng = jax.random.PRNGKey(0)
step = jax.jit(env.step)
state = jax.jit(env.reset)(rng)
ostate = oracle.reset(rng)

obs_d0 = float(np.abs(np.asarray(state.obs) - np.asarray(ostate["obs"])).max())
q_d0 = float(
    np.abs(np.asarray(state.pipeline_state.qpos) - np.asarray(ostate["pipeline"].qpos)).max()
)
print(f"reset: obs diff {obs_d0:.3e}  qpos diff {q_d0:.3e}")

# scripted sinusoidal actions (exercises swing/contact switching)
T = 200
t = np.arange(T)[:, None]
phase = np.array([0, np.pi, np.pi, 0] * 3).reshape(3, 4).T.reshape(-1)[None, :]
actions = 0.3 * np.sin(2 * np.pi * t / 25 + phase)

worst = {"obs": 0.0, "rew": 0.0, "q": 0.0}
for i in range(T):
    a = jnp.asarray(actions[i])
    state = step(state, a)
    ostate = oracle.step(ostate, a)
    od = float(np.abs(np.asarray(state.obs) - np.asarray(ostate["obs"])).max())
    rd = float(abs(float(state.reward) - float(ostate["reward"])))
    qd = float(
        np.abs(
            np.asarray(state.pipeline_state.qpos) - np.asarray(ostate["pipeline"].qpos)
        ).max()
    )
    dd = float(state.done) - float(ostate["done"])
    worst["obs"] = max(worst["obs"], od)
    worst["rew"] = max(worst["rew"], rd)
    worst["q"] = max(worst["q"], qd)
    if i % 20 == 0 or dd != 0.0:
        print(
            f"step {i:3d}: obs {od:.3e} rew {rd:.3e} qpos {qd:.3e} "
            f"done {float(state.done):.0f}/{float(ostate['done']):.0f}"
        )
print("worst:", {k: f"{v:.3e}" for k, v in worst.items()})
