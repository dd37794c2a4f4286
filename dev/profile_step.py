"""Profile the env step on TPU: component costs, batch scaling, unroll."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from puppax.configs import get_config
from puppax.env import PupperV3Env, wrap_for_training
from puppax.physics import pipeline


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2)
m = env.model

import sys as _sys

BATCHES = [int(b) for b in _sys.argv[1:]] or [4096]
for B in BATCHES:
    qpos = jnp.tile(m.key_qpos, (B, 1))
    qvel = jnp.zeros((B, m.nv))
    ctrl = jnp.tile(env._default_pose, (B, 1))

    init = jax.jit(jax.vmap(lambda q, v: pipeline.pipeline_init(m, q, v)))
    ps = init(qpos, qvel)

    # physics only: 5 substeps
    step_phys = jax.jit(jax.vmap(lambda s, c: pipeline.pipeline_step(m, s, c, 5)))
    t_phys = timeit(step_phys, ps, ctrl)

    # full env step
    rngs = jax.random.split(jax.random.PRNGKey(0), B)
    reset = jax.jit(jax.vmap(env.reset))
    st = reset(rngs)
    step_env = jax.jit(jax.vmap(env.step))
    act = jnp.zeros((B, 12))
    t_env = timeit(step_env, st, act)

    print(f"B={B:6d} physics5: {t_phys*1e3:7.2f} ms ({B/t_phys:,.0f} env-steps/s) "
          f"| full: {t_env*1e3:7.2f} ms ({B/t_env:,.0f} env-steps/s)")
