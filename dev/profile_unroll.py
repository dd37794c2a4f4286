"""Compare substep scan vs unrolled substeps for the full control step."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from puppax.configs import get_config
from puppax.env import PupperV3Env
from puppax.physics import integrate, pipeline

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
OUTER = 20

env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2)
m = env.model
qpos = jnp.tile(m.key_qpos, (B, 1))
qvel = jnp.zeros((B, m.nv))
ctrl = jnp.tile(env._default_pose, (B, 1))
ps = jax.jit(jax.vmap(lambda q, v: pipeline.pipeline_init(m, q, v)))(qpos, qvel)


def step_scan(s, c):
    return pipeline.pipeline_step(m, s, c, 5)


def step_unrolled(s, c):
    qpos, qvel = s.qpos, s.qvel
    for _ in range(5):
        qacc, caches = pipeline.forward(m, qpos, qvel, c)
        qpos, qvel = integrate.euler(m, qpos, qvel, qacc)
    return pipeline._make_state(m, qpos, qvel, qacc, caches)


def bench(name, step_fn):
    vm = jax.vmap(step_fn)

    def loop(s, c):
        def body(s, _):
            s = vm(s, c)
            return s, ()
        s, _ = jax.lax.scan(body, s, (), length=OUTER)
        return s

    jl = jax.jit(loop)
    t0 = time.perf_counter()
    out = jl(ps, ctrl)
    jax.block_until_ready(out.qpos)
    compile_and_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jl(ps, ctrl)
        jax.block_until_ready(out.qpos)
        best = min(best, time.perf_counter() - t0)
    per = best / OUTER * 1e3
    print(f"{name:14s} {per:7.2f} ms/control-step ({B / (best / OUTER):,.0f} env-steps/s)"
          f"  [compile+first {compile_and_first:.1f}s]")


bench("scan5", step_scan)
bench("unrolled5", step_unrolled)
