"""Worker for the TPU-gated numerics test (not a pytest file).

Runs OUTSIDE the CPU-pinned test process: conftest.py forces the cpu
backend for the suite, so on-device checks must re-exec with the default
platform resolution (tpu when a chip is present). Prints one JSON line:
{"backend": ..., "nan_step": -1, "d_q": ..., "d_obs": ...}.

Checks mirror dev/check_tpu_numerics.py: (1) no NaNs over 60
random-action steps at B=256 — guards the f32 matmul-precision
invariants (puppax/physics/pipeline.py forces HIGHEST precision; TPU MXU
bf16 rounding corrupts qpos otherwise); (2) single-step TPU-vs-CPU qpos
and obs agreement at f32-ulp scale.
"""

import json
import sys

import jax
import jax.numpy as jnp

from puppax.configs import get_config
from puppax.env import PupperV3Env

env = PupperV3Env(
    path=None, reward_config=get_config(), action_scale=0.75, observation_history=2
)
B = 256
reset = jax.jit(jax.vmap(env.reset))
step = jax.jit(jax.vmap(env.step))
state = reset(jax.random.split(jax.random.PRNGKey(0), B))
rng = jax.random.PRNGKey(1)
nan_step = -1
for t in range(60):
    rng, k = jax.random.split(rng)
    act = jax.random.uniform(k, (B, 12), minval=-1.0, maxval=1.0)
    state = step(state, act)
    bad = (
        int(jnp.sum(~jnp.isfinite(state.obs)))
        + int(jnp.sum(~jnp.isfinite(state.reward)))
        + int(jnp.sum(~jnp.isfinite(state.pipeline_state.qpos)))
    )
    if bad:
        nan_step = t
        break

# single-step device-vs-CPU comparison (identical rng => identical draws).
# The SoA kernel splices key off the PROCESS default backend (tpu here),
# so the CPU-referenced trace must disable them explicitly or pallas
# lowering fails with "Only interpret mode is supported on CPU backend"
# — the mode env vars are read at trace time, so setting them now only
# affects the fresh CPU jit below.
import os

cpu = jax.devices("cpu")[0]
s0 = reset(jax.random.split(jax.random.PRNGKey(0), 4))
a0 = jnp.zeros((4, 12))
dev_out = step(s0, a0)
os.environ["PUPPAX_SOA"] = "off"
os.environ["PUPPAX_SOA_ENV"] = "off"
with jax.default_device(cpu):
    s0c = jax.device_put(s0, cpu)
    a0c = jax.device_put(a0, cpu)
    cpu_out = jax.jit(jax.vmap(env.step))(s0c, a0c)
d_q = float(
    jnp.max(
        jnp.abs(
            dev_out.pipeline_state.qpos - jax.device_put(cpu_out.pipeline_state.qpos)
        )
    )
)
d_obs = float(jnp.max(jnp.abs(dev_out.obs - jax.device_put(cpu_out.obs))))
print(
    json.dumps(
        {
            "backend": jax.default_backend(),
            "nan_step": nan_step,
            "d_q": d_q,
            "d_obs": d_obs,
        }
    )
)
sys.exit(0)
