import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from puppax.configs import get_config
from puppax.env import PupperV3Env

env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2)
B = 256
reset = jax.jit(jax.vmap(env.reset))
step = jax.jit(jax.vmap(env.step))
state = reset(jax.random.split(jax.random.PRNGKey(0), B))
rng = jax.random.PRNGKey(1)
for t in range(60):
    rng, k = jax.random.split(rng)
    act = jax.random.uniform(k, (B, 12), minval=-1., maxval=1.)
    state = step(state, act)
    obs_nan = int(jnp.sum(~jnp.isfinite(state.obs)))
    rew_nan = int(jnp.sum(~jnp.isfinite(state.reward)))
    q_nan = int(jnp.sum(~jnp.isfinite(state.pipeline_state.qpos)))
    if obs_nan or rew_nan or q_nan:
        print(f"t={t}: obs_nan={obs_nan} rew_nan={rew_nan} qpos_nan={q_nan}")
        bad = jnp.where(~jnp.isfinite(state.reward))[0]
        print("bad env ids:", np.asarray(bad[:5]))
        break
else:
    print("no NaNs in 60 random-action steps at B=256")
# single-step CPU-vs-TPU comparison. Order matters (ADVICE r3): the mode
# env vars are read at TRACE time and B=4 forces a fresh trace, so the
# TPU step must run BEFORE the splices are disabled — otherwise both
# sides run the XLA lane and the check validates nothing (matching
# tests/tpu_numerics_worker.py ordering).
import os
cpu = jax.devices('cpu')[0]
s0 = reset(jax.random.split(jax.random.PRNGKey(0), 4))
a0 = jnp.zeros((4, 12))
tpu_out = step(s0, a0)
jax.block_until_ready(tpu_out.obs)
# the CPU re-trace must disable the pallas splices (they key off the
# process default backend = tpu)
os.environ["PUPPAX_SOA"] = "off"; os.environ["PUPPAX_SOA_ENV"] = "off"
with jax.default_device(cpu):
    s0c = jax.device_put(s0, cpu); a0c = jax.device_put(a0, cpu)
    cpu_out = jax.jit(jax.vmap(env.step))(s0c, a0c)
d_q = float(jnp.max(jnp.abs(tpu_out.pipeline_state.qpos - jax.device_put(cpu_out.pipeline_state.qpos))))
d_obs = float(jnp.max(jnp.abs(tpu_out.obs - jax.device_put(cpu_out.obs))))
print(f"TPU-vs-CPU single step: max|dq|={d_q:.3e} max|dobs|={d_obs:.3e}")
