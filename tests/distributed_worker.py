"""Worker for the multi-process jax.distributed tests (not a pytest file).

Launched as: python tests/distributed_worker.py <process_id>
<num_processes> <coordinator> <outdir> [mode]. Each process owns 4
virtual CPU devices; together they form the 8-device global mesh.

mode 'step' (default): sharded env batch, one batched step, and a
global-reduction agreement check across the process boundary.
mode 'train': the REAL multi-host learner path — ppo.train with the env
batch sharded over the global mesh, gradients all-reduced across
processes; writes the final (replicated) param checksum per process.
"""

import os
import sys

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
coordinator = sys.argv[3]
outdir = sys.argv[4]
mode = sys.argv[5] if len(sys.argv) > 5 else "step"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the image's sitecustomize pins the platform via jax config, so the env
# var alone is not enough (same workaround as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=num_processes,
    process_id=process_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from puppax.configs import get_config  # noqa: E402
from puppax.env import PupperV3Env  # noqa: E402
from puppax.parallel import env_sharding, make_env_mesh  # noqa: E402

assert jax.device_count() == 4 * num_processes, jax.device_count()
assert jax.local_device_count() == 4

env = PupperV3Env(
    path=None, reward_config=get_config(), action_scale=0.75, observation_history=2
)

if mode == "train":
    from puppax.train import ppo

    n = jax.device_count()
    _, params, metrics = ppo.train(
        env,
        num_timesteps=2 * n * 4 * 2,
        episode_length=8,
        num_envs=2 * n,
        num_eval_envs=4,
        unroll_length=4,
        batch_size=n,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=1,
        seed=0,
    )
    # params are replicated over the global mesh: every process must hold
    # the identical post-all-reduce values
    leaves = jax.tree_util.tree_leaves(params[1])
    checksum = float(sum(jnp.sum(jnp.abs(x)) for x in leaves))
    reward = float(metrics.get("eval/episode_reward", float("nan")))
    assert np.isfinite(checksum)
    with open(os.path.join(outdir, f"train{process_id}.txt"), "w") as f:
        f.write(f"{checksum:.6f} {reward:.6f}\n")
    print(f"proc {process_id}: train ok checksum={checksum:.6f}")
    sys.exit(0)

mesh = make_env_mesh()
sharded = env_sharding(mesh)

n_envs = 2 * jax.device_count()

reset_fn = jax.jit(jax.vmap(env.reset), out_shardings=sharded)
step_fn = jax.jit(jax.vmap(env.step), out_shardings=sharded)


@jax.jit
def make_keys(seed):
    return jax.random.split(jax.random.PRNGKey(seed), n_envs)


keys = jax.device_put(make_keys(0), sharded)
state = reset_fn(keys)
for t in range(3):
    state = step_fn(state, jnp.zeros((n_envs, 12)))


@jax.jit
def global_summary(state):
    # global reductions over the sharded env axis -> collectives over the
    # process boundary; result is fully replicated so every host can read it
    return (
        jnp.sum(state.reward),
        jnp.sum(state.obs),
        jnp.sum(jnp.abs(state.pipeline_state.qpos)),
    )


r, o, q = [float(x) for x in jax.device_get(global_summary(state))]
assert np.isfinite([r, o, q]).all(), (r, o, q)

with open(os.path.join(outdir, f"proc{process_id}.txt"), "w") as f:
    f.write(f"{r:.6f} {o:.6f} {q:.6f}\n")
print(f"proc {process_id}: ok r={r:.6f}")
