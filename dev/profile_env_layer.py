"""Where does the batched env step spend its time, now that physics is ~50us?

Times scans of the full wrapped step vs partial stacks at batch B on the
current backend, plus XLA cost_analysis bytes per variant. Follows the
tunneled-TPU rules: no device->host reads until all timing is done.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the image's sitecustomize re-pins the accelerator platform, so
# JAX_PLATFORMS from the environment does not stick; pin in-process
if os.environ.get("PUPPAX_PROFILE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_PROFILE_PLATFORM"])

import jax.numpy as jnp

from puppax.configs import get_config
from puppax.env import PupperV3Env
from puppax.env.wrappers import AutoResetWrapper, EpisodeWrapper, VmapWrapper

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ONLY = sys.argv[2] if len(sys.argv) > 2 else None  # run a single variant
ITERS = int(os.environ.get("PUPPAX_PROFILE_ITERS", "50"))

env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2, maximum_pitch_command=10.0,
                  maximum_roll_command=10.0)
m = env.model

ep = EpisodeWrapper(env, 1000, 1)
vm = VmapWrapper(ep)
full = AutoResetWrapper(vm)

rng = jax.random.PRNGKey(0)
reset_keys = jax.random.split(rng, B)

results = []  # (name, ms_per_iter, GB_accessed_per_iter)


def bench(name, stepper, state):
    if ONLY is not None and name != ONLY:
        return None

    def loop(state, rng):
        def body(carry, _):
            state, rng = carry
            rng, key = jax.random.split(rng)
            action = jax.random.uniform(key, (B, env.action_size),
                                        minval=-1.0, maxval=1.0)
            state = stepper(state, action)
            return (state, rng), ()

        (state, rng), _ = jax.lax.scan(body, (state, rng), (), length=ITERS)
        return state, rng

    jl = jax.jit(loop)
    if os.environ.get("PUPPAX_PROFILE_COST"):
        # cost_analysis can hang/compile-twice through the TPU tunnel;
        # opt-in only (use on CPU)
        compiled = jl.lower(state, rng).compile()
        ca = compiled.cost_analysis()
        gb = (ca or {}).get("bytes accessed", float("nan")) / ITERS / 1e9
    else:
        compiled, gb = jl, float("nan")
    out = compiled(state, rng)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(state, rng)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    results.append((name, best / ITERS * 1e3, gb))
    return out


# 1. full training stack (what bench.py measures)
state_full = jax.jit(full.reset)(reset_keys)
bench("full wrapped", full.step, state_full)

# 2. episode+vmap, no auto-reset
state_vm = jax.jit(vm.reset)(reset_keys)
bench("episode+vmap", vm.step, state_vm)

# 3. bare vmapped env.step
bare = VmapWrapper(env)
state_bare = jax.jit(bare.reset)(reset_keys)
bench("bare env.step", bare.step, state_bare)


# 4. physics only (the SoA custom_vmap path under the same scan shape)
def physics_only(state, action):
    mt = jnp.clip(env._default_pose + action * env._action_scale,
                  env.lowers, env.uppers)
    ps = jax.vmap(lambda p, t: env._cv_pipeline_step(m, p.qpos, p.qvel, t))(
        state.pipeline_state, mt)
    return state.replace(pipeline_state=ps)


bench("physics only", physics_only, state_bare)


# 5. obs only (RNG splits + noise + buffers, no physics)
def obs_only(state, action):
    def one(s, a):
        info = dict(s.info)
        obs = env._get_obs(s.pipeline_state, info, s.obs)
        return s.replace(obs=obs, info=info)

    return jax.vmap(one)(state, action)


bench("obs only", obs_only, state_bare)

for name, ms, gb in results:
    sps = B / (ms / 1e3)
    print(f"{name:16s} {ms:8.3f} ms/step  {gb:7.3f} GB/step  {sps/1e6:6.2f} M env-steps/s @ B={B}")
