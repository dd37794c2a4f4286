"""Same-session on-chip A/B: trace-time CSE on vs off, flat per-step lane.

One process, back-to-back timings (on -> off -> on again to bound tunnel
drift), no device->host reads until all timing is done. Prints one JSON
line. PUPPAX_AB_ENVS sets the batch (default 16384).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("PUPPAX_AB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_AB_PLATFORM"])

from puppax.physics import soa  # noqa: E402


def time_flat(num_envs: int, steps: int, guards: list) -> float:
    from puppax.configs import get_config
    from puppax.env import PupperV3Env, wrap_for_training

    env = PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        maximum_pitch_command=10.0,
        maximum_roll_command=10.0,
    )
    wrapped = wrap_for_training(env, episode_length=1000)

    @jax.jit
    def block(state, rng):
        def body(carry, _):
            s, r = carry
            r, k = jax.random.split(r)
            a = jax.random.uniform(k, (num_envs, 12), minval=-1.0, maxval=1.0)
            return (wrapped.step(s, a), r), ()

        (state, rng), _ = jax.lax.scan(body, (state, rng), (), length=steps)
        return state, rng

    rng = jax.random.PRNGKey(0)
    state = jax.jit(wrapped.reset)(jax.random.split(rng, num_envs))
    state, rng = block(state, rng)
    jax.block_until_ready(state.obs)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, rng = block(state, rng)
        jax.block_until_ready(state.obs)
        best = max(best, num_envs * steps / (time.perf_counter() - t0))
    guards.append(state.obs)
    return best


def time_unroll(num_envs: int, T: int, guards: list) -> float:
    """The kernel-COMPUTE-bound lane (r4: ~195 us/tile/step at >=16k envs):
    the tiles-resident fast-lane unroll, mirroring bench.run_train_unroll."""
    from puppax.configs import get_config
    from puppax.env import PupperV3Env, rollout as rollout_lib, wrap_for_training
    from puppax.train import networks as ppo_networks, running_statistics

    env = PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        maximum_pitch_command=10.0,
        maximum_roll_command=10.0,
    )
    wrapped = wrap_for_training(env, episode_length=1000)
    fl = rollout_lib.FastLane(wrapped)
    nets = ppo_networks.make_ppo_networks(env.observation_size, env.action_size)
    params = nets.policy_network.init(jax.random.PRNGKey(0))
    normalizer = running_statistics.init_state(env.observation_size)

    @jax.jit
    def unroll_block(state, key):
        key, k = jax.random.split(key)
        state, data = fl.unroll(
            state, (normalizer, params), k, T, nets.policy_activation
        )
        return state, key, data.reward

    rng = jax.random.PRNGKey(0)
    state = jax.jit(wrapped.reset)(jax.random.split(rng, num_envs))
    state, key, reward = unroll_block(state, rng)
    jax.block_until_ready(reward)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, key, reward = unroll_block(state, key)
        jax.block_until_ready(reward)
        best = max(best, num_envs * T / (time.perf_counter() - t0))
    guards.append(reward)
    return best


def main():
    num_envs = int(os.environ.get("PUPPAX_AB_ENVS", 16384))
    steps = int(os.environ.get("PUPPAX_AB_STEPS", 50))
    config = os.environ.get("PUPPAX_AB_CONFIG", "flat")
    guards: list = []
    out = {
        "num_envs": num_envs, "backend": jax.default_backend(),
        "config": config,
    }
    if config == "unroll":
        T = int(os.environ.get("PUPPAX_AB_UNROLL", 20))
        timer = lambda g: time_unroll(num_envs, T, g)  # noqa: E731
    else:
        timer = lambda g: time_flat(num_envs, steps, g)  # noqa: E731

    soa._CSE_ENABLED = True
    out["cse_on"] = round(timer(guards), 1)
    soa._CSE_ENABLED = False
    out["cse_off"] = round(timer(guards), 1)
    soa._CSE_ENABLED = True
    out["cse_on_2"] = round(timer(guards), 1)

    for g in guards:
        assert bool(jnp.all(jnp.isfinite(g))), "non-finite obs"
    on_best = max(out["cse_on"], out["cse_on_2"])
    out["speedup"] = round(on_best / out["cse_off"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
