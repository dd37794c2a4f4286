"""Headline benchmark: batched env-steps/s/chip at 4096 envs.

BASELINE config 2: batched flat-terrain joystick env with the full 18-term
reward set and fused auto-reset, stepped in lockstep under one jit. The
reference publishes no numbers (BASELINE.md: "published: {}"), so
``vs_baseline`` is reported as 1.0 by convention.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    from puppax.configs import get_config
    from puppax.env import PupperV3Env, wrap_for_training

    num_envs = int(os.environ.get("PUPPAX_BENCH_ENVS", 4096))
    steps_per_block = int(os.environ.get("PUPPAX_BENCH_STEPS", 50))

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
    def rollout_block(state, rng):
        def body(carry, _):
            state, rng = carry
            rng, key = jax.random.split(rng)
            action = jax.random.uniform(
                key, (num_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            state = wrapped.step(state, action)
            return (state, rng), ()

        (state, rng), _ = jax.lax.scan(
            body, (state, rng), (), length=steps_per_block
        )
        return state, rng

    rng = jax.random.PRNGKey(0)
    reset_keys = jax.random.split(rng, num_envs)
    state = jax.jit(wrapped.reset)(reset_keys)

    # warmup/compile
    state, rng = rollout_block(state, rng)
    jax.block_until_ready(state.obs)
    # numerics guard: a fast-but-wrong engine must not produce a score
    # (bf16 matmul rounding once NaN'd physics while the bench kept timing)
    assert bool(jnp.all(jnp.isfinite(state.obs))), "non-finite obs in rollout"
    assert bool(jnp.all(jnp.isfinite(state.pipeline_state.qpos))), "non-finite qpos"

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        state, rng = rollout_block(state, rng)
        jax.block_until_ready(state.obs)
        dt = time.perf_counter() - t0
        best = max(best, num_envs * steps_per_block / dt)

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_4096envs",
                "value": round(best, 1),
                "unit": "env-steps/s",
                "vs_baseline": 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
