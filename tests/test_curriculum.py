"""Disturbance curriculum (opt-in): info["difficulty"] scales kick + obs
noise amplitudes outside the step core; the learner ramps it 0 -> 1 over
train.curriculum_steps env steps. RNG streams, the fused env kernel, and
the reference contract are untouched (difficulty=1.0 is bit-identical to
the un-curriculum env).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.configs import get_config
from puppax.env import PupperV3Env


def _make_env(**kw):
    return PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        **kw,
    )


def _rollout(env, state, set_difficulty=None, n=4):
    if set_difficulty is not None:
        state.info["difficulty"] = jnp.asarray(set_difficulty, jnp.float32)
    step = jax.jit(env.step)
    outs = []
    for t in range(n):
        act = jax.random.uniform(
            jax.random.PRNGKey(50 + t), (12,), minval=-0.5, maxval=0.5
        )
        state = step(state, act)
        outs.append(
            (np.asarray(state.obs), np.asarray(state.reward),
             np.asarray(state.pipeline_state.qpos))
        )
    return outs


def test_difficulty_one_is_bit_identical_to_plain():
    plain = _make_env()
    curr = _make_env(disturbance_curriculum=True)
    key = jax.random.PRNGKey(5)
    sp = jax.jit(plain.reset)(key)
    sc = jax.jit(curr.reset)(key)
    assert float(sc.info["difficulty"]) == 1.0
    np.testing.assert_array_equal(np.asarray(sp.obs), np.asarray(sc.obs))
    for a, b in zip(_rollout(plain, sp), _rollout(curr, sc, set_difficulty=1.0)):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_difficulty_zero_matches_noise_free_env():
    """difficulty=0 must make the STEP path equal an env configured with
    zero kick and zero obs-noise amplitudes: same RNG draws, amplitudes
    zeroed. (Reset-time obs noise is deliberately NOT difficulty-scaled —
    reset runs before the learner can set a difficulty, and brax-semantics
    auto-reset never re-calls reset — so the two resets' obs differ; align
    them before stepping.)"""
    quiet = _make_env(
        kick_vel=0.0, angular_velocity_noise=0.0, gravity_noise=0.0,
        motor_angle_noise=0.0, last_action_noise=0.0,
    )
    curr = _make_env(disturbance_curriculum=True)
    key = jax.random.PRNGKey(5)
    sq = jax.jit(quiet.reset)(key)
    sc = jax.jit(curr.reset)(key)
    # identical physics/info after reset; only the obs noise frame differs
    np.testing.assert_array_equal(
        np.asarray(sq.pipeline_state.qpos), np.asarray(sc.pipeline_state.qpos)
    )
    np.testing.assert_array_equal(
        np.asarray(sq.info["rng"]), np.asarray(sc.info["rng"])
    )
    # align the two reset-noise artifacts: the obs history frame and the
    # IMU-buffer column the reset reading was pushed into (it surfaces one
    # step later through the latency select)
    sq = sq.replace(obs=sc.obs)
    sq.info["imu_buffer"] = sc.info["imu_buffer"]
    for a, b in zip(_rollout(quiet, sq), _rollout(curr, sc, set_difficulty=0.0)):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_learner_ramps_difficulty(tmp_path):
    """ppo.train with curriculum_steps runs end-to-end on the curriculum
    env, and rejects envs without the flag."""
    from puppax.train import ppo

    kw = dict(
        num_timesteps=128, episode_length=16, num_envs=8, num_eval_envs=4,
        unroll_length=4, batch_size=4, num_minibatches=2,
        num_updates_per_batch=1, num_evals=3, seed=0,
    )
    make_policy, params, metrics = ppo.train(
        _make_env(disturbance_curriculum=True), curriculum_steps=96, **kw
    )
    assert np.isfinite(metrics["eval/episode_reward"])

    with pytest.raises(ValueError, match="disturbance_curriculum"):
        ppo.train(_make_env(), curriculum_steps=96, **kw)
