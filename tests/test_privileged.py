"""Asymmetric actor-critic: privileged critic observations.

The env publishes ground-truth critic-only signals in
``info["privileged_obs"]`` (true local velocities/gravity, joint
velocities, contact state, kick, DR leaves); the PPO value network sees
``[obs, privileged]`` while the policy network and the export ABI are
untouched. This is the standard sim-to-real recipe for this task family
(docs/ROADMAP.md "Capabilities").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.configs import get_config
from puppax.env import PupperV3Env, wrap_for_training
from puppax.ops import math


@pytest.fixture(scope="module")
def env():
    return PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        privileged_obs=True,
    )


def test_privileged_obs_content(env):
    """Size and ground-truth content: the true local linear velocity and
    the un-noised gravity direction, neither of which the policy obs
    carries."""
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    assert state.info["privileged_obs"].shape == (env.privileged_obs_size,)

    step = jax.jit(env.step)
    for t in range(3):
        state = step(state, jnp.zeros(12))
    priv = np.asarray(state.info["privileged_obs"])
    ps = state.pipeline_state
    inv = math.quat_inv(ps.x_rot[0])
    np.testing.assert_allclose(
        priv[0:3], np.asarray(math.rotate(ps.xd_vel[0], inv)), atol=1e-6
    )
    np.testing.assert_allclose(
        priv[6:9],
        np.asarray(math.rotate(jnp.array([0.0, 0.0, -1.0]), inv)),
        atol=1e-6,
    )
    np.testing.assert_allclose(priv[9:21], np.asarray(ps.qd[6:]), atol=1e-6)
    # DR leaves: nominal friction / kp / torso mass
    assert priv[31] > 0 and priv[32] > 0 and priv[33] > 0
    assert np.all(np.isfinite(priv))


def test_privileged_obs_absent_by_default():
    e = PupperV3Env(
        path=None, reward_config=get_config(), action_scale=0.75,
        observation_history=2,
    )
    state = jax.jit(e.reset)(jax.random.PRNGKey(0))
    assert "privileged_obs" not in state.info


def test_privileged_obs_through_training_stack(env):
    """Wrapped (episode+vmap+autoreset) batched rollout carries the
    privileged obs; auto-reset restores it alongside obs."""
    wrapped = wrap_for_training(env, episode_length=10)
    rng = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.jit(wrapped.reset)(rng)
    assert state.info["privileged_obs"].shape == (4, env.privileged_obs_size)
    step = jax.jit(wrapped.step)
    for _ in range(3):
        state = step(state, jnp.zeros((4, 12)))
    assert np.all(np.isfinite(np.asarray(state.info["privileged_obs"])))


@pytest.mark.slow
def test_train_with_privileged_critic(env, tmp_path):
    """Tiny end-to-end PPO run with the asymmetric critic: completes,
    finite losses, value-net first layer sized obs+priv, policy params
    identical in STRUCTURE to the symmetric run (export ABI)."""
    from puppax.train import ppo

    make_policy, params, metrics = ppo.train(
        env,
        num_timesteps=64,
        episode_length=8,
        num_envs=8,
        num_eval_envs=8,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=1,
        seed=0,
        privileged_critic=True,
    )
    norm, net_params = params
    kernel0 = jax.tree_util.tree_leaves(
        {k: v for k, v in net_params.value.items()}
    )
    # the value net input layer must be widened by privileged_obs_size
    first = net_params.value["params"]["hidden_0"]["kernel"]
    assert first.shape[0] == env.observation_size + env.privileged_obs_size
    pol_first = net_params.policy["params"]["hidden_0"]["kernel"]
    assert pol_first.shape[0] == env.observation_size
    assert np.isfinite(float(metrics["eval/episode_reward"]))
    # deterministic policy still callable on plain obs (deployment path)
    policy = make_policy((norm, net_params.policy), deterministic=True)
    act, _ = policy(jnp.zeros((2, env.observation_size)), jax.random.PRNGKey(0))
    assert act.shape == (2, 12)
    assert bool(jnp.all(jnp.isfinite(act)))
