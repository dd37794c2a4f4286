"""Gait-phase clock observation (opt-in capability, off by default).

A free-running (cos, sin) clock appended AFTER the stacked obs history,
outside the step core — the fused env kernel, the RNG streams, and the
reference obs contract (/root/reference/pupperv3_mjx/environment.py:
485-543) are untouched when the flag is off, and the leading history
block stays bit-identical when it is on.
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


@pytest.fixture(scope="module")
def envs():
    return _make_env(), _make_env(gait_phase_observation=True, gait_frequency=2.5)


def test_observation_size_and_reset_tail(envs):
    plain, gait = envs
    assert gait.observation_size == plain.observation_size + 2
    state = jax.jit(gait.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (gait.observation_size,)
    np.testing.assert_allclose(np.asarray(state.obs[-2:]), [1.0, 0.0])
    assert float(state.info["gait_phase"]) == 0.0


def test_clock_advances_and_history_is_untouched(envs):
    plain, gait = envs
    key = jax.random.PRNGKey(3)
    sp = jax.jit(plain.reset)(key)
    sg = jax.jit(gait.reset)(key)
    n_hist = plain.observation_size
    np.testing.assert_array_equal(np.asarray(sg.obs[:n_hist]), np.asarray(sp.obs))

    step_p = jax.jit(plain.step)
    step_g = jax.jit(gait.step)
    dphi = 2.0 * np.pi * 2.5 * plain.dt
    for t in range(1, 5):
        act = jax.random.uniform(jax.random.PRNGKey(100 + t), (12,), minval=-0.5,
                                 maxval=0.5)
        sp = step_p(sp, act)
        sg = step_g(sg, act)
        # the clock draws no RNG and lives outside the core: the leading
        # history block and every scalar stay bit-identical to a plain env
        np.testing.assert_array_equal(
            np.asarray(sg.obs[:n_hist]), np.asarray(sp.obs), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(sg.reward), np.asarray(sp.reward), err_msg=f"t={t}"
        )
        assert float(sp.done) == 0.0  # phase expectation assumes no reset
        phase = (dphi * t) % (2.0 * np.pi)
        np.testing.assert_allclose(
            np.asarray(sg.obs[-2:]), [np.cos(phase), np.sin(phase)],
            rtol=1e-5, atol=1e-6, err_msg=f"t={t}",
        )
        np.testing.assert_allclose(
            float(sg.info["gait_phase"]), phase, rtol=1e-5, atol=1e-6
        )


def test_wrapped_batched_rollout():
    """The clock flows through Vmap/Episode/AutoReset wrappers, and the
    policy-net input width follows env.observation_size."""
    from puppax.env import wrappers

    env = _make_env(gait_phase_observation=True)
    wrapped = wrappers.AutoResetWrapper(
        wrappers.EpisodeWrapper(wrappers.VmapWrapper(env), 8, 1)
    )
    B = 4
    rngs = jax.random.split(jax.random.PRNGKey(1), B)
    state = jax.jit(wrapped.reset)(rngs)
    assert state.obs.shape == (B, env.observation_size)
    step = jax.jit(wrapped.step)
    ticks = np.zeros(B)  # steps since the last done, per env
    for t in range(10):
        act = jax.random.uniform(
            jax.random.PRNGKey(t), (B, 12), minval=-0.5, maxval=0.5
        )
        state = step(state, act)
        ticks += 1
        # the clock restarts on done (fresh-reset sequence after auto-reset)
        ticks[np.asarray(state.done) > 0.5] = 0
    dphi = 2.0 * np.pi * 2.5 * env.dt
    np.testing.assert_allclose(
        np.asarray(state.info["gait_phase"]),
        (ticks * dphi) % (2 * np.pi), rtol=1e-5, atol=1e-6,
    )
    assert bool(jnp.all(jnp.isfinite(state.obs)))

    from puppax.train import make_ppo_networks

    nets = make_ppo_networks(
        observation_size=env.observation_size, action_size=env.action_size
    )
    params = nets.policy_network.init(jax.random.PRNGKey(0))
    logits = nets.policy_network.apply(None, params, state.obs)
    assert logits.shape == (B, 24)
