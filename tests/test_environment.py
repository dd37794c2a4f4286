"""Environment tests (mirrors reference test/test_environment.py with an
obstacle-augmented model, plus wrapper/batching coverage)."""

import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.configs import get_config
from puppax.env import PupperV3Env, domain_randomization, wrap_for_training
from puppax.model import obstacles
from puppax.model.assets import pupper_xml

DEFAULT_POSE = jnp.array(
    [0.26, 0.0, -0.52, -0.26, 0.0, 0.52, 0.26, 0.0, -0.52, -0.26, 0.0, 0.52]
)


@pytest.fixture(scope="module")
def env_kwargs():
    tree = ET.ElementTree(ET.fromstring(pupper_xml()))
    tree = obstacles.add_boxes_to_model(
        tree, n_boxes=10, x_range=(-5, 5), y_range=(-5, 5), height=0.02, length=6.0
    )
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    return dict(
        path=None,
        xml_string=xml,
        action_scale=0.75,
        observation_history=2,
        resample_velocity_step=100,
        linear_velocity_x_range=(-0.75, 0.75),
        linear_velocity_y_range=(-0.5, 0.5),
        angular_velocity_range=(-2.0, 2.0),
        maximum_pitch_command=30,
        maximum_roll_command=30,
        default_pose=DEFAULT_POSE,
        start_position_config=domain_randomization.StartPositionRandomization(
            x_min=-1.0, x_max=1.0, y_min=-1.0, y_max=1.0, z_min=0.18, z_max=0.24
        ),
        reward_config=get_config(),
        kick_vel=1.0,
        kick_probability=0.04,
        terminal_body_z=0.1,
        early_termination_step_threshold=500,
    )


@pytest.fixture(scope="module")
def env(env_kwargs):
    return PupperV3Env(**env_kwargs)


@pytest.fixture(scope="module")
def reset_state(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


def test_env_construction(env):
    assert env.observation_dim == 36
    assert env.observation_size == 72
    assert env.action_size == 12
    assert env.dt == 0.02
    assert env.sys.nu == 12
    # obstacle model grew the sphere-box pair table
    assert len(env.model.pairs_sphere_box) == 80  # 8 spheres x 10 boxes


def test_get_obs(env, reset_state):
    obs_history = jnp.zeros(env._observation_history * env.observation_dim)
    obs = env._get_obs(reset_state.pipeline_state, dict(reset_state.info), obs_history)
    assert obs.shape == (env._observation_history * env.observation_dim,)
    assert jnp.all(obs >= -100.0) and jnp.all(obs <= 100.0)


def test_get_obs_imu_sampling(env_kwargs):
    """Pin imu_latency_distribution=[0,0,1]: obs[:6] is the 2-step-old column
    (reference test_environment.py:136-156)."""
    kwargs = dict(env_kwargs)
    kwargs["imu_latency_distribution"] = jnp.array([0.0, 0.0, 1.0])
    env = PupperV3Env(**kwargs)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    obs_history = jnp.zeros(env._observation_history * env.observation_dim)
    info = dict(state.info)
    expected = jnp.arange(6.0)
    info["imu_buffer"] = jnp.zeros((6, 3)).at[:, -2].set(expected)
    obs = env._get_obs(state.pipeline_state, info, obs_history)
    np.testing.assert_allclose(obs[:6], expected, atol=1e-5)


def test_reset_state_structure(env, reset_state):
    state = reset_state
    assert state.obs.shape == (72,)
    assert float(state.done) == 0.0
    info = state.info
    for key in [
        "rng", "last_act", "action_buffer", "imu_buffer", "last_vel", "command",
        "last_contact", "feet_air_time", "rewards", "kick", "step",
        "desired_world_z_in_body_frame",
    ]:
        assert key in info, key
    assert info["action_buffer"].shape == (12, 2)
    assert info["imu_buffer"].shape == (6, 2)
    assert set(state.metrics) == {"total_dist", *get_config().rewards.scales.keys()}
    # start position within the configured box
    q = state.pipeline_state.qpos
    assert -1.0 <= float(q[0]) <= 1.0
    assert 0.18 <= float(q[2]) <= 0.24


def test_rollout_25_steps(env, reset_state):
    """Jitted rollout with saturated actions: finite, state machine advances
    (reference helper_test_pupper_environment, shortened for CI)."""
    jit_step = jax.jit(env.step)
    state = reset_state
    state.info["command"] = jnp.array([0.5, 0.0, 0.0])
    for i in range(25):
        state = jit_step(state, jnp.ones(12))
        assert np.isfinite(float(state.reward))
        assert np.all(np.isfinite(np.asarray(state.obs)))
    assert int(state.info["step"]) > 0 or float(state.done) == 1.0
    for k in ("knee_collision", "body_collision", "tracking_orientation"):
        assert np.isfinite(float(state.info["rewards"][k]))


def test_step_determinism(env, reset_state):
    jit_step = jax.jit(env.step)
    a = jnp.full((12,), 0.3)
    s1 = jit_step(reset_state, a)
    s2 = jit_step(reset_state, a)
    np.testing.assert_array_equal(np.asarray(s1.obs), np.asarray(s2.obs))
    np.testing.assert_array_equal(
        np.asarray(s1.pipeline_state.qpos), np.asarray(s2.pipeline_state.qpos)
    )


def test_wrapped_batched_rollout(env):
    """Episode+Vmap+AutoReset stack over 4 envs, 3 steps."""
    wrapped = wrap_for_training(env, episode_length=10, action_repeat=1)
    rng = jax.random.split(jax.random.PRNGKey(0), 4)
    state = jax.jit(wrapped.reset)(rng)
    assert state.obs.shape == (4, 72)
    step = jax.jit(wrapped.step)
    for _ in range(3):
        state = step(state, jnp.zeros((4, 12)))
    assert state.obs.shape == (4, 72)
    assert state.info["steps"].shape == (4,)
    assert np.all(np.isfinite(np.asarray(state.obs)))


def test_wrapped_dr_batched_rollout(env):
    """DR-vmapped stack: per-env model leaves, 2 envs, 2 steps."""
    wrapped = wrap_for_training(
        env,
        episode_length=10,
        randomization_fn=domain_randomization.domain_randomize,
        randomization_rng=jax.random.split(jax.random.PRNGKey(1), 2),
    )
    rng = jax.random.split(jax.random.PRNGKey(0), 2)
    state = jax.jit(wrapped.reset)(rng)
    step = jax.jit(wrapped.step)
    for _ in range(2):
        state = step(state, jnp.zeros((2, 12)))
    assert state.obs.shape == (2, 72)
    assert np.all(np.isfinite(np.asarray(state.obs)))


def test_episode_truncation(env):
    wrapped = wrap_for_training(env, episode_length=2)
    rng = jax.random.split(jax.random.PRNGKey(0), 2)
    state = jax.jit(wrapped.reset)(rng)
    step = jax.jit(wrapped.step)
    state = step(state, jnp.zeros((2, 12)))
    state = step(state, jnp.zeros((2, 12)))
    assert np.all(np.asarray(state.done) == 1.0)


def test_sample_command_ranges(env):
    for seed in range(30):
        cmd = env.sample_command(jax.random.PRNGKey(seed))
        assert -0.75 <= float(cmd[0]) <= 0.75
        assert -0.5 <= float(cmd[1]) <= 0.5
        assert -2.0 <= float(cmd[2]) <= 2.0


def test_sample_body_orientation_unit(env):
    for seed in range(10):
        z = env.sample_body_orientation(jax.random.PRNGKey(seed))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z)), 1.0, atol=1e-5)
