"""Export round-trip tests (a gap in the reference's own suite, SURVEY §4):
JSON-exported policy must replay identically to the in-framework policy."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from puppax.export import apply_exported_policy, convert_params, fold_in_normalization
from puppax.train import make_ppo_networks, running_statistics
from puppax.train.distribution import NormalTanhDistribution


def _trained_like_params(obs_dim=72, act_dim=12, hidden=(32, 16)):
    net = make_ppo_networks(obs_dim, act_dim, policy_hidden_layer_sizes=hidden)
    policy_params = net.policy_network.init(jax.random.PRNGKey(3))
    norm = running_statistics.init_state(obs_dim)
    # non-trivial normalizer
    norm = running_statistics.update(
        norm, jax.random.normal(jax.random.PRNGKey(4), (256, obs_dim)) * 3.0 + 0.5
    )
    return net, norm, policy_params


def test_fold_in_normalization_math():
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(5, 3))
    bias = rng.normal(size=3)
    mean = rng.normal(size=5)
    std = rng.uniform(0.5, 2.0, size=5)
    x = rng.normal(size=5)
    k2, b2 = fold_in_normalization(kernel, bias, mean, std)
    direct = ((x - mean) / std) @ kernel + bias
    folded = x @ k2 + b2
    np.testing.assert_allclose(folded, direct, rtol=1e-12)


def test_convert_params_schema_and_roundtrip():
    net, norm, policy_params = _trained_like_params()
    exported = convert_params(
        (norm, policy_params),
        activation="elu",
        action_scale=0.75,
        kp=5.0,
        kd=0.25,
        default_pose=np.zeros(12),
        joint_upper_limits=np.ones(12),
        joint_lower_limits=-np.ones(12),
        use_imu=True,
        observation_history=2,
        maximum_pitch_command=30.0,
        maximum_roll_command=30.0,
    )
    # schema (reference export.py:65-79)
    for key in [
        "use_imu", "control_orientation", "observation_history", "action_scale",
        "kp", "kd", "default_joint_pos", "joint_upper_limits",
        "joint_lower_limits", "maximum_pitch_command", "maximum_roll_command",
        "in_shape", "layers",
    ]:
        assert key in exported, key
    assert exported["in_shape"] == [None, 72]
    assert exported["layers"][-1]["shape"] == [None, 12]
    assert exported["layers"][-1]["activation"] == "tanh"
    assert all(lay["activation"] == "elu" for lay in exported["layers"][:-1])
    json.dumps(exported)  # must be JSON-serializable

    # round-trip: exported forward == deterministic policy (mean head, tanh)
    # NOTE: networks use the activation baked into the module; rebuild with
    # elu to match the exported activation string.
    import flax.linen as nn

    net = make_ppo_networks(
        72, 12, policy_hidden_layer_sizes=(32, 16), activation=nn.elu
    )
    obs = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (72,)))
    logits = net.policy_network.apply(norm, policy_params, jnp.asarray(obs))
    dist = NormalTanhDistribution(12)
    expected = np.asarray(dist.mode(logits))
    replayed = apply_exported_policy(exported, obs)
    np.testing.assert_allclose(replayed, expected, rtol=1e-4, atol=1e-5)
