"""Native (C++) policy-runtime ABI tests: the exported JSON must replay
identically through the in-tree C++ consumer — the strongest version of
the deployment round-trip (SURVEY §3.5 parity requirement)."""

import json
import shutil
import subprocess

import jax
import numpy as np
import pytest

flax_nn = pytest.importorskip("flax.linen")

from puppax.export import convert_params  # noqa: E402
from puppax.export.native import NativePolicy, build_native_runtime  # noqa: E402
from puppax.export.params import apply_exported_policy  # noqa: E402
from puppax.train import make_ppo_networks, running_statistics  # noqa: E402

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None and shutil.which("make") is None,
    reason="no C++ toolchain",
)


@pytest.fixture(scope="module")
def exported_policy(tmp_path_factory):
    net = make_ppo_networks(
        72, 12, policy_hidden_layer_sizes=(32, 16), activation=flax_nn.elu
    )
    params = net.policy_network.init(jax.random.PRNGKey(11))
    norm = running_statistics.update(
        running_statistics.init_state(72),
        jax.random.normal(jax.random.PRNGKey(12), (128, 72)) * 2.0 + 0.25,
    )
    exported = convert_params(
        (norm, params),
        activation="elu",
        action_scale=0.75,
        kp=5.0,
        kd=0.25,
        default_pose=np.zeros(12),
        joint_upper_limits=np.ones(12),
        joint_lower_limits=-np.ones(12),
        use_imu=True,
        observation_history=2,
        maximum_pitch_command=0.0,
        maximum_roll_command=0.0,
    )
    path = tmp_path_factory.mktemp("export") / "policy.json"
    with open(path, "w") as f:
        json.dump(exported, f)
    return str(path), exported


def test_build_and_load(exported_policy):
    path, exported = exported_policy
    build_native_runtime()
    policy = NativePolicy(path)
    assert policy.in_dim == 72
    assert policy.out_dim == 12
    policy.close()


def test_native_matches_python_replay(exported_policy):
    path, exported = exported_policy
    policy = NativePolicy(path)
    rng = np.random.default_rng(0)
    for _ in range(20):
        obs = rng.standard_normal(72).astype(np.float32)
        native_out = policy(obs)
        python_out = apply_exported_policy(exported, obs)
        np.testing.assert_allclose(native_out, python_out, rtol=1e-5, atol=1e-6)
        assert np.all(np.abs(native_out) <= 1.0)  # tanh head
    policy.close()


def test_native_gait_clock_matches_env_semantics(tmp_path):
    """A gait-clock policy (74-dim input): the C++ runtime appends and
    advances its own free-running clock; tick t must equal the python
    replay with phase = t * 2*pi*f*dt (use-then-advance — tick 0 sees
    phase 0, exactly the env's reset observation)."""
    net = make_ppo_networks(
        74, 12, policy_hidden_layer_sizes=(16,), activation=flax_nn.elu
    )
    params = net.policy_network.init(jax.random.PRNGKey(3))
    norm = running_statistics.update(
        running_statistics.init_state(74),
        jax.random.normal(jax.random.PRNGKey(4), (64, 74)),
    )
    f_hz, dt = 2.5, 0.02
    exported = convert_params(
        (norm, params),
        activation="elu", action_scale=0.75, kp=5.0, kd=0.25,
        default_pose=np.zeros(12), joint_upper_limits=np.ones(12),
        joint_lower_limits=-np.ones(12), use_imu=True,
        observation_history=2, maximum_pitch_command=0.0,
        maximum_roll_command=0.0,
        gait_phase_observation=True, gait_frequency=f_hz, control_dt=dt,
    )
    path = tmp_path / "gait_policy.json"
    path.write_text(json.dumps(exported))
    build_native_runtime()
    policy = NativePolicy(str(path))
    assert policy.in_dim == 74
    assert policy.gait_enabled and policy.gait_frequency == f_hz

    rng = np.random.default_rng(7)
    for repeat in range(2):  # reset_clock restarts the phase
        policy.reset_clock()
        for t in range(8):
            hist = rng.standard_normal(72).astype(np.float32)
            native_out = policy.infer_clocked(hist)
            phase = (2.0 * np.pi * f_hz * dt * t) % (2.0 * np.pi)
            full = np.concatenate(
                [hist, [np.cos(phase), np.sin(phase)]]
            ).astype(np.float32)
            python_out = apply_exported_policy(exported, full)
            np.testing.assert_allclose(
                native_out, python_out, rtol=1e-5, atol=1e-6,
                err_msg=f"repeat {repeat} tick {t}",
            )
    # non-gait policies: infer_clocked degrades to plain infer
    policy.close()


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text('{"layers": "nope"}')
    build_native_runtime()
    with pytest.raises(ValueError):
        NativePolicy(str(bad))


def test_pretrained_artifacts_load_in_native_runtime():
    """Every committed example policy must stay consumable by the C++
    runtime (guards the ABI against accidental format drift) — including
    the run7 gait-clocked artifact through infer_clocked."""
    import glob
    import json
    import os

    pattern = os.path.join(
        os.path.dirname(__file__), "..", "examples", "*.json"
    )
    artifacts = sorted(glob.glob(pattern))
    if not artifacts:
        pytest.skip("no pretrained artifacts")
    for artifact in artifacts:
        meta = json.load(open(artifact))
        policy = NativePolicy(artifact)
        if meta.get("gait_phase_observation"):
            # the clocked entry point consumes the clock-less obs and
            # appends (cos, sin) internally
            out = policy.infer_clocked(
                np.zeros(policy.in_dim - 2, np.float32)
            )
        else:
            out = policy(np.zeros(policy.in_dim, np.float32))
        assert out.shape == (12,), artifact
        assert np.all(np.isfinite(out)), artifact
        policy.close()
