"""Experiment-config tests: defaults mirror the reference, JSON round-trip,
dotted overrides, stable hash."""

import json

import pytest

from puppax.configs import experiment as exp


def test_defaults_mirror_reference():
    cfg = exp.ExperimentConfig()
    # env ctor defaults (reference environment.py:41-119)
    assert cfg.env.action_scale == 0.75
    assert cfg.env.position_control_kp == 5.0
    assert cfg.env.dof_damping == 0.25
    assert cfg.env.resample_velocity_step == 500
    assert cfg.env.linear_velocity_x_range == (-0.75, 0.75)
    assert cfg.env.kick_probability == 0.02
    assert cfg.env.environment_timestep == 0.02
    assert cfg.env.physics_timestep == 0.004
    # DR ranges (reference domain_randomization.py:8-23)
    assert cfg.domain_randomization.friction_range == (0.6, 1.4)
    assert cfg.domain_randomization.body_mass_scale_range == (0.7, 1.3)


def test_json_roundtrip_and_hash_stability():
    cfg = exp.ExperimentConfig()
    blob = json.dumps(exp.to_dict(cfg))
    cfg2 = exp.from_dict(json.loads(blob))
    assert cfg == cfg2
    assert exp.config_hash(cfg) == exp.config_hash(cfg2)
    assert len(exp.config_hash(cfg)) == 12


def test_overrides():
    cfg = exp.ExperimentConfig()
    cfg2 = exp.apply_overrides(
        cfg, {"train.num_envs": 8192, "env.start_position.z_max": 0.3}
    )
    assert cfg2.train.num_envs == 8192
    assert cfg2.env.start_position.z_max == 0.3
    assert cfg2.env.action_scale == cfg.env.action_scale
    # hash changes with content
    assert exp.config_hash(cfg) != exp.config_hash(cfg2)


def test_unknown_override_raises():
    with pytest.raises(KeyError):
        exp.apply_overrides(exp.ExperimentConfig(), {"train.nonexistent": 1})
