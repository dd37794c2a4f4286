"""Whole-unroll fused kernel (puppax/env/fused_unroll.py).

Strategy (mirrors tests/test_soa_env.py / test_rollout.py): the full
emission's pallas lowering is covered by the tpu-marked on-device leg;
CPU tests pin everything else:

* the folded-normalizer policy (fold_normalizer + mlp_rows_flat +
  policy_math) against the fast lane's policy_rows apply — the fold is
  the only math the fused lane changes;
* the kernel's grid/carry PLUMBING (grid=(nb, T) with the carry in
  revisited output blocks, @pl.when(t==0) init, t-indexed noise/eps
  streaming and per-step output blocks, weight blocks) by running the
  REAL build_unroll_kernel in pallas interpret mode with the env-step
  emission stubbed to a cheap shape-agnostic algebra — the scan-lane
  oracle runs the same stub, so any plumbing mismatch (wrong block
  index, missed carry write, stale init) breaks parity.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.configs import get_config
from puppax.env import PupperV3Env, fused_unroll, rollout, soa_env, wrappers
from puppax.train import networks as ppo_networks, running_statistics

B = 8
T = 4
EPISODE_LENGTH = 50


def _make(gait=False, priv=False, episode_length=EPISODE_LENGTH):
    env = PupperV3Env(
        path=None,
        reward_config=get_config(),
        action_scale=0.75,
        observation_history=2,
        maximum_pitch_command=10.0,
        maximum_roll_command=10.0,
        environment_timestep=0.004,
        physics_timestep=0.004,
        gait_phase_observation=gait,
        privileged_obs=priv,
    )
    wrapped = wrappers.wrap_for_training(env, episode_length=episode_length)
    nets = ppo_networks.make_ppo_networks(
        env.observation_size, env.action_size,
        policy_hidden_layer_sizes=(32, 32), activation=jax.nn.elu,
    )
    policy_params = nets.policy_network.init(jax.random.PRNGKey(7))
    return env, wrapped, nets, policy_params


def _reset(wrapped):
    rngs = jax.random.split(jax.random.PRNGKey(3), B)
    return jax.jit(wrapped.reset)(rngs)


def test_folded_policy_matches_policy_rows():
    """fold_normalizer + mlp_rows_flat + policy_math == policy_rows
    (normalize-then-matmul) to fp tolerance, on a non-trivial normalizer."""
    env, wrapped, nets, policy_params = _make()
    normalizer = running_statistics.init_state(env.observation_size)
    normalizer = normalizer.replace(
        mean=jnp.linspace(-0.2, 0.3, env.observation_size),
        std=jnp.linspace(0.7, 1.4, env.observation_size),
    )
    fl = rollout.FastLane(wrapped, mode="xla")
    obs_dim, act_n = fl.obs_dim, env.action_size
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    Bp = 256
    obs_t = jax.random.normal(k1, (obs_dim, Bp // 128, 128), jnp.float32)
    eps = jax.random.normal(k2, (act_n, Bp // 128, 128), jnp.float32)

    ref_apply = fl.policy_rows(normalizer, policy_params, jax.nn.elu)
    ref_act, ref_raw, ref_lp = ref_apply(obs_t, eps)

    layers = fused_unroll.fold_normalizer(normalizer, policy_params)
    X = obs_t.reshape(obs_dim, Bp)
    H = fused_unroll.mlp_rows_flat(layers, jax.nn.elu, X)
    act_rows, raw_rows, logp = fused_unroll.policy_math(
        [H[i] for i in range(act_n)],
        [H[act_n + i] for i in range(act_n)],
        [eps.reshape(act_n, Bp)[i] for i in range(act_n)],
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(act_rows)),
        np.asarray(ref_act.reshape(act_n, Bp)), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.stack(raw_rows)),
        np.asarray(ref_raw.reshape(act_n, Bp)), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(ref_lp.reshape(Bp)), atol=2e-4,
    )


def _stub_emission(s, es, q, v, act, env, noi, dr, first_q, first_v,
                   first_obs, first_priv, steps, prev_done, n_substeps,
                   episode_length):
    """Cheap shape-agnostic stand-in for soa_env._emit_wrapped_step with
    the exact return structure: input-sensitive (q/v/act/noise/dr/first
    all feed the outputs) so any plumbing error — a block index off by
    one, a carry row not written back, noise/eps streamed to the wrong
    step — breaks the interpret-vs-oracle parity below."""
    nu = s.nu
    noi0 = next(iter(noi.values()))[0]
    dr0 = next(iter(dr.values()))[0]
    steps2 = jnp.asarray(steps) + 1.0
    # periodic resets exercise the first_* restore and the wrap carry
    done2 = jnp.where(jnp.mod(steps2, 3.0) < 0.5, 1.0, 0.0)
    trunc = done2 * 0.5

    def mix(base, i, scale):
        return (
            base * 0.9
            + 0.03 * jnp.asarray(act[i % nu])
            + scale * noi0
            + 0.001 * dr0
        )

    q2 = [mix(q[i], i, 0.01) for i in range(s.nq)]
    v2 = [mix(v[i], i, 0.02) for i in range(s.nv)]
    q_out = [jnp.where(done2 > 0.5, first_q[i], q2[i]) for i in range(s.nq)]
    v_out = [jnp.where(done2 > 0.5, first_v[i], v2[i]) for i in range(s.nv)]
    env_out = {}
    for name, (r0, n) in es.env_rows.items():
        rows = env[name]
        if name == "obs_history":
            env_out[name] = [
                jnp.where(done2 > 0.5, first_obs[i], mix(rows[i], i, 0.005))
                for i in range(n)
            ]
        else:
            env_out[name] = [mix(rows[i], i, 0.002) for i in range(n)]
    aux = {
        "reward": [0.1 * jnp.asarray(act[0]) + 0.01 * noi0],
        "done": [done2],
        "truncation": [trunc],
        "rewards": [q[0] * 0.001 * (i + 1) for i in range(18)],
        "total_dist": [q[1] * 0.5],
    }
    if es.priv:
        aux["privileged"] = [
            jnp.where(done2 > 0.5, first_priv[i], v2[i % s.nv] * 0.1)
            for i in range(es.npriv)
        ]
    return q_out, v_out, env_out, steps2, done2, aux


@pytest.mark.parametrize("gait,priv", [(False, False), (True, True)])
def test_fused_interpret_matches_scan_oracle(monkeypatch, gait, priv):
    """The REAL build_unroll_kernel in interpret mode (stubbed emission)
    == the scan-lane oracle running the same stub: pins the grid/carry/
    streaming plumbing end-to-end, including the gait phase carry and the
    privileged aux rows."""
    monkeypatch.setattr(soa_env, "_emit_wrapped_step", _stub_emission)
    monkeypatch.setenv("PUPPAX_SOA_ENV", "force")
    env, wrapped, nets, policy_params = _make(gait=gait, priv=priv)
    state = _reset(wrapped)
    key = jax.random.PRNGKey(5)

    # normalizer=None: both lanes then run the identical MLP math, so the
    # comparison isolates the PLUMBING (the fold is pinned separately)
    fl_oracle = rollout.FastLane(wrapped, mode="xla")
    assert not fl_oracle.use_fused(T)  # xla mode keeps the eager loop
    ref_final, ref_data = fl_oracle.unroll(
        state, (None, policy_params), key, T, jax.nn.elu
    )

    monkeypatch.setenv("PUPPAX_FUSED_UNROLL", "on")
    fl_fused = rollout.FastLane(wrapped, mode="interpret")
    assert fl_fused.use_fused(T)
    got_final, got_data = fl_fused.unroll(
        state, (None, policy_params), key, T, jax.nn.elu
    )

    atol = 1e-5
    for name in ("observation", "action", "reward", "discount",
                 "next_observation", "truncation"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_data, name)),
            np.asarray(getattr(ref_data, name)), atol=atol, err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(got_data.policy_extras["log_prob"]),
        np.asarray(ref_data.policy_extras["log_prob"]), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got_data.policy_extras["raw_action"]),
        np.asarray(ref_data.policy_extras["raw_action"]), atol=atol,
    )
    if priv:
        for name in ("privileged_obs", "next_privileged_obs"):
            np.testing.assert_allclose(
                np.asarray(got_data.extras[name]),
                np.asarray(ref_data.extras[name]), atol=atol, err_msg=name,
            )
    np.testing.assert_allclose(
        np.asarray(got_final.obs), np.asarray(ref_final.obs), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(got_final.pipeline_state.qpos),
        np.asarray(ref_final.pipeline_state.qpos), atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(got_final.reward), np.asarray(ref_final.reward), atol=atol
    )
    np.testing.assert_array_equal(
        np.asarray(got_final.done), np.asarray(ref_final.done)
    )
    if gait:
        np.testing.assert_allclose(
            np.asarray(got_final.info["gait_phase"]),
            np.asarray(ref_final.info["gait_phase"]), atol=1e-6,
        )
    for name in ("steps", "truncation"):
        np.testing.assert_allclose(
            np.asarray(got_final.info[name]),
            np.asarray(ref_final.info[name]), atol=atol, err_msg=name,
        )


def test_use_fused_gating(monkeypatch):
    monkeypatch.setenv("PUPPAX_SOA_ENV", "force")
    _, wrapped, *_ = _make()
    fl = rollout.FastLane(wrapped, mode="kernel")
    assert not fl.use_fused(5)  # opt-in: default off
    monkeypatch.setenv("PUPPAX_FUSED_UNROLL", "on")
    assert fl.use_fused(5)
    monkeypatch.setenv("PUPPAX_FUSED_UNROLL", "off")
    assert not fl.use_fused(5)
