"""Worker: the rollout fast lane (kernel mode) on the accelerator.

Run by tests/test_rollout.py::test_on_device_fast_lane in a subprocess
with default platform resolution. Prints one JSON line with:

* parity of the compiled fast-lane unroll (policy + wrapped env kernel,
  tiles-resident scan) against the standard XLA lane
  (``acting.generate_unroll`` over ``wrapped.step`` with the pallas
  splices off) on a privileged+gait env — covers the widened
  first/aux kernel blocks (ADVICE r3: the priv+gait kernel layout had
  CPU xla-rows coverage only);
* parity of the shard_map-wrapped kernel lane (PUPPAX_FAST_LANE_SHARD=
  force on a 1-device mesh) against the plain kernel lane — validates
  the kernel-under-shard_map lowering on real hardware;
* fast-lane throughput (env-steps/s) for the ledger narrative.

IMPORTANT: all timing happens before any device->host read — a single
D2H transfer permanently degrades the tunneled TPU's dispatch latency.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("PUPPAX_WORKER_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_WORKER_PLATFORM"])


def main():
    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"backend": "cpu"}))
        return

    import numpy as np
    from jax.sharding import Mesh

    from puppax.configs import get_config
    from puppax.env import PupperV3Env, rollout, wrappers
    from puppax.train import acting, networks as ppo_networks, running_statistics

    B = 1024  # one kernel tile
    T = 8
    EPISODE_LENGTH = 6  # a truncation + auto-reset lands mid-unroll

    def build(env_mode):
        os.environ["PUPPAX_SOA"] = "auto"
        os.environ["PUPPAX_SOA_ENV"] = env_mode
        return PupperV3Env(
            path=None,
            reward_config=get_config(),
            action_scale=0.75,
            observation_history=2,
            maximum_pitch_command=10.0,
            maximum_roll_command=10.0,
            gait_phase_observation=True,
            gait_frequency=2.5,
            privileged_obs=True,
        )

    env_ref = build("off")
    env_fast = build("auto")

    nets = ppo_networks.make_ppo_networks(
        env_fast.observation_size, env_fast.action_size,
        policy_hidden_layer_sizes=(32, 32),
    )
    params = nets.policy_network.init(jax.random.PRNGKey(7))
    normalizer = running_statistics.init_state(env_fast.observation_size)
    key = jax.random.PRNGKey(11)
    reset_keys = jax.random.split(jax.random.PRNGKey(3), B)

    # standard XLA lane (reference semantics)
    wrapped_ref = wrappers.wrap_for_training(
        env_ref, episode_length=EPISODE_LENGTH
    )
    policy = ppo_networks.make_inference_fn(nets)((normalizer, params))
    state_ref = jax.jit(wrapped_ref.reset)(reset_keys)
    ref_final, ref_data = jax.jit(
        lambda s, k: acting.generate_unroll(wrapped_ref, s, policy, k, T)
    )(state_ref, key)
    jax.block_until_ready(ref_data.reward)

    # fast lane, kernel mode
    wrapped_fast = wrappers.wrap_for_training(
        env_fast, episode_length=EPISODE_LENGTH
    )
    ok, reason = rollout.support_reason(wrapped_fast)
    if not ok:
        print(json.dumps({"backend": backend, "error": f"unsupported: {reason}"}))
        return
    fl = rollout.FastLane(wrapped_fast)
    assert fl.priv and fl.gait
    unroll = jax.jit(
        lambda s, k: fl.unroll(
            s, (normalizer, params), k, T, nets.policy_activation
        )
    )
    state_fast = jax.jit(wrapped_fast.reset)(reset_keys)
    got_final, got_data = unroll(state_fast, key)
    jax.block_until_ready(got_data.reward)

    # kernel lane under shard_map (1-device mesh, forced)
    os.environ["PUPPAX_FAST_LANE_SHARD"] = "force"
    mesh = Mesh(np.array(jax.devices()[:1]), ("env",))
    fl_sh = rollout.FastLane(wrapped_fast, mesh=mesh)
    assert fl_sh._mesh is not None
    unroll_sh = jax.jit(
        lambda s, k: fl_sh.unroll(
            s, (normalizer, params), k, T, nets.policy_activation
        )
    )
    sh_final, sh_data = unroll_sh(state_fast, key)
    jax.block_until_ready(sh_data.reward)

    # whole-unroll fused kernel (opt-in lane): same draws + emission, the
    # policy runs in-kernel (fused_unroll.build_unroll_kernel) — expected
    # ~bit-equal to the scan-lane kernel unroll (HIGHEST-precision policy
    # dots in both, identity normalizer fold)
    os.environ["PUPPAX_FUSED_UNROLL"] = "on"
    fl_fz = rollout.FastLane(wrapped_fast)
    assert fl_fz.use_fused(T)
    unroll_fz = jax.jit(
        lambda s, k: fl_fz.unroll(
            s, (normalizer, params), k, T, nets.policy_activation
        )
    )
    fz_final, fz_data = unroll_fz(state_fast, key)
    jax.block_until_ready(fz_data.reward)
    os.environ["PUPPAX_FUSED_UNROLL"] = "off"

    # timed: unroll blocks, single dispatch each (per-step Python
    # dispatches through the tunnel measure RPC latency, not device time)
    st, kk = got_final, jax.random.split(key)[0]
    t_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st, _ = unroll(st, kk)
        jax.block_until_ready(st.obs)
        t_best = min(t_best, time.perf_counter() - t0)
    t_fz = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f_st, _ = unroll_fz(st, kk)
        jax.block_until_ready(f_st.obs)
        t_fz = min(t_fz, time.perf_counter() - t0)

    # D2H reads only now
    out = {
        "backend": backend,
        # fast-lane kernel vs standard XLA lane (different layouts: fp
        # noise amplifies through contacts; done/truncation are discrete)
        "d_obs": float(jnp.max(jnp.abs(got_data.observation - ref_data.observation))),
        "d_rew": float(jnp.max(jnp.abs(got_data.reward - ref_data.reward))),
        "d_done": float(jnp.max(jnp.abs(got_data.discount - ref_data.discount))),
        "d_trunc": float(jnp.max(jnp.abs(got_data.truncation - ref_data.truncation))),
        "d_priv": float(jnp.max(jnp.abs(
            got_data.extras["privileged_obs"] - ref_data.extras["privileged_obs"]
        ))),
        "d_final_q": float(jnp.max(jnp.abs(
            got_final.pipeline_state.qpos - ref_final.pipeline_state.qpos
        ))),
        # shard_map kernel lane vs plain kernel lane (same math modulo
        # matmul widths; expected ~bit-equal on one device)
        "d_sh_obs": float(jnp.max(jnp.abs(sh_data.observation - got_data.observation))),
        "d_sh_rew": float(jnp.max(jnp.abs(sh_data.reward - got_data.reward))),
        "d_sh_final_q": float(jnp.max(jnp.abs(
            sh_final.pipeline_state.qpos - got_final.pipeline_state.qpos
        ))),
        # fused whole-unroll kernel vs the scan-lane kernel unroll
        "d_fz_obs": float(jnp.max(jnp.abs(fz_data.observation - got_data.observation))),
        "d_fz_rew": float(jnp.max(jnp.abs(fz_data.reward - got_data.reward))),
        "d_fz_done": float(jnp.max(jnp.abs(fz_data.discount - got_data.discount))),
        "d_fz_logp": float(jnp.max(jnp.abs(
            fz_data.policy_extras["log_prob"] - got_data.policy_extras["log_prob"]
        ))),
        "d_fz_priv": float(jnp.max(jnp.abs(
            fz_data.extras["privileged_obs"] - got_data.extras["privileged_obs"]
        ))),
        "d_fz_final_q": float(jnp.max(jnp.abs(
            fz_final.pipeline_state.qpos - got_final.pipeline_state.qpos
        ))),
        "finite": bool(jnp.all(jnp.isfinite(got_data.observation))),
        "fast_lane_env_steps_per_s": B * T / t_best,
        "us_per_env_step_block": t_best / T * 1e6,
        "fused_env_steps_per_s": B * T / t_fz,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
