"""Phase profile of the fast-lane unroll on the accelerator.

Times, each as a separate jitted block (single dispatch, no D2H until all
timing is done): the pre-drawn noise block, the eps draw, a scan of
kernel-only steps (no policy), the policy apply alone, and the full
unroll. Localizes regressions like the r4 finding that train_unroll@4096
ran at 2.2M env-steps/s while the per-step lane ran 3.3M-equivalent.

PUPPAX_PROFILE_PLATFORM=cpu for a CPU smoke.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("PUPPAX_PROFILE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_PROFILE_PLATFORM"])


def main():
    from puppax.configs import get_config
    from puppax.env import PupperV3Env, rollout, wrappers
    from puppax.train import networks as ppo_networks, running_statistics

    B = int(os.environ.get("B", 4096))
    T = int(os.environ.get("T", 20))

    env = PupperV3Env(
        path=None, reward_config=get_config(), action_scale=0.75,
        observation_history=2, maximum_pitch_command=10.0,
        maximum_roll_command=10.0,
    )
    wrapped = wrappers.wrap_for_training(env, episode_length=1000)
    ok, reason = rollout.support_reason(wrapped)
    assert ok, reason
    fl = rollout.FastLane(wrapped)
    nets = ppo_networks.make_ppo_networks(env.observation_size, env.action_size)
    params = nets.policy_network.init(jax.random.PRNGKey(0))
    norm = running_statistics.init_state(env.observation_size)

    state = jax.jit(wrapped.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    key = jax.random.PRNGKey(1)

    timings = {}

    def timeit(name, fn, *args):
        out = fn(*args)  # compile
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        timings[name] = best
        return out

    # 1. noise pre-draw block
    rngs = state.info["rng"]
    noise_fn = jax.jit(lambda r: fl.draw_noise_block(r, T))
    timeit("noise_block", noise_fn, rngs)

    # 2. eps draw (key chain + normals)
    def eps_fn(k):
        def key_step(kk, _):
            cur, nxt = jax.random.split(kk)
            return nxt, cur
        _, used = jax.lax.scan(key_step, k, (), length=T)
        return jax.vmap(
            lambda u: jax.random.normal(u, (B, 12), jnp.float32)
        )(used)
    timeit("eps_draw", jax.jit(eps_fn), key)

    # 3. kernel-only scan: T wrapped-kernel steps on fixed action rows
    carry0 = fl.carry_from_state(state)
    Bp = carry0["q"].shape[1] * rollout.LANE
    act_t = jnp.zeros((12, Bp // rollout.LANE, rollout.LANE), jnp.float32)
    _, noise_tiles, _ = noise_fn(rngs)

    @jax.jit
    def kernel_scan(c, noise):
        def body(carry, noi):
            q, v, e, w = carry
            q2, v2, e2, w2, aux = fl._step_tiles(
                q, v, act_t, e, noi, c["dr"], c["first"], w
            )
            return (q2, v2, e2, w2), aux[:1]
        (q, v, e, w), aux = jax.lax.scan(
            body, (c["q"], c["v"], c["env"], c["wrap"]), noise
        )
        return q, aux
    timeit("kernel_scan", kernel_scan, carry0, noise_tiles)

    # 4. policy apply alone, T times scanned
    papply = fl.policy_rows(norm, params, nets.policy_activation)
    obs_r0, obs_n = fl.es.env_rows["obs_history"]
    obs_t = carry0["env"][obs_r0 : obs_r0 + obs_n]
    eps_t = act_t

    @jax.jit
    def policy_scan(o, e):
        def body(carry, _):
            a, raw, lp = papply(carry, e)
            return carry, lp
        _, lps = jax.lax.scan(body, o, (), length=T)
        return lps
    timeit("policy_scan", policy_scan, obs_t, eps_t)

    # 5. carry round-trip alone
    @jax.jit
    def carry_roundtrip(s):
        c = fl.carry_from_state(s)
        naux = sum(n for _, n in fl._aux_rows.values())
        aux_b = jnp.zeros((B, naux), jnp.float32)
        return fl.state_from_carry(c, s, s.info["rng"], s.info["kick"], aux_b)
    timeit("carry_roundtrip", carry_roundtrip, state)

    # 6. full unroll
    unroll = jax.jit(
        lambda s, k: fl.unroll(s, (norm, params), k, T, nets.policy_activation)
    )
    timeit("full_unroll", unroll, state, key)

    # D2H only now
    print(f"B={B} T={T} backend={jax.default_backend()}")
    for name, t in timings.items():
        per_step_us = t / T * 1e6
        print(f"{name:16s} {t*1e3:9.2f} ms/block  {per_step_us:9.1f} us/step "
              f"({B * T / t / 1e6:6.2f}M env-steps/s)")


if __name__ == "__main__":
    main()
