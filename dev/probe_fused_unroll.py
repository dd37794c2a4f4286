"""On-chip probe: whole-unroll fused kernel vs the scan-lane fast lane.

Measures (1) fused-kernel compile+run viability on the real TPU, (2)
unroll throughput fused vs scan lane at 4096/16384 envs, (3) parity of
the two lanes (checked AFTER all timing — device->host reads permanently
degrade tunneled dispatch, docs/ROADMAP.md).

Usage: python dev/probe_fused_unroll.py [T] [num_envs ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
BATCHES = [int(a) for a in sys.argv[2:]] or [4096, 16384]

os.environ.setdefault("PUPPAX_SOA_ENV", "auto")

from puppax.configs import get_config
from puppax.env import PupperV3Env, rollout, wrappers
from puppax.train import networks as ppo_networks

env = PupperV3Env(
    path=None,
    reward_config=get_config(),
    action_scale=0.75,
    observation_history=2,
    maximum_pitch_command=10.0,
    maximum_roll_command=10.0,
)
wrapped = wrappers.wrap_for_training(env, episode_length=1000)
nets = ppo_networks.make_ppo_networks(env.observation_size, env.action_size)
params = nets.policy_network.init(jax.random.PRNGKey(0))

print(f"[probe] backend={jax.default_backend()} T={T}", flush=True)

results = {}
for B in BATCHES:
    rngs = jax.random.split(jax.random.PRNGKey(1), B)
    state = jax.jit(wrapped.reset)(rngs)
    jax.block_until_ready(state)
    key = jax.random.PRNGKey(2)

    for lane in ("fused", "scan"):
        os.environ["PUPPAX_FUSED_UNROLL"] = "auto" if lane == "fused" else "off"
        fl = rollout.FastLane(wrapped, mode="kernel")
        assert fl.use_fused(T) == (lane == "fused")

        fn = jax.jit(
            lambda s, k, fl=fl: fl.unroll(
                s, (None, params), k, T, nets.policy_activation
            )
        )
        t0 = time.perf_counter()
        out = fn(state, key)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(state, key)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        sps = B * T / best
        results[(lane, B)] = out
        print(
            f"[probe] {lane:5s} B={B:6d}: compile {compile_s:6.1f}s  "
            f"best {best * 1e3:8.2f} ms  {sps / 1e6:7.2f}M env-steps/s",
            flush=True,
        )

# ---- parity (D2H only after all timing) --------------------------------
for B in BATCHES:
    f_state, f_data = results[("fused", B)]
    s_state, s_data = results[("scan", B)]
    for name in ("observation", "action", "reward", "discount"):
        a = np.asarray(getattr(f_data, name))
        b = np.asarray(getattr(s_data, name))
        err = float(np.max(np.abs(a - b)))
        print(f"[parity] B={B} {name}: max|d|={err:.3e}", flush=True)
    lp = float(
        np.max(
            np.abs(
                np.asarray(f_data.policy_extras["log_prob"])
                - np.asarray(s_data.policy_extras["log_prob"])
            )
        )
    )
    print(f"[parity] B={B} log_prob: max|d|={lp:.3e}", flush=True)
    qd = float(
        np.max(
            np.abs(
                np.asarray(f_state.pipeline_state.qpos)
                - np.asarray(s_state.pipeline_state.qpos)
            )
        )
    )
    print(f"[parity] B={B} final qpos: max|d|={qd:.3e}", flush=True)
print("[probe] done", flush=True)
