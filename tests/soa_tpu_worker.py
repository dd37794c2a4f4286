"""Worker: compiled SoA kernel vs XLA path on the accelerator.

Run by tests/test_soa.py::test_on_device_soa_matches_xla in a subprocess
with default platform resolution. Prints one JSON line.

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
import numpy as np

# in-process pin for CPU smokes: the image's sitecustomize re-pins the
# accelerator over JAX_PLATFORMS, and axon backend RESOLUTION hangs when
# the TPU tunnel is down — so plain env vars can't force cpu here
if os.environ.get("PUPPAX_WORKER_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_WORKER_PLATFORM"])


def main():
    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"backend": "cpu"}))
        return

    from puppax.configs import get_config
    from puppax.env import PupperV3Env

    B = 2048
    T = 3

    def build(mode):
        os.environ["PUPPAX_SOA"] = mode
        # this worker compares the PHYSICS kernel vs the XLA physics path;
        # the fused env-step kernel would swallow both legs if left on
        os.environ["PUPPAX_SOA_ENV"] = "off"
        return PupperV3Env(
            path=None,
            reward_config=get_config(),
            action_scale=0.75,
            observation_history=2,
        )

    rngs = jax.random.split(jax.random.PRNGKey(5), B)
    actions = [
        jax.random.uniform(jax.random.PRNGKey(50 + t), (B, 12), minval=-0.5, maxval=0.5)
        for t in range(T)
    ]

    results = {}
    timings = {}
    for mode in ("auto", "off"):
        env = build(mode)
        assert env._use_soa_cv == (mode == "auto") or mode == "off"
        step = jax.jit(jax.vmap(env.step))
        state = jax.jit(jax.vmap(env.reset))(rngs)
        # warmup one step (compiles)
        warm = step(state, actions[0])
        jax.block_until_ready(warm.obs)
        # trajectory for comparison (per-step on purpose: T distinct
        # actions, same call pattern both modes)
        st = state
        for t in range(T):
            st = step(st, actions[t])
        jax.block_until_ready(st.obs)
        results[mode] = st

        # timed: ONE jitted scan block (a single dispatch) — a per-step
        # Python loop through the tunneled TPU measures RPC latency, not
        # device time (r3: it read seconds/step for ~100 us kernels)
        STEPS_TIMED = 50

        @jax.jit
        def block(s0):
            def body(s, _):
                return step(s, actions[0]), ()

            s_out, _ = jax.lax.scan(body, s0, (), length=STEPS_TIMED)
            return s_out

        st2 = block(st)
        jax.block_until_ready(st2.obs)
        t0 = time.perf_counter()
        st2 = block(st2)
        jax.block_until_ready(st2.obs)
        timings[mode] = (time.perf_counter() - t0) / STEPS_TIMED

    # D2H reads only now
    a, b = results["auto"], results["off"]
    out = {
        "backend": backend,
        "d_q": float(jnp.max(jnp.abs(a.pipeline_state.qpos - b.pipeline_state.qpos))),
        "d_obs": float(jnp.max(jnp.abs(a.obs - b.obs))),
        "d_rew": float(jnp.max(jnp.abs(a.reward - b.reward))),
        "d_done": float(jnp.max(jnp.abs(a.done - b.done))),
        "finite": bool(jnp.all(jnp.isfinite(a.obs))),
        "soa_us_per_step": timings["auto"] * 1e6,
        "xla_us_per_step": timings["off"] * 1e6,
        "soa_env_steps_per_s": B / timings["auto"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
