"""Worker: compiled fused env-step kernel vs the physics-kernel-only path
on the accelerator.

Run by tests/test_soa_env.py::test_on_device_env_kernel in a subprocess
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

    import xml.etree.ElementTree as ET

    from puppax.configs import get_config
    from puppax.env import PupperV3Env
    from puppax.model import assets, obstacles, terrain

    config = sys.argv[1] if len(sys.argv) > 1 else "flat"
    B = 2048
    T = 3
    STEPS_TIMED = 50

    xml_string = None
    if config == "obstacles":
        tree = obstacles.add_boxes_to_model(
            assets.pupper_xml_tree(), n_boxes=8, x_range=(-3.0, 3.0),
            y_range=(-3.0, 3.0),
        )
        xml_string = ET.tostring(tree.getroot(), encoding="unicode")
    elif config == "hfield":
        tree = terrain.add_heightfield_to_model(assets.pupper_xml_tree())
        xml_string = ET.tostring(tree.getroot(), encoding="unicode")
    elif config == "capsule":
        tree = assets.pupper_xml_tree()
        for geom in tree.getroot().iter("geom"):
            if geom.get("type") == "sphere" and geom.get("size") == "0.01995":
                geom.set("type", "capsule")
                geom.set("size", "0.015 0.02")
        xml_string = ET.tostring(tree.getroot(), encoding="unicode")

    def build(env_mode):
        os.environ["PUPPAX_SOA"] = "auto"
        os.environ["PUPPAX_SOA_ENV"] = env_mode
        return PupperV3Env(
            path=None,
            xml_string=xml_string,
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
        assert env._use_soa_env
        step = jax.jit(jax.vmap(env.step))
        state = jax.jit(jax.vmap(env.reset))(rngs)
        warm = step(state, actions[0])
        jax.block_until_ready(warm.obs)
        # trajectory for comparison
        st = state
        for t in range(T):
            st = step(st, actions[t])
        jax.block_until_ready(st.obs)
        results[mode] = st

        # timed: ONE jitted scan block of STEPS_TIMED steps (a single
        # dispatch). Per-step Python dispatches through the tunneled TPU
        # cost a full RPC round-trip each, so a per-step loop measures
        # tunnel latency, not device time (r3: the old loop read 1.6-16
        # ms/step for kernels that cost ~100 us on-device).
        @jax.jit
        def block(s0):
            def body(s, _):
                return step(s, actions[0]), ()

            s_out, _ = jax.lax.scan(body, s0, (), length=STEPS_TIMED)
            return s_out

        st2 = block(st)  # compile warmup
        jax.block_until_ready(st2.obs)
        # median of 3 back-to-back blocks: the r4 queue saw one-off 2.6x
        # outliers on this gate that flipped WHICH config failed between
        # same-day runs — single-shot timing on the tunneled backend is
        # not a gate-grade measurement (VERDICT r4 item 5)
        per_block = []
        for _ in range(3):
            t0 = time.perf_counter()
            st2 = block(st2)
            jax.block_until_ready(st2.obs)
            per_block.append((time.perf_counter() - t0) / STEPS_TIMED)
        timings[mode] = sorted(per_block)[1]
        timings[mode + "_all"] = per_block

    # tunnel-health probe: median dispatch+sync latency of a trivial
    # jitted op. A healthy tunnel sits at ~1-2 ms; tens of ms means the
    # session is degraded and the kernel-vs-kernel ratio below carries
    # environment noise — recorded so a gate failure is diagnosable from
    # the JSON alone (VERDICT r4 item 5). block_until_ready is not a D2H
    # read, so this does not trip the dispatch-degradation trap.
    tiny = jax.jit(lambda x: x + 1.0)
    z = tiny(jnp.zeros((8, 128), jnp.float32))
    jax.block_until_ready(z)
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        z = tiny(z)
        jax.block_until_ready(z)
        lat.append(time.perf_counter() - t0)
    dispatch_ms = sorted(lat)[2] * 1e3

    # D2H reads only now
    a, b = results["auto"], results["off"]
    out = {
        "backend": backend,
        "dispatch_ms": dispatch_ms,
        "env_kernel_us_per_step_all": [t * 1e6 for t in timings["auto_all"]],
        "phys_kernel_us_per_step_all": [t * 1e6 for t in timings["off_all"]],
        "d_q": float(jnp.max(jnp.abs(a.pipeline_state.qpos - b.pipeline_state.qpos))),
        "d_obs": float(jnp.max(jnp.abs(a.obs - b.obs))),
        "d_rew": float(jnp.max(jnp.abs(a.reward - b.reward))),
        "d_done": float(jnp.max(jnp.abs(a.done - b.done))),
        "d_step": float(jnp.max(jnp.abs(
            (a.info["step"] - b.info["step"]).astype(jnp.float32)))),
        "finite": bool(jnp.all(jnp.isfinite(a.obs))),
        "env_kernel_us_per_step": timings["auto"] * 1e6,
        "phys_kernel_us_per_step": timings["off"] * 1e6,
        "env_kernel_env_steps_per_s": B / timings["auto"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
