"""Isolate per-scan-iteration overhead on the accelerator.

Times jitted scans of (a) a trivial pallas kernel, (b) the fused SoA
physics kernel, (c) a pure-XLA elementwise body, (d) a trivial pallas
kernel with an 8x-larger grid — each as ONE dispatch of a 50-iteration
scan, no D2H until all timing is done. If (a) ~ (b) >> (c), the per-step
cost is pallas LAUNCH overhead, not kernel compute, and the fix is
fusing multiple env-steps per launch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("PUPPAX_PROFILE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_PROFILE_PLATFORM"])

N = 50


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def trivial_pallas_scan(nb):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    spec = pl.BlockSpec((8, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(x):
        def body(c, _):
            y = pl.pallas_call(
                kernel, grid=(nb,), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(c)
            return y, ()
        y, _ = jax.lax.scan(body, x, (), length=N)
        return y

    x = jnp.ones((8 * nb, 8, 128), jnp.float32)
    return timeit(run, x)


def physics_kernel_scan(B):
    from puppax.configs import get_config
    from puppax.env import PupperV3Env
    from puppax.physics import soa

    env = PupperV3Env(path=None, reward_config=get_config(),
                      action_scale=0.75, observation_history=2)
    m = env.model
    s = soa._Static(m, env.mj_model)
    dr = soa.dr_inputs(m, s, B)
    qpos = jnp.tile(jnp.asarray(m.qpos0, jnp.float32)[None], (B, 1))
    qvel = jnp.zeros((B, s.nv), jnp.float32)
    ctrl = jnp.zeros((B, s.nu), jnp.float32)

    @jax.jit
    def run(q, v):
        def body(carry, _):
            q_, v_ = carry
            q2, v2, _ = soa.step_batched(s, q_, v_, ctrl, dr, 5)
            return (q2, v2), ()
        (q2, v2), _ = jax.lax.scan(body, (q, v), (), length=N)
        return q2
    return timeit(run, qpos, qvel)


def xla_scan(B):
    @jax.jit
    def run(x):
        def body(c, _):
            return c * 0.999 + 0.001, ()
        y, _ = jax.lax.scan(body, x, (), length=N)
        return y
    x = jnp.ones((B, 64), jnp.float32)
    return timeit(run, x)


def main():
    results = {}
    results["trivial_pallas_4tiles"] = trivial_pallas_scan(4)
    results["trivial_pallas_32tiles"] = trivial_pallas_scan(32)
    results["physics_kernel_4096"] = physics_kernel_scan(4096)
    results["xla_elementwise_4096"] = xla_scan(4096)
    print(f"backend={jax.default_backend()} N={N}")
    for k, v in results.items():
        print(f"{k:26s} {v*1e3:8.2f} ms/block  {v/N*1e6:8.1f} us/iter")


if __name__ == "__main__":
    main()
