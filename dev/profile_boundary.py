"""Isolate the SoA kernel-boundary cost: tiles-resident vs per-step
transposes vs full custom_vmap splice.

The r3 stack profile showed 'physics only' through the splice at
~1.69 ms/step @4096 while the kernel itself measures ~50 us — this
pinpoints where the other ~1.6 ms goes. Variants (each a 50-step scan
under one jit, tunneled-TPU rules: no D2H until all timing is done):

  tiles-resident   carry (rows, B/LANE, LANE) tiles; kernel only
  transpose-bound  carry (B, rows); to_tiles -> kernel -> from_tiles
  transpose-only   carry (B, rows); to_tiles -> from_tiles (no kernel)
  splice           carry PhysicsState-ish; full _cv_pipeline_step path

Usage: python dev/profile_boundary.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PUPPAX_PROFILE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_PROFILE_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from puppax.configs import get_config
from puppax.env import PupperV3Env
from puppax.physics import soa

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = int(os.environ.get("PUPPAX_PROFILE_ITERS", "50"))

env = PupperV3Env(path=None, reward_config=get_config(), action_scale=0.75,
                  observation_history=2, maximum_pitch_command=10.0,
                  maximum_roll_command=10.0)
m = env.model
s = soa._Static(m, env.mj_model)
n_substeps = env._n_substeps

qpos0 = jnp.tile(jnp.asarray(np.array(m.qpos0, np.float32))[None], (B, 1))
qvel0 = jnp.zeros((B, m.nv), jnp.float32)
ctrl0 = jnp.tile(jnp.asarray(np.array(m.qpos0[7:], np.float32))[None], (B, 1))
dr = soa.dr_inputs(m, s, B)

results = []


def timeit(name, fn, carry):
    jfn = jax.jit(fn)
    out = jfn(carry)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(carry)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    us = best / ITERS * 1e6
    results.append((name, us))
    print(f"{name:16s} {us:9.1f} us/step  "
          f"{B / (us / 1e6) / 1e6:7.2f} M env-steps/s", flush=True)


# --- variant 1: tiles-resident (the fast-lane hypothesis) -----------------
kernel = soa._build_kernel(s, n_substeps, True)
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

Bp = ((B + soa.TILE_B - 1) // soa.TILE_B) * soa.TILE_B
nb = Bp // soa.TILE_B


def spec(rows):
    return pl.BlockSpec((rows, soa.SUB, soa.LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


dr_rows = []
for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
    dr_rows.append(dr[name].reshape(B, n).astype(jnp.float32))
dr_t = soa._to_tiles(jnp.concatenate(dr_rows, axis=1), Bp)


def kernel_call(q_t, v_t, c_t):
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(s.nq), spec(s.nv), spec(s.nu), spec(s.ndr)],
        out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache)],
        out_shape=[
            jax.ShapeDtypeStruct((s.nq, Bp // soa.LANE, soa.LANE), jnp.float32),
            jax.ShapeDtypeStruct((s.nv, Bp // soa.LANE, soa.LANE), jnp.float32),
            jax.ShapeDtypeStruct((s.ncache, Bp // soa.LANE, soa.LANE), jnp.float32),
        ],
        interpret=(jax.default_backend() == "cpu"),
        compiler_params=None if jax.default_backend() == "cpu" else
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(q_t, v_t, c_t, dr_t)


q_t0 = soa._to_tiles(qpos0, Bp)
v_t0 = soa._to_tiles(qvel0, Bp)
c_t0 = soa._to_tiles(ctrl0, Bp)


def tiles_resident(carry):
    def body(c, _):
        q_t, v_t = c
        q2, v2, _cache = kernel_call(q_t, v_t, c_t0)
        return (q2, v2), ()

    (q_t, v_t), _ = jax.lax.scan(body, carry, (), length=ITERS)
    return q_t, v_t


timeit("tiles-resident", tiles_resident, (q_t0, v_t0))


# --- variant 2: per-step transposes around the kernel ----------------------
def transpose_bound(carry):
    def body(c, _):
        q, v = c
        q2t, v2t, _cache = kernel_call(
            soa._to_tiles(q, Bp), soa._to_tiles(v, Bp), c_t0
        )
        return (soa._from_tiles(q2t, Bp), soa._from_tiles(v2t, Bp)), ()

    (q, v), _ = jax.lax.scan(body, carry, (), length=ITERS)
    return q, v


timeit("transpose-bound", transpose_bound, (qpos0, qvel0))


# --- variant 3: transposes only (cache-sized traffic, no kernel) -----------
cache0 = jnp.zeros((B, s.ncache), jnp.float32)


def transpose_only(carry):
    def body(c, _):
        q, v, cache = c
        q_t = soa._to_tiles(q, Bp)
        v_t = soa._to_tiles(v, Bp)
        cache_t = soa._to_tiles(cache, Bp)
        # touch the tiles so XLA can't elide the relayouts
        q2 = soa._from_tiles(q_t, Bp) * 1.0000001
        v2 = soa._from_tiles(v_t, Bp) * 1.0000001
        cache2 = soa._from_tiles(cache_t, Bp) * 1.0000001
        return (q2, v2, cache2), ()

    out, _ = jax.lax.scan(body, carry, (), length=ITERS)
    return out


timeit("transpose-only", transpose_only, (qpos0, qvel0, cache0))


# --- variant 4: the current splice (PhysicsState assembly included) --------
def splice(carry):
    def body(c, _):
        q, v = c
        ps = jax.vmap(lambda qq, vv, cc: env._cv_pipeline_step(m, qq, vv, cc))(
            q, v, ctrl0
        )
        return (ps.qpos, ps.qvel), ()

    out, _ = jax.lax.scan(body, carry, (), length=ITERS)
    return out


timeit("splice", splice, (qpos0, qvel0))
