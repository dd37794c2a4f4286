"""Separate pallas-call fixed overhead (launch + operand DMA) from kernel
compute: empty/copy kernels with the real operand set vs ablated operands.

Usage: python dev/profile_overhead.py [B]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PUPPAX_PROFILE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PUPPAX_PROFILE_PLATFORM"])

import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

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

qpos0 = jnp.tile(jnp.asarray(np.array(m.qpos0, np.float32))[None], (B, 1))
qvel0 = jnp.zeros((B, m.nv), jnp.float32)
ctrl0 = jnp.tile(jnp.asarray(np.array(m.qpos0[7:], np.float32))[None], (B, 1))
dr = soa.dr_inputs(m, s, B)

Bp = ((B + soa.TILE_B - 1) // soa.TILE_B) * soa.TILE_B
nb = Bp // soa.TILE_B
SUB, LANE = soa.SUB, soa.LANE

dr_rows = []
for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
    dr_rows.append(dr[name].reshape(B, n).astype(jnp.float32))
dr_t = soa._to_tiles(jnp.concatenate(dr_rows, axis=1), Bp)
q_t0 = soa._to_tiles(qpos0, Bp)
v_t0 = soa._to_tiles(qvel0, Bp)
c_t0 = soa._to_tiles(ctrl0, Bp)

print(f"rows: nq={s.nq} nv={s.nv} nu={s.nu} ndr={s.ndr} ncache={s.ncache} "
      f"nb={nb}", flush=True)


def spec(rows):
    return pl.BlockSpec((rows, SUB, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def shape(rows):
    return jax.ShapeDtypeStruct((rows, Bp // LANE, LANE), jnp.float32)


def timeit(name, kcall, carry):
    def loop(c):
        def body(cc, _):
            out = kcall(*cc)
            return (out[0], out[1]), ()

        out, _ = jax.lax.scan(body, c, (), length=ITERS)
        return out

    jfn = jax.jit(loop)
    out = jfn(carry)
    jax.block_until_ready(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(carry)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    us = best / ITERS * 1e6
    print(f"{name:28s} {us:9.1f} us/step", flush=True)


# 1. copy kernel, full operand set (q,v,ctrl,dr -> q,v,cache)
def copy_kernel(q_ref, v_ref, c_ref, dr_ref, qo, vo, co):
    for i in range(s.nq):
        qo[i] = q_ref[i] + 1e-7
    for i in range(s.nv):
        vo[i] = v_ref[i] + 1e-7
    for i in range(s.ncache):
        co[i] = q_ref[0]


def call_copy(q_t, v_t):
    return pl.pallas_call(
        copy_kernel, grid=(nb,),
        in_specs=[spec(s.nq), spec(s.nv), spec(s.nu), spec(s.ndr)],
        out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache)],
        out_shape=[shape(s.nq), shape(s.nv), shape(s.ncache)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_t, v_t, c_t0, dr_t)


timeit("copy full-operands", call_copy, (q_t0, v_t0))


# 2. copy kernel, minimal operands (q, v only; no dr, no cache out)
def copy_min_kernel(q_ref, v_ref, qo, vo):
    for i in range(s.nq):
        qo[i] = q_ref[i] + 1e-7
    for i in range(s.nv):
        vo[i] = v_ref[i] + 1e-7


def call_copy_min(q_t, v_t):
    return pl.pallas_call(
        copy_min_kernel, grid=(nb,),
        in_specs=[spec(s.nq), spec(s.nv)],
        out_specs=[spec(s.nq), spec(s.nv)],
        out_shape=[shape(s.nq), shape(s.nv)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_t, v_t)


timeit("copy min-operands", call_copy_min, (q_t0, v_t0))


# 3. fk kernel without the cache output (program size, fewer writes)
soa.PHASE_LIMIT = "fk"
fk_kernel = soa._build_kernel(s, env._n_substeps, True)


def call_fk(q_t, v_t):
    return pl.pallas_call(
        fk_kernel, grid=(nb,),
        in_specs=[spec(s.nq), spec(s.nv), spec(s.nu), spec(s.ndr)],
        out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache)],
        out_shape=[shape(s.nq), shape(s.nv), shape(s.ncache)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_t, v_t, c_t0, dr_t)


timeit("fk full-operands", call_fk, (q_t0, v_t0))
soa.PHASE_LIMIT = None

# 4. grid=1 variant of the copy kernel (B=TILE_B slice) — per-grid-step cost
q_s, v_s = q_t0[:, :SUB], v_t0[:, :SUB]
c_s, dr_s = c_t0[:, :SUB], dr_t[:, :SUB]


def spec1(rows):
    return pl.BlockSpec((rows, SUB, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def call_copy_1(q_t, v_t):
    return pl.pallas_call(
        copy_kernel, grid=(1,),
        in_specs=[spec1(s.nq), spec1(s.nv), spec1(s.nu), spec1(s.ndr)],
        out_specs=[spec1(s.nq), spec1(s.nv), spec1(s.ncache)],
        out_shape=[
            jax.ShapeDtypeStruct((s.nq, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((s.nv, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((s.ncache, SUB, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(q_t, v_t, c_s, dr_s)


timeit("copy full-operands grid=1", call_copy_1, (q_s, v_s))
