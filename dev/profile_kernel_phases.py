"""Per-phase cost INSIDE the fused SoA kernel (tiles-resident timing).

Builds one kernel per PHASE_LIMIT cut (fk -> ... -> full) and times each
over a 50-step scan with tile-layout carries (no boundary cost), so the
deltas are the marginal cost of each phase group at the given batch.

Usage: python dev/profile_kernel_phases.py [B]
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
n_substeps = env._n_substeps

qpos0 = jnp.tile(jnp.asarray(np.array(m.qpos0, np.float32))[None], (B, 1))
qvel0 = jnp.zeros((B, m.nv), jnp.float32)
ctrl0 = jnp.tile(jnp.asarray(np.array(m.qpos0[7:], np.float32))[None], (B, 1))
dr = soa.dr_inputs(m, s, B)

Bp = ((B + soa.TILE_B - 1) // soa.TILE_B) * soa.TILE_B
nb = Bp // soa.TILE_B
interp = jax.default_backend() == "cpu"


def spec(rows):
    return pl.BlockSpec((rows, soa.SUB, soa.LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


dr_rows = []
for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
    dr_rows.append(dr[name].reshape(B, n).astype(jnp.float32))
dr_t = soa._to_tiles(jnp.concatenate(dr_rows, axis=1), Bp)
q_t0 = soa._to_tiles(qpos0, Bp)
v_t0 = soa._to_tiles(qvel0, Bp)
c_t0 = soa._to_tiles(ctrl0, Bp)

PHASES = ["fk", "compos", "comvel", "crb", "rne", "smooth", "efc", None]
prev_us = 0.0
for phase in PHASES:
    soa.PHASE_LIMIT = phase
    kernel = soa._build_kernel(s, n_substeps, True)

    def kcall(q_t, v_t):
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
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q_t, v_t, c_t0, dr_t)

    def loop(carry):
        def body(c, _):
            q_t, v_t = c
            q2, v2, _ = kcall(q_t, v_t)
            return (q2, v2), ()

        out, _ = jax.lax.scan(body, carry, (), length=ITERS)
        return out

    jfn = jax.jit(loop)
    out = jfn((q_t0, v_t0))
    jax.block_until_ready(out[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn((q_t0, v_t0))
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    us = best / ITERS * 1e6
    name = phase or "full"
    print(f"{name:8s} {us:9.1f} us/step  (+{us - prev_us:8.1f})", flush=True)
    prev_us = us
soa.PHASE_LIMIT = None
