"""Does a batch-tile-major contiguous block layout kill the ~500 us fixed
kernel overhead?

Current layout: arrays (rows, B/LANE, LANE), block (rows, SUB, LANE) at
(0, i, 0) — each grid step DMAs `rows` strided 4 KB chunks per operand.
Candidate: arrays (nb, rows, SUB, LANE), block (1, rows, SUB, LANE) at
(i, 0, 0, 0) — one contiguous DMA per operand per grid step.

Times the fk-limited kernel (near-zero compute -> pure overhead) and the
full kernel in both layouts, tiles-resident scan, B as given.

Usage: python dev/profile_layout.py [B]
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
SUB, LANE = soa.SUB, soa.LANE

dr_rows = []
for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
    dr_rows.append(dr[name].reshape(B, n).astype(jnp.float32))
dr_flat = jnp.concatenate(dr_rows, axis=1)


def to_tiles_rowmajor(x):
    return soa._to_tiles(x, Bp)


def to_tiles_tilemajor(x):
    rows = x.shape[1]
    # (B, rows) -> (rows, nb, SUB, LANE) -> (nb, rows, SUB, LANE)
    t = x.T.reshape(rows, nb, SUB, LANE)
    return jnp.transpose(t, (1, 0, 2, 3))


class _Sub:
    """Adapter presenting a (1, rows, SUB, LANE) block ref as rows[i]."""

    def __init__(self, ref):
        self._ref = ref

    def __getitem__(self, i):
        return self._ref[0, i]

    def __setitem__(self, i, v):
        self._ref[0, i] = v


def run(layout, phase):
    soa.PHASE_LIMIT = phase
    base_kernel = soa._build_kernel(s, n_substeps, True)

    if layout == "rowmajor":
        def spec(rows):
            return pl.BlockSpec((rows, SUB, LANE), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)

        def shape(rows):
            return jax.ShapeDtypeStruct((rows, Bp // LANE, LANE), jnp.float32)

        kern = base_kernel
        conv = to_tiles_rowmajor
    else:
        def spec(rows):
            return pl.BlockSpec((1, rows, SUB, LANE), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        def shape(rows):
            return jax.ShapeDtypeStruct((nb, rows, SUB, LANE), jnp.float32)

        def kern(*refs):
            base_kernel(*[_Sub(r) for r in refs])

        conv = to_tiles_tilemajor

    q_t0, v_t0, c_t0 = conv(qpos0), conv(qvel0), conv(ctrl0)
    dr_t = conv(dr_flat)

    def kcall(q_t, v_t):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[spec(s.nq), spec(s.nv), spec(s.nu), spec(s.ndr)],
            out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache)],
            out_shape=[shape(s.nq), shape(s.nv), shape(s.ncache)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(q_t, v_t, c_t0, dr_t)

    def loop(carry):
        def body(c, _):
            q2, v2, _ = kcall(*c)
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
    print(f"{layout:10s} {str(phase or 'full'):6s} {us:9.1f} us/step  "
          f"{B / (us / 1e6) / 1e6:7.2f} M env-steps/s", flush=True)


for layout in ("rowmajor", "tilemajor"):
    for phase in ("fk", None):
        run(layout, phase)
soa.PHASE_LIMIT = None
