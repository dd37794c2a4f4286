"""Is the ~500 us/step floor per-scan-iteration overhead?

Variants, each 50 'steps' at B:
  scan-xla-add      lax.scan of x+1 on a tiny array (pure loop overhead)
  scan-xla-add-big  lax.scan of elementwise ops on (B, 512) (real data)
  scan-pallas       lax.scan of the copy kernel (the known ~520 us floor)
  unroll-pallas     same but lax.scan(..., unroll=50)
  pyloop-pallas     Python-unrolled 50 calls under one jit

Usage: python dev/profile_scan.py [B]
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
from jax.experimental.pallas import tpu as pltpu

from puppax.physics import soa

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
ITERS = 50
SUB, LANE = soa.SUB, soa.LANE
Bp = ((B + soa.TILE_B - 1) // soa.TILE_B) * soa.TILE_B
nb = Bp // soa.TILE_B
NQ = 19


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
    print(f"{name:18s} {best / ITERS * 1e6:9.1f} us/step", flush=True)


x_small = jnp.zeros((128,), jnp.float32)
x_big = jnp.zeros((B, 512), jnp.float32)
q_t = jnp.zeros((NQ, Bp // LANE, LANE), jnp.float32)


def scan_add(x):
    def body(c, _):
        return c + 1.0, ()

    out, _ = jax.lax.scan(body, x, (), length=ITERS)
    return out


timeit("scan-xla-add", scan_add, x_small)


def scan_add_big(x):
    def body(c, _):
        return jnp.tanh(c) + 1.0, ()

    out, _ = jax.lax.scan(body, x, (), length=ITERS)
    return out


timeit("scan-xla-add-big", scan_add_big, x_big)


def copy_kernel(q_ref, qo):
    for i in range(NQ):
        qo[i] = q_ref[i] + 1e-7


def spec(rows):
    return pl.BlockSpec((rows, SUB, LANE), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def kcall(q):
    return pl.pallas_call(
        copy_kernel, grid=(nb,),
        in_specs=[spec(NQ)],
        out_specs=spec(NQ),
        out_shape=jax.ShapeDtypeStruct((NQ, Bp // LANE, LANE), jnp.float32),
    )(q)


def scan_pallas(q):
    def body(c, _):
        return kcall(c), ()

    out, _ = jax.lax.scan(body, q, (), length=ITERS)
    return out


timeit("scan-pallas", scan_pallas, q_t)


def unroll_pallas(q):
    def body(c, _):
        return kcall(c), ()

    out, _ = jax.lax.scan(body, q, (), length=ITERS, unroll=ITERS)
    return out


timeit("unroll-pallas", unroll_pallas, q_t)


def pyloop_pallas(q):
    for _ in range(ITERS):
        q = kcall(q)
    return q


timeit("pyloop-pallas", pyloop_pallas, q_t)
