#!/usr/bin/env python
"""Probe: is a large unrolled batch-on-lanes pallas kernel viable?

Approximates one physics substep's op mix (quaternion chains, small dot
products, a few thousand fused elementwise ops) in SoA form — every
physics scalar a (SUB, LANE) tile over the env batch — and measures
compile time + steady-state throughput on the TPU at B=4096.

Compare against the round-1 XLA path: 651k env-steps/s = 1.26 ms/substep.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 4096
SUB, LANE = 8, 128
TILE_B = SUB * LANE  # 1024


def qmul(a, b):
    """Quaternion product on component tuples of (SUB, LANE) tiles."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def rot(v, q):
    """Rotate vector tuple v by quaternion tuple q (brax rotate formula)."""
    w, x, y, z = q
    vx, vy, vz = v
    uv = x * vx + y * vy + z * vz
    uu = x * x + y * y + z * z
    s = w
    cx = y * vz - z * vy
    cy = z * vx - x * vz
    cz = x * vy - y * vx
    k = s * s - uu
    return (
        2 * uv * x + k * vx + 2 * s * cx,
        2 * uv * y + k * vy + 2 * s * cy,
        2 * uv * z + k * vz + 2 * s * cz,
    )


def substep_like_kernel(q_ref, v_ref, out_ref):
    # load 19 q components + 18 v components as (SUB, LANE) tiles
    q = [q_ref[i] for i in range(19)]
    v = [v_ref[i] for i in range(18)]

    # base quaternion normalize
    n = jax.lax.rsqrt(q[3] * q[3] + q[4] * q[4] + q[5] * q[5] + q[6] * q[6])
    base_q = (q[3] * n, q[4] * n, q[5] * n, q[6] * n)

    # FK-like chains: 12 hinge bodies, each a couple of qmuls + rotations
    acc = [q[0], q[1], q[2]]
    quats = []
    for i in range(12):
        half = 0.5 * q[7 + i]
        c, s = jnp.cos(half), jnp.sin(half)
        qloc = (c, s * 0.1, s * 0.2, s * 0.97)
        bq = qmul(base_q if i < 4 else quats[i - 4], qloc)
        quats.append(bq)
        p = rot((acc[0] * 0.01, acc[1] * 0.02, 0.03 + 0 * acc[2]), bq)
        acc = [acc[0] + p[0], acc[1] + p[1], acc[2] + p[2]]

    # CRB/RNE-like: many small dot products / multiply-adds
    outv = list(v)
    for r in range(60):
        s = 0.0
        for i in range(18):
            s = s + outv[i] * (0.01 * (i + r % 7))
        for i in range(18):
            outv[i] = outv[i] + 0.001 * s * quats[i % 12][r % 4]

    # cholesky-like: triangular dependency chain
    cols = []
    for k in range(18):
        a = outv[k]
        for j in range(len(cols)):
            a = a - cols[j] * cols[j] * 0.01
        cols.append(jax.lax.rsqrt(jnp.abs(a) + 1.0))

    # integrate-like
    for i in range(3):
        out_ref[i] = q[i] + 0.004 * outv[i] + 0.0001 * acc[i]
    for i, c in enumerate(base_q):
        out_ref[3 + i] = c
    for i in range(12):
        out_ref[7 + i] = q[7 + i] + 0.004 * outv[6 + i] + 0.0001 * cols[i]


@jax.jit
def soa_substep(q, v):
    # q: (19, B), v: (18, B) -> out (19, B)
    nb = B // TILE_B
    return pl.pallas_call(
        substep_like_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((19, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((18, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((19, SUB, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((19, B // LANE, LANE), jnp.float32),
    )(q.reshape(19, B // LANE, LANE), v.reshape(18, B // LANE, LANE)).reshape(19, B)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (19, B), jnp.float32)
    v = jax.random.normal(key, (18, B), jnp.float32)

    t0 = time.perf_counter()
    out = soa_substep(q, v)
    jax.block_until_ready(out)
    print(f"compile+first run: {time.perf_counter()-t0:.2f}s")

    # chain 100 substeps to amortize dispatch
    @jax.jit
    def chain(q, v):
        def body(carry, _):
            q, v = carry
            q = soa_substep(q, v)
            return (q, v), ()
        (q, v), _ = jax.lax.scan(body, (q, v), (), length=100)
        return q

    t0 = time.perf_counter()
    out = chain(q, v)
    jax.block_until_ready(out)
    print(f"chain compile: {time.perf_counter()-t0:.2f}s")
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(q, v))
        dt = time.perf_counter() - t0
        best = min(best, dt)
    per_substep = best / 100
    print(f"per-substep: {per_substep*1e6:.1f} us at B={B} "
          f"(XLA r1 ~1260 us; env-step = 5 substeps)")


if __name__ == "__main__":
    main()
