"""Pallas proof-of-concept: batch-on-lanes SPD solve (the ROADMAP SoA design).

Solves A x = b for (n, n) SPD systems with the env batch on the LANE
dimension — A (n, n, B), b (n, B) — one pallas kernel per batch tile with
every intermediate in VMEM/registers. This is the layout the full SoA
physics engine would use; the PoC quantifies its ceiling against the
current batch-first multiply-reduce implementation.

Usage: python dev/pallas_spd_poc.py [B] [--interpret]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from puppax.ops import linalg

N = 18
TILE = 256


def _spd_kernel(a_ref, b_ref, out_ref):
    A = a_ref[:]  # (N, N, T)
    b = b_ref[:]  # (N, T)
    cols = []
    for k in range(N):
        acc = A[k, :, :]  # row k == column k (symmetric)
        for j in range(k):
            acc = acc - cols[j][k : k + 1, :] * cols[j]
        pivot = jnp.sqrt(jnp.maximum(acc[k : k + 1, :], 1e-30))
        col = acc / pivot
        row_ids = jax.lax.broadcasted_iota(jnp.int32, col.shape, 0)
        col = jnp.where(row_ids >= k, col, 0.0)
        cols.append(col)
    ys = []
    for k in range(N):
        acc = b[k : k + 1, :]
        for j in range(k):
            acc = acc - cols[j][k : k + 1, :] * ys[j]
        ys.append(acc / cols[k][k : k + 1, :])
    xs = [None] * N
    for k in range(N - 1, -1, -1):
        acc = ys[k]
        for j in range(N - 1, k, -1):
            acc = acc - cols[k][j : j + 1, :] * xs[j]
        xs[k] = acc / cols[k][k : k + 1, :]
    out_ref[:] = jnp.concatenate(xs, axis=0)


def pallas_spd_solve(A_t: jnp.ndarray, b_t: jnp.ndarray, interpret=False):
    """A_t: (N, N, B), b_t: (N, B) -> x (N, B)."""
    B = A_t.shape[-1]
    grid = (B // TILE,)
    return pl.pallas_call(
        _spd_kernel,
        out_shape=jax.ShapeDtypeStruct((N, B), A_t.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, N, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A_t, b_t)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4096
    interpret = "--interpret" in sys.argv
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, N, N)).astype(np.float32)
    A = M @ np.swapaxes(M, 1, 2) + 3.0 * np.eye(N, dtype=np.float32)
    b = rng.standard_normal((B, N)).astype(np.float32)

    A_j, b_j = jnp.asarray(A), jnp.asarray(b)
    A_t = jnp.moveaxis(A_j, 0, -1) + 0.0
    b_t = jnp.moveaxis(b_j, 0, -1) + 0.0

    # correctness vs the batch-first implementation
    x_ref = jax.jit(jax.vmap(linalg.spd_solve))(A_j, b_j)
    x_pl = pallas_spd_solve(A_t, b_t, interpret=interpret)
    err = float(jnp.max(jnp.abs(jnp.moveaxis(x_pl, -1, 0) - x_ref)))
    rel = err / float(jnp.max(jnp.abs(x_ref)))
    print(f"max abs err vs batch-first: {err:.3e} (rel {rel:.3e})")
    assert rel < 1e-4

    if interpret:
        print("interpret-mode correctness OK")
        return

    ITERS = 50

    def bench(fn, *args):
        # amortize the ~25 ms tunnel dispatch latency: ITERS applications
        # inside one jit, each perturbing b so nothing hoists
        def loop(args_):
            def body(carry, i):
                out = fn(args_[0], args_[1] + i * 1e-20)
                return carry + jnp.sum(out), ()

            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), jnp.arange(ITERS, dtype=jnp.float32)
            )
            return acc

        jl = jax.jit(loop)
        out = jl(args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = jl(args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best / ITERS

    t_ref = bench(lambda a, c: jax.vmap(linalg.spd_solve)(a, c), A_j, b_j)
    t_pl = bench(lambda a, c: pallas_spd_solve(a, c), A_t, b_t)
    print(f"batch-first multiply-reduce: {t_ref*1e3:7.3f} ms/solve")
    print(f"pallas batch-on-lanes:       {t_pl*1e3:7.3f} ms/solve  ({t_ref/t_pl:.2f}x)")


if __name__ == "__main__":
    main()
