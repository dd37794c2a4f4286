"""Does Mosaic fuse mul+add chains into VPU multiply-adds?

The wrapped-step emission is ~43k jaxpr equations, half of them `mul`
with a dependent `add` consumer (docs/ROADMAP.md r4 op census). JAX has
no fma primitive, so the only way those pairs become single VPU
multiply-adds is a Mosaic/LLVM peephole. This probe measures it
directly: two kernels over the same (8, 128) tile, one issuing K
dependent mul+add pairs (y = y*a + b), one issuing 2K dependent adds
(same op count, no fusible pattern). If Mosaic fuses, the first runs
~2x faster per op-pair; if the times match op-for-op, there is no
peephole and emission-level op-count reduction is the only lever.

Usage: python dev/probe_fma_fusion.py [K]
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

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
GRID = 512  # repeat the body across grid steps so launch cost amortizes


def build(body):
    def kernel(a_ref, b_ref, o_ref):
        # seed with program_id so the body cannot be hoisted out of the
        # grid loop as loop-invariant (first probe version measured pure
        # grid overhead: times did not scale with K)
        t = pl.program_id(0).astype(jnp.float32)
        a = a_ref[...] + t * 1e-9
        b = b_ref[...]
        o_ref[...] = body(a, b)

    spec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel, grid=(GRID,), in_specs=[spec, spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)

    return run


def muladd_chain(a, b):
    y = a
    for _ in range(K):
        y = y * a + b  # fusible pair
    return y


def add_chain(a, b):
    y = a
    for _ in range(2 * K):
        y = y + b  # same op count, nothing to fuse
    return y


def mul_chain(a, b):
    y = a
    for _ in range(2 * K):
        y = y * a
    return y


def timeit(fn, a, b):
    out = fn(a, b)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(a, b)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"[probe] backend={jax.default_backend()} K={K} grid={GRID}", flush=True)
    a = jnp.full((8, 128), 1.0000001, jnp.float32)
    b = jnp.full((8, 128), 1e-7, jnp.float32)
    results = {}
    for name, body in (("muladd", muladd_chain), ("add2k", add_chain),
                       ("mul2k", mul_chain)):
        t = timeit(build(body), a, b)
        ops = (K if name == "muladd" else 2 * K) * GRID
        # muladd issues K pairs = 2K arithmetic ops if unfused, K if fused
        results[name] = t
        print(
            f"[probe] {name:7s}: {t * 1e3:8.3f} ms  "
            f"({t / (2 * K * GRID) * 1e9:6.3f} ns per scalar-op if unfused)",
            flush=True,
        )
    ratio = results["muladd"] / results["add2k"]
    print(
        f"[probe] muladd/add2k = {ratio:.3f} "
        f"(~0.5 => Mosaic fuses mul+add; ~1.0 => no fusion)",
        flush=True,
    )


if __name__ == "__main__":
    main()
