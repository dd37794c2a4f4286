"""Small-matrix dense linear algebra tuned for the physics engine.

XLA's generic Cholesky lowers tiny (nv x nv) factorizations into enormous
blocked loop nests (~50k HLO instructions for 18x18 under vmap) that
dominate both compile and run time on CPU and TPU. For the engine's
fixed, tiny, well-conditioned SPD systems (mass matrix + armature;
Newton Hessian) a fully unrolled right-looking Cholesky and unrolled
substitutions compile to a few hundred fused elementwise ops and vmap
cleanly over the env batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a small SPD matrix (n x n, unrolled)."""
    n = A.shape[-1]
    dtype = A.dtype
    L = jnp.zeros_like(A)
    work = A
    idx = jnp.arange(n)
    for k in range(n):
        pivot = jnp.sqrt(jnp.maximum(work[k, k], 1e-30))
        col = work[:, k] / pivot
        col = jnp.where(idx >= k, col, jnp.zeros((), dtype))
        L = L.at[:, k].set(col)
        # rank-1 downdate of the trailing submatrix (masked full update)
        work = work - jnp.outer(col, col)
    return L


def solve_lower(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b with L lower triangular (unrolled forward subst.)."""
    n = L.shape[-1]
    y = jnp.zeros_like(b)
    for k in range(n):
        y = y.at[k].set((b[k] - jnp.dot(L[k], y)) / L[k, k])
    return y


def solve_upper_t(L: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y with L lower triangular (unrolled back subst.)."""
    n = L.shape[-1]
    x = jnp.zeros_like(y)
    for k in range(n - 1, -1, -1):
        x = x.at[k].set((y[k] - jnp.dot(L[:, k], x)) / L[k, k])
    return x


def cho_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b given L = cholesky(A)."""
    return solve_upper_t(L, solve_lower(L, b))


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a small SPD system A x = b via unrolled Cholesky."""
    return cho_solve(cholesky(A), b)
