"""Primal Newton constraint solver (MuJoCo semantics).

Minimizes over qacc:
    0.5 (x - x_smooth)' M (x - x_smooth) + sum_i s_i(J_i x - aref_i)
where s_i is the per-row convex cost:
  * one-sided rows (limits, pyramid facets): 0.5 D jar^2 when jar < 0, else 0
  * friction-loss rows: Huber — 0.5 D jar^2 for |jar| <= floss R,
    linear floss |jar| - 0.5 floss^2 R outside (force saturates at ±floss)

Each Newton iteration builds the exact Hessian H = M + J_A' D J_A over the
active set, takes a Cholesky step, and runs an exact line search on the
piecewise-quadratic 1-D restriction (Newton on phi', ls_iterations steps).
Configured like the reference model: iterations=1, ls_iterations=5
(/root/reference/test/test_pupper_model.xml:57). The solve is a handful of
batched (nv x nv) factorizations and (nefc x nv) matmuls — dense, fixed
shape, fused by XLA across the env batch.

Validated against mujoco C (warmstart disabled, same init x0 = qacc_smooth)
in tests/test_physics_step.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from puppax.model.mjcf import RobotModel
from puppax.physics.constraint import EfcData


class SolverResult(NamedTuple):
    qacc: jnp.ndarray  # (nv,)
    efc_force: jnp.ndarray  # (nefc,)
    qfrc_constraint: jnp.ndarray  # (nv,)


def _row_force(efc: EfcData, jar: jnp.ndarray):
    """Per-row constraint force and quadratic-zone mask at given jar."""
    quad_fric = jnp.abs(jar) <= efc.floss * efc.R
    quad = jnp.where(efc.is_friction, quad_fric, jar < 0)
    lin_force = jnp.where(efc.is_friction, -jnp.sign(jar) * efc.floss, 0.0)
    force = jnp.where(quad, -efc.D * jar, lin_force)
    return force, quad


def solve(
    m: RobotModel,
    qM: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    efc: EfcData,
) -> SolverResult:
    dtype = qacc_smooth.dtype
    x = qacc_smooth

    for _ in range(max(m.solver_iterations, 1)):
        jar = efc.J @ x - efc.aref
        force, quad = _row_force(efc, jar)
        ma = qM @ (x - qacc_smooth)
        grad = ma - efc.J.T @ force
        # exact Hessian over the active set
        dw = efc.D * quad.astype(dtype)
        H = qM + (efc.J.T * dw[None, :]) @ efc.J
        chol = jax.scipy.linalg.cho_factor(H)
        dx = -jax.scipy.linalg.cho_solve(chol, grad)

        # exact line search: phi(alpha) is piecewise quadratic in alpha
        jv = efc.J @ dx
        mdx = qM @ dx
        g0 = jnp.dot(dx, ma)  # gauss gradient term at alpha=0
        h0 = jnp.dot(dx, mdx)  # gauss curvature (constant)

        def ls_body(alpha, _):
            jar_a = jar + alpha * jv
            force_a, quad_a = _row_force(efc, jar_a)
            dphi = g0 + alpha * h0 - jnp.dot(jv, force_a)
            ddphi = h0 + jnp.sum(quad_a * efc.D * jv * jv)
            alpha = alpha - dphi / jnp.maximum(ddphi, 1e-12)
            return alpha, None

        alpha = jnp.zeros((), dtype)
        for _ls in range(max(m.ls_iterations, 1)):
            alpha, _ = ls_body(alpha, None)

        x = x + alpha * dx

    jar = efc.J @ x - efc.aref
    force, _ = _row_force(efc, jar)
    qfrc_constraint = efc.J.T @ force
    return SolverResult(qacc=x, efc_force=force, qfrc_constraint=qfrc_constraint)
