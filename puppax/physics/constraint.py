"""Constraint (efc) row assembly: dof friction, joint limits, contacts.

Builds the fixed-shape constraint system the Newton solver consumes:
Jacobian J (nefc, nv), reference acceleration aref, inverse-impedance D,
friction-loss bounds, and row types. Formulas reproduce MuJoCo's
constraint model (verified row-for-row against mjData.efc_* in
tests/test_physics_constraint.py):

  impedance d(pos):  smoothstep sigmoid of |pos|/width between dmin..dmax
  K = 1 / (dmax^2 * timeconst^2 * dampratio^2),  B = 2 / (dmax * timeconst)
  aref = -d * K * pos - B * (J qvel)
  R = max((1 - d) / d, MINVAL) * r,   D = 1 / R
    r_frictionloss/limit = dof_invweight0[dof]
    r_contact-pyramid    = (iw1 + iw2) * 2 mu_i^2 (1 + mu_i^2) / impratio

Contact rows use the pyramidal cone (condim 3 -> 4 facets per contact,
directions n ± mu_i t_i), matching the reference model's
cone="pyramidal" impratio="10" (/root/reference/test/test_pupper_model.xml:57).

Fixed shapes: all rows always exist; separated contacts / far-from-limit
joints are naturally inactive in the solver (jar > 0), mirroring MJX's
fixed-shape constraint instantiation rather than MuJoCo C's dynamic nefc.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from puppax.model.mjcf import JNT_FREE, RobotModel
from puppax.physics.collision import Contacts
from puppax.physics.smooth import ComQuantities

_MINVAL = 1e-15

# row types
TYPE_FRICTION = 1  # bounded (Huber) rows
TYPE_ONESIDED = 2  # limits + contact facets: active iff jar < 0


class EfcData(NamedTuple):
    J: jnp.ndarray  # (nefc, nv)
    aref: jnp.ndarray  # (nefc,)
    D: jnp.ndarray  # (nefc,)
    R: jnp.ndarray  # (nefc,)
    floss: jnp.ndarray  # (nefc,) friction-loss bound (0 for non-friction rows)
    is_friction: jnp.ndarray  # (nefc,) bool
    pos: jnp.ndarray  # (nefc,) constraint position (debug/rewards)


def impedance(solimp: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """MuJoCo constraint impedance d(pos) in [MINIMP, MAXIMP]."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0],
        solimp[..., 1],
        solimp[..., 2],
        solimp[..., 3],
        solimp[..., 4],
    )
    x = jnp.clip(jnp.abs(pos) / jnp.maximum(width, _MINVAL), 0.0, 1.0)
    # two-sided power sigmoid through (mid, mid-value)
    a = 1.0 / jnp.power(jnp.maximum(mid, _MINVAL), power - 1.0)
    b = 1.0 / jnp.power(jnp.maximum(1.0 - mid, _MINVAL), power - 1.0)
    y_lo = a * jnp.power(x, power)
    y_hi = 1.0 - b * jnp.power(1.0 - x, power)
    y = jnp.where(x < mid, y_lo, y_hi)
    d = dmin + y * (dmax - dmin)
    return jnp.clip(d, 1e-4, 0.9999)


def _kb(solref: jnp.ndarray, solimp: jnp.ndarray):
    """Stiffness K and damping B from solref (standard + direct forms)."""
    dmax = solimp[..., 1]
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
    )
    b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    # direct form: solref = (-stiffness, -damping)
    k_dir = -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL)
    b_dir = -solref[..., 1] / jnp.maximum(dmax, _MINVAL)
    direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
    return jnp.where(direct, k_dir, k_std), jnp.where(direct, b_dir, b_std)


def _row(solref, solimp, pos, jvel, r_scale, enable=None):
    """Common per-row quantities (aref, D, R) given raw r scale.

    ``enable`` masks the row out (D = 0) when the constraint is not
    instantiated: MuJoCo C only creates contact rows when dist < margin and
    limit rows when violated. With fixed shapes we keep the row but zero
    its D (MJX-style), removing it from cost/gradient/Hessian — otherwise
    a separated contact could spuriously activate under large qacc.
    """
    d = impedance(solimp, pos)
    K, B = _kb(solref, solimp)
    aref = -d * K * pos - B * jvel
    R = jnp.maximum((1.0 - d) / jnp.maximum(d, _MINVAL), _MINVAL) * r_scale
    R = jnp.maximum(R, _MINVAL)
    D = 1.0 / R
    if enable is not None:
        D = jnp.where(enable, D, 0.0)
    return aref, D, R


def _point_jacobian_tables(m: RobotModel):
    """Static (nbody, nv) ancestor-dof masks + rootid table (host-side)."""
    body_dofs = [[] for _ in range(m.nbody)]
    for j in range(m.njnt):
        b = m.jnt_bodyid[j]
        d0 = m.jnt_dofadr[j]
        n = 6 if m.jnt_type[j] == JNT_FREE else 1
        body_dofs[b].extend(range(d0, d0 + n))
    mask = np.zeros((m.nbody, m.nv), dtype=np.float32)
    for i in range(1, m.nbody):
        b = i
        while b != 0:
            for dof in body_dofs[b]:
                mask[i, dof] = 1.0
            b = m.body_parentid[b]
    return mask, np.asarray(m.body_rootid, dtype=np.int32)


def contact_point_jacobian(
    m: RobotModel,
    com: ComQuantities,
    point: jnp.ndarray,
    body: jnp.ndarray,
) -> jnp.ndarray:
    """Translational Jacobian (3, nv) of a world point on a (dynamic) body."""
    mask_table, rootid_table = _point_jacobian_tables(m)
    mask = jnp.asarray(mask_table, com.cdof.dtype)[body]  # (nv,)
    root = jnp.asarray(rootid_table)[body]
    offset = point - com.subtree_com[root]  # (3,)
    # J[:, dof] = cdof_lin + cdof_ang x offset, masked to ancestor dofs
    jac = com.cdof[:, 3:] + jnp.cross(com.cdof[:, :3], offset[None, :])
    return (jac * mask[:, None]).T  # (3, nv)


def make_efc(
    m: RobotModel,
    com: ComQuantities,
    qpos: jnp.ndarray,
    qvel: jnp.ndarray,
    contacts: Contacts,
) -> EfcData:
    dtype = qvel.dtype
    Js, arefs, Ds, Rs, flosses, is_frics, poss = [], [], [], [], [], [], []

    # ---- dof friction-loss rows (static set) ----
    for d in m.dof_frictional:
        J = jnp.zeros(m.nv, dtype).at[d].set(1.0)
        pos = jnp.zeros((), dtype)
        jvel = qvel[d]
        aref, D, R = _row(
            m.dof_solref[d], m.dof_solimp[d], pos, jvel, m.dof_invweight0[d]
        )
        Js.append(J)
        arefs.append(aref)
        Ds.append(D)
        Rs.append(R)
        flosses.append(m.dof_frictionloss[d])
        is_frics.append(True)
        poss.append(pos)

    # ---- joint limit rows (one per limited hinge; side chosen by distance,
    # matching mj_instantiateLimit's single active-side row) ----
    for j in range(m.njnt):
        if not m.jnt_limited[j]:
            continue
        qadr = m.jnt_qposadr[j]
        dadr = m.jnt_dofadr[j]
        dist_lo = qpos[qadr] - m.jnt_range[j, 0]
        dist_hi = m.jnt_range[j, 1] - qpos[qadr]
        lower_side = dist_lo < dist_hi
        side = jnp.where(lower_side, 1.0, -1.0).astype(dtype)
        dist = jnp.where(lower_side, dist_lo, dist_hi)
        pos = dist - m.jnt_margin[j]
        J = jnp.zeros(m.nv, dtype).at[dadr].set(side)
        jvel = side * qvel[dadr]
        aref, D, R = _row(
            m.jnt_solref[j],
            m.jnt_solimp[j],
            pos,
            jvel,
            m.dof_invweight0[dadr],
            enable=pos < 0,
        )
        Js.append(J)
        arefs.append(aref)
        Ds.append(D)
        Rs.append(R)
        flosses.append(jnp.zeros((), dtype))
        is_frics.append(False)
        poss.append(pos)

    # ---- contact pyramidal rows: 4 facets per (fixed-size) contact ----
    ncon = contacts.dist.shape[0]
    for c in range(ncon):
        point = contacts.pos[c]
        J2 = contact_point_jacobian(m, com, point, contacts.body2[c])
        J1 = contact_point_jacobian(m, com, point, contacts.body1[c])
        Jt = J2 - J1  # (3, nv)
        n = contacts.frame[c, 0]
        pen = contacts.dist[c]
        # inactive padded rows: force dist far positive so rows never activate
        for t_idx in range(2):
            t = contacts.frame[c, 1 + t_idx]
            mu = contacts.friction[c, t_idx]
            r_scale = (
                contacts.invweight[c]
                * 2.0
                * mu
                * mu
                * (1.0 + mu * mu)
                / m.impratio
            )
            for sign in (1.0, -1.0):
                d_vec = n + sign * mu * t
                J = d_vec @ Jt  # (nv,)
                jvel = J @ qvel
                aref, D, R = _row(
                    contacts.solref[c],
                    contacts.solimp[c],
                    pen,
                    jvel,
                    r_scale,
                    enable=pen < 0,
                )
                Js.append(J)
                arefs.append(aref)
                Ds.append(D)
                Rs.append(R)
                flosses.append(jnp.zeros((), dtype))
                is_frics.append(False)
                poss.append(pen)

    return EfcData(
        J=jnp.stack(Js),
        aref=jnp.stack(arefs),
        D=jnp.stack(Ds),
        R=jnp.stack(Rs),
        floss=jnp.stack(flosses),
        is_friction=jnp.asarray(is_frics),
        pos=jnp.stack(poss),
    )
