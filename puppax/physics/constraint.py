"""Constraint (efc) row assembly: dof friction, joint limits, contacts.

Builds the fixed-shape constraint system the Newton solver consumes:
Jacobian J (nefc, nv), reference acceleration aref, inverse-impedance D,
friction-loss bounds, and row types. Formulas reproduce MuJoCo's
constraint model (verified row-for-row against mjData.efc_* in
tests/test_physics_oracle.py):

  impedance d(pos):  smoothstep sigmoid of |pos|/width between dmin..dmax
  K = 1 / (dmax^2 * timeconst^2 * dampratio^2),  B = 2 / (dmax * timeconst)
  aref = -d * K * pos - B * (J qvel)
  R = max((1 - d) / d, MINVAL) * r,   D = 1 / R
    r_frictionloss/limit = dof_invweight0[dof]
    r_contact-pyramid    = (iw1 + iw2) * 2 mu_i^2 (1 + mu_i^2) / impratio

Contact rows use the pyramidal cone (condim 3 -> 4 facets per contact,
directions n ± mu_i t_i), matching the reference model's
cone="pyramidal" impratio="10" (/root/reference/test/test_pupper_model.xml:57).

Fixed shapes, fully vectorized: friction/limit rows use static gather
indices, contact rows are vmapped over the fixed-size contact buffer.
All rows always exist; rows MuJoCo C would not instantiate (separated
contacts, unviolated limits) are masked out via D = 0 (MJX-style).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from puppax.model.mjcf import JNT_FREE, RobotModel
from puppax.ops.select import take_rows
from puppax.physics.collision import Contacts
from puppax.physics.smooth import ComQuantities

_MINVAL = 1e-15


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
    a = 1.0 / jnp.power(jnp.maximum(mid, _MINVAL), power - 1.0)
    b = 1.0 / jnp.power(jnp.maximum(1.0 - mid, _MINVAL), power - 1.0)
    y_lo = a * jnp.power(x, power)
    y_hi = 1.0 - b * jnp.power(1.0 - x, power)
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 0.9999)


def _kb(solref: jnp.ndarray, solimp: jnp.ndarray):
    """Stiffness K and damping B from solref (standard + direct forms)."""
    dmax = solimp[..., 1]
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    k_std = 1.0 / jnp.maximum(
        dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
    )
    b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    k_dir = -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL)
    b_dir = -solref[..., 1] / jnp.maximum(dmax, _MINVAL)
    direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
    return jnp.where(direct, k_dir, k_std), jnp.where(direct, b_dir, b_std)


def _row(solref, solimp, pos, jvel, r_scale, enable=None):
    """Per-row (aref, D, R); ``enable=False`` masks the row out via D=0
    (MuJoCo C would not instantiate it; see module docstring)."""
    d = impedance(solimp, pos)
    K, B = _kb(solref, solimp)
    aref = -d * K * pos - B * jvel
    R = jnp.maximum((1.0 - d) / jnp.maximum(d, _MINVAL), _MINVAL) * r_scale
    R = jnp.maximum(R, _MINVAL)
    D = 1.0 / R
    if enable is not None:
        D = jnp.where(enable, D, 0.0)
    return aref, D, R


@functools.lru_cache(maxsize=None)
def _static_tables(nbody, nv, njnt, body_parentid, jnt_bodyid, jnt_dofadr,
                   jnt_type, body_rootid, dof_frictional, jnt_limited,
                   jnt_qposadr):
    """Host-side static index tables (cached on topology)."""
    body_dofs = [[] for _ in range(nbody)]
    for j in range(njnt):
        b = jnt_bodyid[j]
        d0 = jnt_dofadr[j]
        n = 6 if jnt_type[j] == JNT_FREE else 1
        body_dofs[b].extend(range(d0, d0 + n))
    mask = np.zeros((nbody, nv), dtype=np.float32)
    for i in range(1, nbody):
        b = i
        while b != 0:
            for dof in body_dofs[b]:
                mask[i, dof] = 1.0
            b = body_parentid[b]
    fd = np.asarray(dof_frictional, dtype=np.int32)
    fric_onehot = np.zeros((len(fd), nv), dtype=np.float32)
    fric_onehot[np.arange(len(fd)), fd] = 1.0
    lim_j = np.asarray([j for j in range(njnt) if jnt_limited[j]], dtype=np.int32)
    lim_qadr = np.asarray([jnt_qposadr[j] for j in lim_j], dtype=np.int32)
    lim_dadr = np.asarray([jnt_dofadr[j] for j in lim_j], dtype=np.int32)
    lim_onehot = np.zeros((len(lim_j), nv), dtype=np.float32)
    lim_onehot[np.arange(len(lim_j)), lim_dadr] = 1.0
    return (
        mask,
        np.asarray(body_rootid, dtype=np.int32),
        fd,
        fric_onehot,
        lim_j,
        lim_qadr,
        lim_dadr,
        lim_onehot,
    )


def _tables(m: RobotModel):
    return _static_tables(
        m.nbody, m.nv, m.njnt, m.body_parentid, m.jnt_bodyid, m.jnt_dofadr,
        m.jnt_type, m.body_rootid, m.dof_frictional, m.jnt_limited,
        m.jnt_qposadr,
    )


def contact_point_jacobian(
    m: RobotModel,
    com: ComQuantities,
    point: jnp.ndarray,
    body: jnp.ndarray,
) -> jnp.ndarray:
    """Translational Jacobian (3, nv) of a world point on a (dynamic) body.

    ``body`` is traced (it comes from contact top-k selection), so the
    per-body lookups go through a one-hot contraction over the small body
    axis rather than a dynamic gather (pathological under env vmap)."""
    mask_table, rootid_table = _tables(m)[:2]
    dtype = com.cdof.dtype
    oh = jax.nn.one_hot(body, m.nbody, dtype=dtype)  # (nbody,)
    mask = jnp.sum(oh[:, None] * jnp.asarray(mask_table, dtype), axis=0)  # (nv,)
    root_coms = take_rows(com.subtree_com, rootid_table)  # (nbody, 3), static
    offset = point - jnp.sum(oh[:, None] * root_coms, axis=0)  # (3,)
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
    (_, _, fd, fric_onehot, lim_j, lim_qadr, lim_dadr, lim_onehot) = _tables(m)

    # ---- dof friction-loss rows (always instantiated) ----
    J_fric = jnp.asarray(fric_onehot, dtype)
    pos_fric = jnp.zeros(fd.shape[0], dtype)
    jvel_fric = take_rows(qvel, fd)
    aref_f, D_f, R_f = _row(
        take_rows(m.dof_solref, fd),
        take_rows(m.dof_solimp, fd),
        pos_fric,
        jvel_fric,
        take_rows(m.dof_invweight0, fd),
    )
    floss_f = take_rows(m.dof_frictionloss, fd)

    # ---- joint limit rows (one per limited joint; nearest side, active
    # only when violated — matching mj_instantiateLimit) ----
    q_l = take_rows(qpos, lim_qadr)
    jnt_range_l = take_rows(m.jnt_range, lim_j)
    dist_lo = q_l - jnt_range_l[:, 0]
    dist_hi = jnt_range_l[:, 1] - q_l
    lower_side = dist_lo < dist_hi
    side = jnp.where(lower_side, 1.0, -1.0).astype(dtype)
    pos_lim = jnp.where(lower_side, dist_lo, dist_hi) - take_rows(
        m.jnt_margin, lim_j
    )
    J_lim = jnp.asarray(lim_onehot, dtype) * side[:, None]
    jvel_lim = side * take_rows(qvel, lim_dadr)
    aref_l, D_l, R_l = _row(
        take_rows(m.jnt_solref, lim_j),
        take_rows(m.jnt_solimp, lim_j),
        pos_lim,
        jvel_lim,
        take_rows(m.dof_invweight0, lim_dadr),
        enable=pos_lim < 0,
    )

    # ---- contact pyramidal rows: 4 facets per contact, vmapped ----
    def one_contact(pos_c, frame_c, fric_c, solref_c, solimp_c, iw_c, b1, b2, pen):
        J2 = contact_point_jacobian(m, com, pos_c, b2)
        J1 = contact_point_jacobian(m, com, pos_c, b1)
        Jt = J2 - J1  # (3, nv)
        n = frame_c[0]
        t = frame_c[1:3]  # (2, 3)
        dirs = jnp.stack(
            [
                n + fric_c[0] * t[0],
                n - fric_c[0] * t[0],
                n + fric_c[1] * t[1],
                n - fric_c[1] * t[1],
            ]
        )  # (4, 3)
        J4 = jnp.sum(dirs[:, :, None] * Jt[None, :, :], axis=1)  # (4, nv)
        jvel4 = jnp.sum(J4 * qvel[None, :], axis=-1)
        mu2 = fric_c * fric_c  # (2,)
        r_t = iw_c * 2.0 * mu2 * (1.0 + mu2) / m.impratio  # (2,)
        r4 = jnp.repeat(r_t, 2)  # facets [t1+, t1-, t2+, t2-]
        pen4 = jnp.broadcast_to(pen, (4,))
        aref4, D4, R4 = _row(
            jnp.broadcast_to(solref_c, (4, 2)),
            jnp.broadcast_to(solimp_c, (4, 5)),
            pen4,
            jvel4,
            r4,
            enable=pen4 < 0,
        )
        return J4, aref4, D4, R4, pen4

    J_c, aref_c, D_c, R_c, pos_c = jax.vmap(one_contact)(
        contacts.pos,
        contacts.frame,
        contacts.friction,
        contacts.solref,
        contacts.solimp,
        contacts.invweight,
        contacts.body1,
        contacts.body2,
        contacts.dist,
    )
    ncon4 = contacts.dist.shape[0] * 4
    J_c = J_c.reshape(ncon4, m.nv)
    aref_c = aref_c.reshape(ncon4)
    D_c = D_c.reshape(ncon4)
    R_c = R_c.reshape(ncon4)
    pos_c = pos_c.reshape(ncon4)

    nfl = fd.shape[0]
    nlim = len(lim_j)
    zeros_lim = jnp.zeros(nlim, dtype)
    zeros_con = jnp.zeros(ncon4, dtype)
    return EfcData(
        J=jnp.concatenate([J_fric, J_lim, J_c]),
        aref=jnp.concatenate([aref_f, aref_l, aref_c]),
        D=jnp.concatenate([D_f, D_l, D_c]),
        R=jnp.concatenate([R_f, R_l, R_c]),
        floss=jnp.concatenate([floss_f, zeros_lim, zeros_con]),
        is_friction=jnp.concatenate(
            [
                jnp.ones(nfl, bool),
                jnp.zeros(nlim, bool),
                jnp.zeros(ncon4, bool),
            ]
        ),
        pos=jnp.concatenate([pos_fric, pos_lim, pos_c]),
    )
