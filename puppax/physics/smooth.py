"""Smooth (unconstrained) dynamics: FK, COM frames, CRB, RNE, actuation.

MuJoCo-semantics forward dynamics pipeline stages, written single-env with
the (tiny, fixed) body tree unrolled at trace time; ``jax.vmap`` at the
pipeline layer adds the env-batch axis that carries the TPU parallelism.

Stage-for-stage these reproduce (independently, from the published MuJoCo
computation model) mj_kinematics, mj_comPos, mj_comVel, mj_crb, mj_rne and
mj_fwdActuation, which the reference consumed indirectly through
mjx.forward/mjx.step (/root/reference/pupperv3_mjx/environment.py:319,366).
Each stage is validated against the mujoco C oracle in
tests/test_physics_smooth.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from puppax.model.mjcf import JNT_FREE, JNT_HINGE, RobotModel
from puppax.ops import math


class Kinematics(NamedTuple):
    xpos: jnp.ndarray  # (nbody, 3) body frame origins, world frame
    xquat: jnp.ndarray  # (nbody, 4)
    xipos: jnp.ndarray  # (nbody, 3) body COM positions
    ximat: jnp.ndarray  # (nbody, 3, 3) inertial frame orientations
    xanchor: jnp.ndarray  # (njnt, 3) joint anchors, world frame
    xaxis: jnp.ndarray  # (njnt, 3) joint axes, world frame
    site_xpos: jnp.ndarray  # (nsite, 3)
    geom_xpos: jnp.ndarray  # (ngeom, 3)
    geom_xmat: jnp.ndarray  # (ngeom, 3, 3)


class ComQuantities(NamedTuple):
    subtree_com: jnp.ndarray  # (nbody, 3)
    cinert: jnp.ndarray  # (nbody, 6, 6) spatial inertia about root-subtree com
    cdof: jnp.ndarray  # (nv, 6) dof motion axes about root-subtree com


class Velocity(NamedTuple):
    cvel: jnp.ndarray  # (nbody, 6) spatial velocities [ang; lin]
    cdof_dot: jnp.ndarray  # (nv, 6)


def _axis_angle_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], axis * jnp.sin(half)])


def kinematics(m: RobotModel, qpos: jnp.ndarray) -> Kinematics:
    """Forward kinematics over the fixed body tree (unrolled at trace)."""
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for i in range(1, m.nbody):
        p = m.body_parentid[i]
        frame_pos = xpos[p] + math.rotate(m.body_pos[i], xquat[p])
        frame_quat = math.quat_mul(xquat[p], m.body_quat[i])
        j = m.body_jntid[i]
        if j == -1:
            xpos.append(frame_pos)
            xquat.append(frame_quat)
            continue
        jt = m.jnt_type[j]
        qadr = m.jnt_qposadr[j]
        if jt == JNT_FREE:
            pos = qpos[qadr : qadr + 3]
            quat = qpos[qadr + 3 : qadr + 7]
            quat = quat / jnp.linalg.norm(quat)
            xpos.append(pos)
            xquat.append(quat)
            xanchor[j] = pos
            xaxis[j] = m.jnt_axis[j]  # free joint axis is never rotated
        elif jt == JNT_HINGE:
            angle = qpos[qadr] - m.qpos0[qadr]
            qloc = _axis_angle_quat(m.jnt_axis[j], angle)
            quat = math.quat_mul(frame_quat, qloc)
            anchor = frame_pos + math.rotate(m.jnt_pos[j], frame_quat)
            pos = anchor - math.rotate(m.jnt_pos[j], quat)
            xpos.append(pos)
            xquat.append(quat)
            xanchor[j] = anchor
            xaxis[j] = math.rotate(m.jnt_axis[j], quat)
        else:  # pragma: no cover - guarded at model build
            raise NotImplementedError(jt)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    ximat_list = []
    xipos_list = []
    for i in range(m.nbody):
        xipos_list.append(xpos[i] + math.rotate(m.body_ipos[i], xquat[i]))
        ximat_list.append(math.quat_to_mat(math.quat_mul(xquat[i], m.body_iquat[i])))
    # sites/geoms: vectorized gather + batched quaternion ops
    site_bodyid = jnp.asarray(m.site_bodyid, jnp.int32)
    geom_bodyid = jnp.asarray(m.geom_bodyid, jnp.int32)
    if m.nsite:
        sq = xquat[site_bodyid]
        site_xpos = xpos[site_bodyid] + jax.vmap(math.rotate)(m.site_pos, sq)
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
    gq = xquat[geom_bodyid]
    geom_xpos = xpos[geom_bodyid] + jax.vmap(math.rotate)(m.geom_pos, gq)
    geom_xmat = jax.vmap(math.quat_to_mat)(
        jax.vmap(math.quat_mul)(gq, m.geom_quat)
    )
    return Kinematics(
        xpos=xpos,
        xquat=xquat,
        xipos=jnp.stack(xipos_list),
        ximat=jnp.stack(ximat_list),
        xanchor=jnp.stack(xanchor) if m.njnt else jnp.zeros((0, 3), dtype),
        xaxis=jnp.stack(xaxis) if m.njnt else jnp.zeros((0, 3), dtype),
        site_xpos=site_xpos,
        geom_xpos=geom_xpos,
        geom_xmat=geom_xmat,
    )


def com_pos(m: RobotModel, kin: Kinematics) -> ComQuantities:
    """Subtree COMs, com-frame spatial inertias and dof axes (mj_comPos)."""
    dtype = kin.xpos.dtype
    # subtree mass and com via reverse accumulation
    mass = [m.body_mass[i] for i in range(m.nbody)]
    mom = [m.body_mass[i] * kin.xipos[i] for i in range(m.nbody)]
    subtree_mass = list(mass)
    subtree_mom = list(mom)
    for i in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[i]
        subtree_mass[p] = subtree_mass[p] + subtree_mass[i]
        subtree_mom[p] = subtree_mom[p] + subtree_mom[i]
    subtree_com = jnp.stack(
        [
            subtree_mom[i] / jnp.maximum(subtree_mass[i], 1e-12)
            for i in range(m.nbody)
        ]
    )

    # spatial inertia of each body about the com of its kinematic tree root
    cinert = []
    for i in range(m.nbody):
        root = m.body_rootid[i]
        offset = kin.xipos[i] - subtree_com[root]
        cinert.append(
            math.transform_inertia(
                m.body_mass[i], m.body_inertia[i], offset, kin.ximat[i]
            )
        )
    cinert = jnp.stack(cinert)

    # dof motion axes referenced at the root-subtree com
    cdof = [None] * m.nv
    for j in range(m.njnt):
        b = m.jnt_bodyid[j]
        root = m.body_rootid[b]
        com = subtree_com[root]
        d = m.jnt_dofadr[j]
        if m.jnt_type[j] == JNT_FREE:
            # translation: world axes; rotation: body-frame axes through
            # the body frame origin
            for k in range(3):
                e = jnp.zeros(3, dtype).at[k].set(1.0)
                cdof[d + k] = jnp.concatenate([jnp.zeros(3, dtype), e])
            R = math.quat_to_mat(kin.xquat[b])
            offset = com - kin.xanchor[j]
            for k in range(3):
                ax = R[:, k]
                cdof[d + 3 + k] = jnp.concatenate(
                    [ax, jnp.cross(ax, offset)]
                )
        else:  # hinge
            ax = kin.xaxis[j]
            offset = com - kin.xanchor[j]
            cdof[d] = jnp.concatenate([ax, jnp.cross(ax, offset)])
    cdof = (
        jnp.stack(cdof) if m.nv else jnp.zeros((0, 6), dtype)
    )
    return ComQuantities(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(m: RobotModel, com: ComQuantities, qvel: jnp.ndarray) -> Velocity:
    """Body spatial velocities and dof-axis time derivatives (mj_comVel)."""
    dtype = qvel.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdof_dot = [None] * m.nv
    for i in range(1, m.nbody):
        p = m.body_parentid[i]
        v = cvel[p]
        j = m.body_jntid[i]
        if j != -1:
            d = m.jnt_dofadr[j]
            if m.jnt_type[j] == JNT_FREE:
                # translations: cdof_dot = 0 (world axes), accumulate first
                for k in range(3):
                    cdof_dot[d + k] = jnp.zeros(6, dtype)
                v_trans = v + com.cdof[d : d + 3].T @ qvel[d : d + 3]
                # rotations: cdof_dot = v x cdof with v including translations
                for k in range(3):
                    cdof_dot[d + 3 + k] = math.motion_cross(
                        v_trans, com.cdof[d + 3 + k]
                    )
                v = v_trans + com.cdof[d + 3 : d + 6].T @ qvel[d + 3 : d + 6]
            else:  # hinge
                cdof_dot[d] = math.motion_cross(v, com.cdof[d])
                v = v + com.cdof[d] * qvel[d]
        cvel.append(v)
    return Velocity(
        cvel=jnp.stack(cvel),
        cdof_dot=jnp.stack(cdof_dot) if m.nv else jnp.zeros((0, 6), dtype),
    )


def _ancestor_dofs(m: RobotModel):
    """Static per-body lists of ancestor dof indices (incl. own)."""
    body_dofs = [[] for _ in range(m.nbody)]
    for j in range(m.njnt):
        b = m.jnt_bodyid[j]
        d = m.jnt_dofadr[j]
        n = 6 if m.jnt_type[j] == JNT_FREE else 1
        body_dofs[b].extend(range(d, d + n))
    chains = [[]] * m.nbody
    chains[0] = []
    for i in range(1, m.nbody):
        chains[i] = chains[m.body_parentid[i]] + body_dofs[i]
    return chains


import functools


@functools.lru_cache(maxsize=None)
def _crb_masks(nbody, nv, body_parentid, body_jntid, jnt_type, jnt_dofadr, jnt_bodyid, njnt):
    """Static CRB fill masks: per-dof body index and lower-triangular
    ancestor-pair mask anc[j, k] = 1 iff dof k is an ancestor-or-self dof
    of dof j's body and k <= j (host-side, hashable args for caching)."""
    import numpy as np

    body_dofs = [[] for _ in range(nbody)]
    dof_body = np.zeros(nv, dtype=np.int32)
    for j in range(njnt):
        b = jnt_bodyid[j]
        d = jnt_dofadr[j]
        n = 6 if jnt_type[j] == JNT_FREE else 1
        for dd in range(d, d + n):
            body_dofs[b].append(dd)
            dof_body[dd] = b
    chains = [[] for _ in range(nbody)]
    for i in range(1, nbody):
        chains[i] = chains[body_parentid[i]] + body_dofs[i]
    anc = np.zeros((nv, nv), dtype=np.float32)
    for jd in range(nv):
        for kd in chains[dof_body[jd]]:
            if kd <= jd:
                anc[jd, kd] = 1.0
    return dof_body, anc


def crb(m: RobotModel, com: ComQuantities) -> jnp.ndarray:
    """Dense joint-space inertia matrix via composite rigid body (mj_crb).

    Vectorized fill: F[j] = crb_inertia[body(j)] @ cdof[j]; the lower
    triangle is anc * (F cdof^T), symmetrized — one (nv,6)x(6,nv) matmul
    plus static masks instead of per-element scatter (compile- and
    MXU-friendly).
    """
    crb_inert = [com.cinert[i] for i in range(m.nbody)]
    for i in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[i]
        if p > 0:
            crb_inert[p] = crb_inert[p] + crb_inert[i]
    crb_stack = jnp.stack(crb_inert)  # (nbody, 6, 6)

    dof_body, anc = _crb_masks(
        m.nbody, m.nv, m.body_parentid, m.body_jntid, m.jnt_type,
        m.jnt_dofadr, m.jnt_bodyid, m.njnt,
    )
    F = jnp.einsum(
        "jab,jb->ja", crb_stack[jnp.asarray(dof_body)], com.cdof
    )  # (nv, 6)
    W = (F @ com.cdof.T) * jnp.asarray(anc, com.cdof.dtype)
    qM = W + W.T - jnp.diag(jnp.diag(W)) + jnp.diag(m.dof_armature)
    return qM


def rne(
    m: RobotModel,
    com: ComQuantities,
    vel: Velocity,
    qvel: jnp.ndarray,
) -> jnp.ndarray:
    """Bias forces C(q, qvel) including gravity (mj_rne with flg_acc=0)."""
    dtype = qvel.dtype
    # gravity enters as a fictitious base acceleration
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), -m.gravity.astype(dtype)])]
    for i in range(1, m.nbody):
        p = m.body_parentid[i]
        a = cacc[p]
        j = m.body_jntid[i]
        if j != -1:
            d = m.jnt_dofadr[j]
            n = 6 if m.jnt_type[j] == JNT_FREE else 1
            a = a + vel.cdof_dot[d : d + n].T @ qvel[d : d + n]
        cacc.append(a)

    cfrc = [jnp.zeros(6, dtype)]
    for i in range(1, m.nbody):
        Iv = com.cinert[i] @ vel.cvel[i]
        f = com.cinert[i] @ cacc[i] + math.motion_cross_force(vel.cvel[i], Iv)
        cfrc.append(f)
    # backward accumulation
    total = list(cfrc)
    for i in range(m.nbody - 1, 0, -1):
        p = m.body_parentid[i]
        if p > 0:
            total[p] = total[p] + total[i]

    qfrc_bias = jnp.zeros(m.nv, dtype)
    for j in range(m.njnt):
        b = m.jnt_bodyid[j]
        d = m.jnt_dofadr[j]
        n = 6 if m.jnt_type[j] == JNT_FREE else 1
        for jd in range(d, d + n):
            qfrc_bias = qfrc_bias.at[jd].set(jnp.dot(com.cdof[jd], total[b]))
    return qfrc_bias


def passive(m: RobotModel, qvel: jnp.ndarray) -> jnp.ndarray:
    """Passive joint damping force (frictionloss is a solver constraint)."""
    return -m.dof_damping * qvel


def actuation(
    m: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray, ctrl: jnp.ndarray
) -> jnp.ndarray:
    """Affine actuator force: gain*ctrl + bias·[1, q, qd], clipped.

    Reproduces the affine PD servo the reference configures:
    gainprm=[kp,0,0], biasprm=[0,-kp,-kd] => tau = kp (ctrl - q) - kd qd,
    clipped to forcerange (/root/reference/pupperv3_mjx/environment.py:170-174,
    test_pupper_model.xml:42-43). Vectorized over actuators via static
    qpos/dof gather indices.
    """
    qadr = jnp.asarray([m.jnt_qposadr[j] for j in m.actuator_jntid], jnp.int32)
    dadr = jnp.asarray([m.jnt_dofadr[j] for j in m.actuator_jntid], jnp.int32)
    length = qpos[qadr]
    velocity = qvel[dadr]
    bias = (
        m.actuator_biasprm[:, 0]
        + m.actuator_biasprm[:, 1] * length
        + m.actuator_biasprm[:, 2] * velocity
    )
    force = m.actuator_gainprm[:, 0] * ctrl + bias
    force = jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1])
    return jnp.zeros(m.nv, qpos.dtype).at[dadr].add(force)
