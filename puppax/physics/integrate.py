"""Semi-implicit Euler integration (MuJoCo mj_Euler, eulerdamp disabled).

The reference model disables eulerdamp
(/root/reference/test/test_pupper_model.xml:58), so there is no implicit
damping solve: qvel += dt*qacc, then position integration with quaternion
update for the free joint (free-joint angular velocity is body-frame,
mju_quatIntegrate semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from puppax.model.mjcf import JNT_FREE, JNT_HINGE, RobotModel
from puppax.ops import math
from puppax.ops.select import set_rows, take_rows


def integrate_pos(m: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray, dt) -> jnp.ndarray:
    out = qpos
    hinge_qadr = [
        m.jnt_qposadr[j] for j in range(m.njnt) if m.jnt_type[j] == JNT_HINGE
    ]
    hinge_dadr = [
        m.jnt_dofadr[j] for j in range(m.njnt) if m.jnt_type[j] == JNT_HINGE
    ]
    if hinge_qadr:
        out = set_rows(
            out,
            hinge_qadr,
            take_rows(qpos, hinge_qadr) + dt * take_rows(qvel, hinge_dadr),
        )
    for j in range(m.njnt):
        if m.jnt_type[j] != JNT_FREE:
            continue
        qadr = m.jnt_qposadr[j]
        dadr = m.jnt_dofadr[j]
        out = out.at[qadr : qadr + 3].set(
            qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
        )
        quat = math.quat_integrate(
            qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
        )
        out = out.at[qadr + 3 : qadr + 7].set(quat)
    return out


def euler(m: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray, qacc: jnp.ndarray):
    qvel_new = qvel + m.timestep * qacc
    qpos_new = integrate_pos(m, qpos, qvel_new, m.timestep)
    return qpos_new, qvel_new
