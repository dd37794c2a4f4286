"""Dev oracle check: smooth dynamics vs mujoco C (f64, CPU)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_ENABLE_X64"] = "1"

import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import mujoco
import numpy as np

from puppax.model.mjcf import load_model
from puppax.physics import smooth

np.set_printoptions(precision=6, suppress=True, linewidth=160)

mj = mujoco.MjModel.from_xml_path("/root/reference/test/test_pupper_model.xml")
cm = load_model("/root/reference/test/test_pupper_model.xml", dtype=jnp.float64)
m = cm.robot

d = mujoco.MjData(mj)
rng = np.random.default_rng(0)
d.qpos[:] = mj.key_qpos[0]
d.qpos[0:3] = [0.1, -0.2, 0.35]
quat = rng.normal(size=4)
d.qpos[3:7] = quat / np.linalg.norm(quat)
d.qpos[7:] = rng.uniform(-0.4, 0.4, size=12)
d.qvel[:] = rng.uniform(-1, 1, size=18)
mujoco.mj_forward(mj, d)

qpos = jnp.asarray(d.qpos)
qvel = jnp.asarray(d.qvel)

kin = smooth.kinematics(m, qpos)
com = smooth.com_pos(m, kin)
vel = smooth.com_vel(m, com, qvel)


def check(name, ours, ref, tol=1e-9):
    ours = np.asarray(ours)
    ref = np.asarray(ref)
    err = np.max(np.abs(ours - ref)) if ours.size else 0.0
    status = "OK " if err < tol else "FAIL"
    print(f"{status} {name:18s} maxerr={err:.3e}")
    if err >= tol:
        print(" ours:\n", ours)
        print(" ref:\n", ref)


check("xpos", kin.xpos, d.xpos)
check("xquat", kin.xquat, d.xquat)
check("xipos", kin.xipos, d.xipos)
check("xanchor", kin.xanchor, d.xanchor)
check("xaxis", kin.xaxis, d.xaxis)
check("site_xpos", kin.site_xpos, d.site_xpos)
check("geom_xpos", kin.geom_xpos, d.geom_xpos)
check("subtree_com", com.subtree_com, d.subtree_com)
check("cdof", com.cdof, d.cdof)
check("cvel", vel.cvel, d.cvel)
check("cdof_dot", vel.cdof_dot, d.cdof_dot)

qM_ref = np.zeros((mj.nv, mj.nv))
mujoco.mj_fullM(mj, d, qM_ref)
qM = smooth.crb(m, com)
check("qM", qM, qM_ref)

qfrc_bias = smooth.rne(m, com, vel, qvel)
check("qfrc_bias", qfrc_bias, d.qfrc_bias)

qfrc_passive = smooth.passive(m, qvel)
check("qfrc_passive", qfrc_passive, d.qfrc_passive)

d.ctrl[:] = rng.uniform(-1, 1, size=12)
mujoco.mj_forward(mj, d)
qfrc_act = smooth.actuation(m, qpos, qvel, jnp.asarray(d.ctrl))
check("qfrc_actuator", qfrc_act, d.qfrc_actuator)

# smooth acceleration (mid-air: disable contact to compare)
mj2 = mujoco.MjModel.from_xml_path("/root/reference/test/test_pupper_model.xml")
mj2.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS | mujoco.mjtDisableBit.mjDSBL_LIMIT
d2 = mujoco.MjData(mj2)
d2.qpos[:] = d.qpos
d2.qvel[:] = d.qvel
d2.ctrl[:] = d.ctrl
mujoco.mj_forward(mj2, d2)
qfrc_smooth = qfrc_passive + qfrc_act - qfrc_bias
qacc_smooth = jnp.linalg.solve(qM, qfrc_smooth)
check("qacc_smooth", qacc_smooth, d2.qacc, tol=1e-7)
