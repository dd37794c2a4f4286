"""Dev oracle check: constrained dynamics + stepping vs mujoco C (f64, CPU).

C model runs with warmstart disabled to match the stateless Newton init.
Contact caps raised so no contact is dropped relative to C.
"""
import os

os.environ["JAX_ENABLE_X64"] = "1"

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import mujoco
import numpy as np

from puppax.model.mjcf import load_model
from puppax.physics import pipeline

np.set_printoptions(precision=6, suppress=True, linewidth=160)

XML = "/root/reference/test/test_pupper_model.xml"
mj = mujoco.MjModel.from_xml_path(XML)
mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
cm = load_model(XML, dtype=jnp.float64)
m = cm.robot.replace(max_contact_points=32, max_geom_pairs=32)

DEFAULT_POSE = [0.26, 0.0, -0.52, -0.26, 0.0, 0.52, 0.26, 0.0, -0.52, -0.26, 0.0, 0.52]


def set_state(d, qpos, qvel, ctrl):
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    d.ctrl[:] = ctrl


def compare_qacc(tag, qpos, qvel, ctrl, tol=1e-8):
    d = mujoco.MjData(mj)
    set_state(d, qpos, qvel, ctrl)
    mujoco.mj_forward(mj, d)
    qacc, _ = pipeline.forward(m, jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl))
    err = np.max(np.abs(np.asarray(qacc) - d.qacc))
    rel = err / max(1.0, np.max(np.abs(d.qacc)))
    status = "OK " if rel < tol else "FAIL"
    print(f"{status} qacc[{tag}] maxerr={err:.3e} rel={rel:.3e} ncon={d.ncon} nefc={d.nefc}")
    if rel >= tol:
        print(" ours:", np.asarray(qacc))
        print(" ref :", d.qacc)
    return rel < tol


rng = np.random.default_rng(0)

# 1. mid-air, no contacts
qpos = np.array(mj.key_qpos[0])
qpos[2] = 1.0
qpos[7:] = DEFAULT_POSE
qvel = rng.uniform(-1, 1, 18)
compare_qacc("midair", qpos, qvel, rng.uniform(-1, 1, 12))

# 2. standing, feet in contact
qpos = np.array(mj.key_qpos[0])
qpos[2] = 0.155
qpos[7:] = DEFAULT_POSE
qvel = rng.uniform(-0.5, 0.5, 18)
compare_qacc("standing", qpos, qvel, rng.uniform(-1, 1, 12))

# 3. deep penetration + tilt
qpos = np.array(mj.key_qpos[0])
qpos[2] = 0.12
quat = np.array([1.0, 0.15, -0.1, 0.05])
qpos[3:7] = quat / np.linalg.norm(quat)
qpos[7:] = DEFAULT_POSE
qvel = rng.uniform(-2, 2, 18)
compare_qacc("deep", qpos, qvel, rng.uniform(-1, 1, 12))

# 4. joint limit violation
qpos = np.array(mj.key_qpos[0])
qpos[2] = 0.3
qpos[7:] = DEFAULT_POSE
qpos[7] = 2.6  # beyond upper limit 2.51
qvel = rng.uniform(-1, 1, 18)
compare_qacc("limit", qpos, qvel, rng.uniform(-1, 1, 12))

# 5. random states near ground
fails = 0
for k in range(20):
    qpos = np.array(mj.key_qpos[0])
    qpos[0:2] = rng.uniform(-0.5, 0.5, 2)
    qpos[2] = rng.uniform(0.1, 0.3)
    quat = rng.normal(size=4)
    qpos[3:7] = quat / np.linalg.norm(quat)
    qpos[7:] = np.array(DEFAULT_POSE) + rng.uniform(-0.3, 0.3, 12)
    qvel = rng.uniform(-2, 2, 18)
    ok = compare_qacc(f"rand{k}", qpos, qvel, rng.uniform(-1, 1, 12))
    fails += 0 if ok else 1
print("random fails:", fails)

# 6. trajectory: drop from 0.25, zero ctrl -> default pose PD, 250 steps (1s)
d = mujoco.MjData(mj)
qpos = np.array(mj.key_qpos[0])
qpos[2] = 0.25
qpos[7:] = DEFAULT_POSE
set_state(d, qpos, np.zeros(18), DEFAULT_POSE)
state = pipeline.pipeline_init(m, jnp.asarray(qpos), jnp.zeros(18))
ctrl = jnp.asarray(DEFAULT_POSE)
step1 = jax.jit(lambda s: pipeline.pipeline_step(m, s, ctrl, n_substeps=1))
max_traj_err = 0.0
for t in range(250):
    mujoco.mj_step(mj, d)
    state = step1(state)
    err = np.max(np.abs(np.asarray(state.qpos) - d.qpos))
    max_traj_err = max(max_traj_err, err)
    if t in (0, 1, 4, 24, 99, 249):
        print(f"traj t={t:3d} qpos err={err:.3e} z_ours={float(state.qpos[2]):.6f} z_ref={d.qpos[2]:.6f}")
print("max trajectory qpos err over 250 steps:", max_traj_err)
