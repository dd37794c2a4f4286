#!/usr/bin/env python
"""Validate the SoA pallas kernel against the XLA pipeline, CPU interpret.

Runs N random states (mid-air + in-contact) through both paths for 1 and 5
substeps and prints max deviations of qpos/qvel/qacc/xpos/sites.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SOA_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
INTERPRET = os.environ.get("SOA_INTERPRET", "0") == "1"

import jax.numpy as jnp
import numpy as np

from puppax.model.mjcf import load_model
from puppax.physics import pipeline, soa

B = 256

cm = load_model(None)
m = cm.robot.tree_replace({"opt.timestep": 0.004})
# actuator override like the env (PD kp=5, kd=0.25)
m = m.replace(
    actuator_gainprm=m.actuator_gainprm.at[:, 0].set(5.0),
    actuator_biasprm=m.actuator_biasprm.at[:, 1].set(-5.0).at[:, 2].set(-0.25),
)
assert soa.soa_supported(m), "flat model must be SoA-supported"
s = soa._Static(m, cm.mj_model)

rng = np.random.RandomState(0)
key_q = np.tile(np.asarray(m.key_qpos), (B, 1))
qpos = key_q.copy()
qpos[:, 2] = rng.uniform(0.13, 0.4, B)  # in contact through airborne
qpos[:, 0:2] += rng.uniform(-0.5, 0.5, (B, 2))
quat = rng.normal(0, 1, (B, 4)) * 0.1 + np.array([1.0, 0, 0, 0])
qpos[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
qpos[:, 7:] += rng.uniform(-0.3, 0.3, (B, 12))
qvel = rng.uniform(-1.0, 1.0, (B, 18))
ctrl = key_q[:, 7:] + rng.uniform(-0.3, 0.3, (B, 12))

qpos = jnp.asarray(qpos, jnp.float32)
qvel = jnp.asarray(qvel, jnp.float32)
ctrl = jnp.asarray(ctrl, jnp.float32)

for n_sub in (1, 5):
    # XLA reference path
    def xla_step(qp, qv, ct):
        st = pipeline.PhysicsState(
            qpos=qp, qvel=qv, qacc=jnp.zeros_like(qv),
            x_pos=jnp.zeros((m.nbody - 1, 3)), x_rot=jnp.zeros((m.nbody - 1, 4)),
            xd_vel=jnp.zeros((m.nbody - 1, 3)), xd_ang=jnp.zeros((m.nbody - 1, 3)),
            xpos=jnp.zeros((m.nbody, 3)), site_xpos=jnp.zeros((m.nsite, 3)),
            qfrc_actuator=jnp.zeros(m.nv), contact=None,
        )
        out = pipeline.pipeline_step(m, st, ct, n_substeps=n_sub)
        return (out.qpos, out.qvel, out.qacc, out.xpos, out.site_xpos,
                out.x_rot, out.xd_vel, out.xd_ang)

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    dr = soa.dr_inputs(m, s, B)
    q2, v2, caches = soa.step_batched(
        s, qpos, qvel, ctrl, dr, n_substeps=n_sub, interpret=INTERPRET
    )

    def dmax(a, b):
        a, b = jnp.asarray(a), jnp.asarray(b)
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        return f"abs {float(jnp.max(jnp.abs(a - b))):.2e} rel {float(jnp.max(jnp.abs(a - b)))/scale:.2e}"

    print(f"--- n_substeps={n_sub} ---")
    print("qpos ", dmax(ref[0], q2))
    print("qvel ", dmax(ref[1], v2))
    print("qacc ", dmax(ref[2], caches["qacc"]))
    print("xpos ", dmax(ref[3], caches["xpos"].reshape(B, m.nbody, 3)))
    print("site ", dmax(ref[4], caches["site_xpos"].reshape(B, m.nsite, 3)))
    print("xrot ", dmax(ref[5], caches["xquat"].reshape(B, m.nbody - 1, 4)))
    print("xdv  ", dmax(ref[6], caches["xd_vel"].reshape(B, m.nbody - 1, 3)))
    print("xda  ", dmax(ref[7], caches["xd_ang"].reshape(B, m.nbody - 1, 3)))
