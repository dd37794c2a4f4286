"""Dump mujoco efc arrays for a grounded configuration."""
import mujoco
import numpy as np

np.set_printoptions(precision=8, suppress=True, linewidth=200)

mj = mujoco.MjModel.from_xml_path("/root/reference/test/test_pupper_model.xml")
d = mujoco.MjData(mj)
# standing pose near ground so feet penetrate slightly
d.qpos[:] = mj.key_qpos[0]
d.qpos[2] = 0.155  # sink so foot spheres touch floor
d.qpos[7:] = [0.26, 0.0, -0.52, -0.26, 0.0, 0.52, 0.26, 0.0, -0.52, -0.26, 0.0, 0.52]
rng = np.random.default_rng(1)
d.qvel[:] = rng.uniform(-0.5, 0.5, 18)
d.ctrl[:] = rng.uniform(-1, 1, 12)
mujoco.mj_forward(mj, d)

print("ncon", d.ncon, "nefc", d.nefc)
for i in range(d.ncon):
    c = d.contact[i]
    print(f"contact {i}: geoms {c.geom1},{c.geom2} dist {c.dist:.8f} pos {c.pos} "
          f"friction {c.friction} solref {c.solref} solimp {c.solimp} dim {c.dim} "
          f"efc_address {c.efc_address}")
    print("  frame:", np.asarray(c.frame).reshape(3, 3))
print("efc_type", d.efc_type[:d.nefc])
print("efc_id", d.efc_id[:d.nefc])
print("efc_pos", d.efc_pos[:d.nefc])
print("efc_margin", d.efc_margin[:d.nefc])
print("efc_D", d.efc_D[:d.nefc])
print("efc_R", d.efc_R[:d.nefc])
print("efc_aref", d.efc_aref[:d.nefc])
print("efc_frictionloss", d.efc_frictionloss[:d.nefc])
print("efc_force", d.efc_force[:d.nefc])
print("efc_vel", d.efc_vel[:d.nefc])
print("KBIP", d.efc_KBIP[:d.nefc])
J = d.efc_J[:d.nefc*mj.nv].reshape(d.nefc, mj.nv)
print("efc_J nonzero cols per row:", [np.nonzero(J[i])[0].tolist() for i in range(min(d.nefc, 50))])
print("qacc", d.qacc)
print("qacc_smooth", d.qacc_smooth)
print("qfrc_constraint", d.qfrc_constraint)
print("solver_niter", d.solver_niter[0] if hasattr(d, 'solver_niter') else '?')
# J rows for first contact
if d.ncon:
    adr = d.contact[0].efc_address
    print("J rows of contact 0:\n", J[adr:adr+4])
