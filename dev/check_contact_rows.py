"""Row-level comparison of contact efc rows vs mujoco C."""
import os

os.environ["JAX_ENABLE_X64"] = "1"
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import mujoco
import numpy as np

from puppax.model.mjcf import load_model
from puppax.physics import collision, constraint, smooth
from puppax.physics import solver as psolver

np.set_printoptions(precision=8, suppress=True, linewidth=200)
XML = "/root/reference/test/test_pupper_model.xml"
mj = mujoco.MjModel.from_xml_path(XML)
mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
cm = load_model(XML, dtype=jnp.float64)
m = cm.robot.replace(max_contact_points=32, max_geom_pairs=32)
DEFAULT_POSE = [0.26, 0.0, -0.52, -0.26, 0.0, 0.52, 0.26, 0.0, -0.52, -0.26, 0.0, 0.52]

rng = np.random.default_rng(0)
_ = rng.uniform(-1, 1, 18)
_ = rng.uniform(-1, 1, 12)
qpos = np.array(mj.key_qpos[0])
qpos[2] = 0.155
qpos[7:] = DEFAULT_POSE
qvel = rng.uniform(-0.5, 0.5, 18)
ctrl = rng.uniform(-1, 1, 12)

d = mujoco.MjData(mj)
d.qpos[:] = qpos
d.qvel[:] = qvel
d.ctrl[:] = ctrl
mujoco.mj_forward(mj, d)

kin = smooth.kinematics(m, jnp.asarray(qpos))
com = smooth.com_pos(m, kin)
contacts = collision.collide(m, kin)
efc = constraint.make_efc(m, com, jnp.asarray(qpos), jnp.asarray(qvel), contacts)

ncon_c = d.ncon
J_c = d.efc_J[: d.nefc * mj.nv].reshape(d.nefc, mj.nv)
nrow_start = 12 + 12  # our friction + limit rows

print("C contacts:", [(d.contact[i].geom1, d.contact[i].geom2, d.contact[i].dist) for i in range(ncon_c)])
ours_list = [(int(contacts.geom1[i]), int(contacts.geom2[i]), float(contacts.dist[i])) for i in range(contacts.dist.shape[0])]
print("our contacts (first 8):", ours_list[:8])

for i in range(ncon_c):
    c = d.contact[i]
    # find matching our contact
    mine = None
    for k in range(contacts.dist.shape[0]):
        if int(contacts.geom1[k]) == c.geom1 and int(contacts.geom2[k]) == c.geom2:
            mine = k
            break
    print(f"C contact {i} (g{c.geom1},g{c.geom2}) -> ours {mine}")
    print("  dist C", c.dist, "ours", float(contacts.dist[mine]))
    print("  pos  C", np.asarray(c.pos), "ours", np.asarray(contacts.pos[mine]))
    print("  frame C", np.asarray(c.frame).reshape(3, 3)[1], "ours t1", np.asarray(contacts.frame[mine, 1]))
    adr = c.efc_address
    for f in range(4):
        crow = J_c[adr + f]
        ourrow = np.asarray(efc.J[nrow_start + 4 * mine + f])
        # C facet ordering may differ; find best match among our 4
        errs = [np.max(np.abs(np.asarray(efc.J[nrow_start + 4 * mine + g]) - crow)) for g in range(4)]
        best = int(np.argmin(errs))
        print(f"  facet {f}: best-match our facet {best} Jerr={errs[best]:.2e} "
              f"aref C={d.efc_aref[adr+f]:.6f} ours={float(efc.aref[nrow_start+4*mine+best]):.6f} "
              f"D C={d.efc_D[adr+f]:.6f} ours={float(efc.D[nrow_start+4*mine+best]):.6f}")
