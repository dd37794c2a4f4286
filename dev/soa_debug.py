#!/usr/bin/env python
"""Phase-by-phase SoA emitter debug against the XLA path, single env.

The value algebra runs on 0-d jnp arrays host-side, so every intermediate
(M, bias, qacc_smooth, efc rows, qacc) can be compared directly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from puppax.model.mjcf import load_model
from puppax.physics import constraint, collision, smooth, soa, solver
from puppax.ops import linalg

cm = load_model(None)
m = cm.robot.tree_replace({"opt.timestep": 0.004})
m = m.replace(
    actuator_gainprm=m.actuator_gainprm.at[:, 0].set(5.0),
    actuator_biasprm=m.actuator_biasprm.at[:, 1].set(-5.0).at[:, 2].set(-0.25),
)
s = soa._Static(m, cm.mj_model)

rng = np.random.RandomState(0)
qpos = np.array(m.key_qpos)
qpos[2] = 0.11  # penetrating contact
qpos[7:] += rng.uniform(-0.2, 0.2, 12)
qvel = rng.uniform(-0.5, 0.5, 18)
ctrl = np.asarray(m.key_qpos)[7:]

q = jnp.asarray(qpos, jnp.float32)
v = jnp.asarray(qvel, jnp.float32)
c = jnp.asarray(ctrl, jnp.float32)

# --- XLA path intermediates ---
kin = smooth.kinematics(m, q)
com = smooth.com_pos(m, kin)
vel = smooth.com_vel(m, com, v)
qM = smooth.crb(m, com)
bias = smooth.rne(m, com, vel, v)
passive = smooth.passive(m, v)
act = smooth.actuation(m, q, v, c)
qacc_smooth = linalg.spd_solve(qM, passive + act - bias)
contacts = collision.collide(m, kin)
efc = constraint.make_efc(m, com, q, v, contacts)
res = solver.solve(m, qM, qacc_smooth, efc)

# --- SoA emitter on 0-d values ---
ql = [q[i] for i in range(m.nq)]
vl = [v[i] for i in range(m.nv)]
cl = [c[i] for i in range(m.nu)]
dr = {k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr).reshape(-1)]
      for k, arr in soa.dr_inputs(m, s, 1).items()}
dr = {k: val for k, val in dr.items()}
dr["_debug"] = True
fw = soa._emit_forward(s, ql, vl, cl, dr)


def dm(name, a, b):
    a = np.asarray(a, np.float64).reshape(-1)
    b = np.asarray(b, np.float64).reshape(-1)
    print(f"{name:14s} {np.max(np.abs(a - b)):.3e}")


def flt(x):
    return [float(t) for t in x]


# M comparison
Md = np.zeros((18, 18))
for (j, k), val in fw["M"].items():
    Md[j, k] = Md[k, j] = float(val)
dm("M", Md, qM)
dm("qfrc_bias", flt(fw["qfrc_bias"]), bias)
dm("qfrc_act", flt(fw["qfrc_act"]), act)
dm("qacc_smooth", flt(fw["qacc_smooth"]), qacc_smooth)

# efc rows: XLA order [fric 12, lim 12, contacts ncon*4]; SoA order
# [fric, lim, con(plane 8 + ss 24)*4]. Compare fric+lim directly.
rows = fw["rows"]
soa_aref = np.array([float(soa.materialize(r.aref, q[0])) for r in rows])
soa_D = np.array([float(soa.materialize(r.D, q[0])) for r in rows])
dm("aref[fric+lim]", soa_aref[:24], efc.aref[:24])
dm("D[fric+lim]", soa_D[:24], efc.D[:24])

# contact rows: match by (geom pair) between XLA capped set and SoA pairs
con_dist = np.array([float(d) for d in fw["con_dist"]])
print("soa con_dist[:8] ", con_dist[:8].round(4))
print("xla contact dist ", np.asarray(contacts.dist).round(4),
      np.asarray(contacts.geom1), np.asarray(contacts.geom2))
# XLA contact rows start at 24; find SoA row block for each XLA contact
xg = list(zip(np.asarray(contacts.geom1).tolist(), np.asarray(contacts.geom2).tolist()))
for ci, (g1, g2) in enumerate(xg):
    for pi, pr in enumerate(s.pairs):
        if (pr.geom1, pr.geom2) == (g1, g2) and np.asarray(contacts.dist)[ci] < 1e9:
            for f in range(4):
                xr = 24 + ci * 4 + f
                sr = 24 + pi * 4 + f
                da = abs(float(soa_aref[sr]) - float(efc.aref[xr]))
                dd = abs(float(soa_D[sr]) - float(efc.D[xr]))
                jx = np.asarray(efc.J[xr])
                js = np.zeros(18)
                for d_, val in rows[sr].J.items():
                    js[d_] = float(soa.materialize(val, q[0]))
                dj = np.max(np.abs(js - jx))
                if max(da, dd / max(abs(float(efc.D[xr])), 1), dj) > 1e-3:
                    print(f"  contact ci={ci} facet={f}: d_aref={da:.2e} "
                          f"d_D={dd:.2e} d_J={dj:.2e}")
            break

dm("qacc", flt(fw["qacc"]), res.qacc)

# --- deep-dive: replicate solver.solve internals on the XLA side ---
print("\n-- newton internals --")
x0 = qacc_smooth
jar_x = jnp.sum(efc.J * x0[None, :], axis=-1) - efc.aref
force_x, quad_x = solver._row_force(efc, jar_x)
ma_x = jnp.sum(qM * (x0 - qacc_smooth)[None, :], axis=-1)
grad_x = ma_x - jnp.sum(efc.J * force_x[:, None], axis=0)
dw_x = efc.D * quad_x.astype(jnp.float32)
H_x = qM + jnp.sum(dw_x[:, None, None] * efc.J[:, :, None] * efc.J[:, None, :], axis=0)
dx_x = -linalg.spd_solve(H_x, grad_x)

# SoA side on scalars: re-run pieces of _emit_newton manually
rows = fw["rows"]
Mdict = fw["M"]
xs = fw["qacc_smooth"]
jar_s2, force_s2, quadw_s2 = [], [], []
ref0 = q[0]
for r in rows:
    acc = soa.neg(r.aref)
    for d_, jv_ in r.J.items():
        acc = soa.fma(acc, jv_, xs[d_])
    jar_s2.append(acc)
import jax.numpy as jnp2
for r, ja in zip(rows, jar_s2):
    ja_t = soa.materialize(ja, ref0)
    quad = ja_t < 0
    f = jnp2.where(quad, -soa.materialize(r.D, ref0) * ja_t, 0.0)
    if r.fric:
        thresh = r.floss * r.R
        quad = jnp2.abs(ja_t) <= thresh
        f = jnp2.where(quad, -r.D * ja_t, -jnp2.sign(ja_t) * r.floss)
    force_s2.append(f)
    quadw_s2.append(jnp2.where(quad, soa.materialize(r.D, ref0), 0.0))

grad_s2 = [0.0] * 18
for r, f in zip(rows, force_s2):
    for d_, jv_ in r.J.items():
        grad_s2[d_] = soa.sub(grad_s2[d_], soa.mul(jv_, f))

# compare grad (ma = 0 at x=xs)
gs = np.array([float(soa.materialize(g, ref0)) for g in grad_s2])
print("grad diff:", np.max(np.abs(gs - np.asarray(grad_x))))

H_s2 = {(j, k): Mdict.get((j, k), 0.0) for j in range(18) for k in range(j + 1)}
for r, w in zip(rows, quadw_s2):
    dofs_ = list(r.J.keys())
    for ai, d1 in enumerate(dofs_):
        for d2 in dofs_[: ai + 1]:
            hi_, lo_ = (d1, d2) if d1 >= d2 else (d2, d1)
            H_s2[(hi_, lo_)] = soa.fma(H_s2[(hi_, lo_)], soa.mul(w, r.J[d1]), r.J[d2])
Hd = np.zeros((18, 18))
for (j, k), val in H_s2.items():
    Hd[j, k] = Hd[k, j] = float(soa.materialize(val, ref0))
print("H diff:", np.max(np.abs(Hd - np.asarray(H_x))))
dx_s2 = [soa.neg(t) for t in soa._ldl_solve_dict(s, H_s2, grad_s2, pattern=s.dense)]
dxs = np.array([float(soa.materialize(t, ref0)) for t in dx_s2])
print("dx diff:", np.max(np.abs(dxs - np.asarray(dx_x))), " |dx|", np.max(np.abs(dxs)))
