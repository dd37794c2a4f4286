"""SoA fused-kernel physics path: correctness vs the XLA pipeline.

The pallas kernel (puppax/physics/soa.py) re-implements the substep math
in batch-on-lanes form; these tests pin it against the oracle-verified XLA
path. On CPU the kernel runs in pallas interpret mode (PUPPAX_SOA
machinery); the compiled-on-chip comparison lives in the tpu-marked tier.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.model.mjcf import load_model
from puppax.physics import pipeline, soa


def _pd_gain(m, kp):
    """Host-numpy actuator-gain edit (model leaves are numpy now)."""
    import numpy as _np

    g = _np.array(m.actuator_gainprm)
    g[:, 0] = kp
    return g


def _pd_bias(m, kp, kd):
    import numpy as _np

    b = _np.array(m.actuator_biasprm)
    b[:, 1] = -kp
    b[:, 2] = -kd
    return b


@pytest.fixture(scope="module")
def model():
    cm = load_model(None)
    m = cm.robot.tree_replace({"opt.timestep": 0.004})
    return m.replace(
        actuator_gainprm=_pd_gain(m, 5.0),
        actuator_biasprm=_pd_bias(m, 5.0, 0.25),
    )


def _random_states(m, B, seed=0):
    rng = np.random.RandomState(seed)
    key_q = np.tile(np.asarray(m.key_qpos), (B, 1))
    qpos = key_q.copy()
    qpos[:, 2] = rng.uniform(0.05, 0.4, B)  # half in contact, half airborne
    qpos[:, 0:2] += rng.uniform(-0.5, 0.5, (B, 2))
    quat = rng.normal(0, 1, (B, 4)) * 0.1 + np.array([1.0, 0, 0, 0])
    qpos[:, 3:7] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
    qpos[:, 7:] += rng.uniform(-0.3, 0.3, (B, 12))
    qvel = rng.uniform(-1.0, 1.0, (B, 18))
    ctrl = key_q[:, 7:] + rng.uniform(-0.3, 0.3, (B, 12))
    return (
        jnp.asarray(qpos, jnp.float32),
        jnp.asarray(qvel, jnp.float32),
        jnp.asarray(ctrl, jnp.float32),
    )


def test_sparse_ldl_matches_dense():
    """The fill-in-free reverse-order LDL^T used in the kernel solves
    tree-sparse SPD systems exactly (validated on Python floats — the
    value algebra runs host-side unchanged)."""
    cm = load_model(None)
    s = soa._Static(cm.robot)
    rng = np.random.RandomState(3)
    A = np.zeros((s.nv, s.nv))
    for j in range(s.nv):
        for k in range(j + 1):
            if s.anc[j, k]:
                A[j, k] = A[k, j] = rng.uniform(-0.3, 0.3)
    A += np.eye(s.nv) * (np.abs(A).sum(axis=1).max() + 1.0)  # SPD, same pattern
    b = rng.uniform(-1, 1, s.nv)
    M = {
        (j, k): float(A[j, k])
        for j in range(s.nv)
        for k in range(j + 1)
        if s.anc[j, k]
    }
    x = soa._ldl_solve_dict(s, M, [float(v) for v in b])
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-10)


def test_soa_supported_gating(model):
    assert soa.soa_supported(model)
    # hfield pairs without grid data (malformed) are rejected
    hf = model.replace(pairs_hfield_sphere=((0, 1),))
    assert not soa.soa_supported(hf)
    # solver iterations > 1 are the XLA path's job
    it = model.replace(solver_iterations=2)
    assert not soa.soa_supported(it)


@pytest.fixture(scope="module")
def box_model():
    """Obstacle-terrain variant: world-static boxes (sphere-box pairs)."""
    import xml.etree.ElementTree as ET

    from puppax.model import assets, obstacles

    tree = obstacles.add_boxes_to_model(
        assets.pupper_xml_tree(), n_boxes=4, x_range=(-1.0, 1.0),
        y_range=(-1.0, 1.0),
    )
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    cm = load_model(None, xml_string=xml)
    m = cm.robot.tree_replace({"opt.timestep": 0.004})
    return m.replace(
        actuator_gainprm=_pd_gain(m, 5.0),
        actuator_biasprm=_pd_bias(m, 5.0, 0.25),
    )


def test_soa_supports_static_boxes(box_model):
    assert len(box_model.pairs_sphere_box) > 0
    assert soa.soa_supported(box_model)


@pytest.mark.slow
def test_soa_emitter_matches_xla_pipeline_boxes(box_model):
    """Sphere-box narrowphase + constraint rows in the SoA program vs the
    oracle-verified XLA path, on states straddling the obstacle bars."""
    m = box_model
    B = 16
    qpos, qvel, ctrl = _random_states(m, B, seed=7)
    s = soa._Static(m)
    # place a FOOT sphere exactly on an obstacle bar, penetrating ~5mm
    # (the XLA solver consumes the MJX-capped contact set —
    # max_geom_pairs=4, max_contact_points=5 — so dynamics agree with the
    # kernel's uncapped C semantics only while the caps don't bind; a
    # 2cm-wide bar is never hit by random states)
    from puppax.physics import smooth

    bar = next(p for p in s.pairs if p.kind == "bs")
    qp0 = np.asarray(m.key_qpos, np.float32).copy()
    qp0[0:3] = 0.0
    kin0 = smooth.kinematics(m, jnp.asarray(qp0))
    axis = np.array(bar.box_R)[:, 1]  # bar length direction (local y)
    foot_geoms = [p.sphere_geom for p in s.pairs if p.kind == "bs"][:4]
    for e in range(4):
        g = foot_geoms[e % len(foot_geoms)]
        rel = np.asarray(kin0.geom_xpos[g])
        t = (-0.6, -0.2, 0.2, 0.6)[e]
        target = np.array(bar.box_pos) + t * axis
        target[2] = bar.box_pos[2] + bar.box_half[2] + float(
            np.asarray(m.geom_size)[g, 0]
        ) - 0.005
        base = target - rel
        qpos = qpos.at[e, 0:3].set(jnp.asarray(base, jnp.float32))
        qpos = qpos.at[e, 3:7].set(jnp.asarray([1.0, 0, 0, 0]))
        qpos = qpos.at[e, 7:].set(jnp.asarray(qp0[7:]))
        qvel = qvel.at[e].set(0.1 * qvel[e])
    assert any(p.kind == "bs" for p in s.pairs)
    kinds = np.array([{"ps": 0, "ss": 1, "bs": 2}[p.kind] for p in s.pairs])

    def xla_step(qp, qv, ct):
        st = pipeline._zeros_state(m, qp, qv)
        out = pipeline.pipeline_step(m, st, ct, n_substeps=1)
        return out.qpos, out.qvel, out.contact.dist

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    dr = soa.dr_inputs(m, s, B)

    bs_dyn_checked = 0
    for e in range(B):
        ql = [qpos[e, i] for i in range(m.nq)]
        vl = [qvel[e, i] for i in range(m.nv)]
        cl = [ctrl[e, i] for i in range(m.nu)]
        drl = {
            k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr[e]).reshape(-1)]
            for k, arr in dr.items()
        }
        fw = soa._emit_forward(s, ql, vl, cl, drl)
        q2, v2 = soa._emit_integrate(s, ql, vl, fw["qacc"])
        q2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in q2])
        v2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in v2])
        dist = np.array(
            [float(soa.materialize(t, qpos[e, 0])) for t in fw["con_dist"]]
        )
        # narrowphase reporting parity holds unconditionally
        # (pipeline_step's .contact is the uncapped collide_pairs set)
        np.testing.assert_allclose(
            dist, np.asarray(ref[2][e]), atol=5e-5, err_msg=f"env {e} con_dist"
        )
        pen = dist < 0
        per_type_ok = all(
            int(np.sum(pen[kinds == t])) <= m.max_geom_pairs for t in range(3)
        )
        if not (per_type_ok and int(np.sum(pen)) <= m.max_contact_points):
            continue  # caps bind: the two solver semantics legitimately differ
        if np.any(pen[kinds == 2]):
            bs_dyn_checked += 1
        np.testing.assert_allclose(
            q2, np.asarray(ref[0][e]), atol=5e-5, err_msg=f"env {e} qpos"
        )
        scale_v = max(1.0, float(np.max(np.abs(ref[1][e]))))
        np.testing.assert_allclose(
            v2 / scale_v, np.asarray(ref[1][e]) / scale_v, atol=5e-4,
            err_msg=f"env {e} qvel (relative)",
        )
    assert bs_dyn_checked >= 1, (
        "no in-cap test state touched a box — dynamics not exercised"
    )


@pytest.fixture(scope="module")
def hfield_model():
    """Rough-terrain variant: world-static heightfield (hfield-sphere
    pairs). 16x16 keeps the host-side 0-d emission quick."""
    import xml.etree.ElementTree as ET

    from puppax.model import assets
    from puppax.model.terrain import add_heightfield_to_model

    tree = add_heightfield_to_model(
        assets.pupper_xml_tree(), nrow=16, ncol=16, seed=2
    )
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    cm = load_model(None, xml_string=xml)
    m = cm.robot.tree_replace({"opt.timestep": 0.004})
    return m.replace(
        actuator_gainprm=_pd_gain(m, 5.0),
        actuator_biasprm=_pd_bias(m, 5.0, 0.25),
    )


def test_soa_supports_static_hfield(hfield_model):
    m = hfield_model
    # every collision sphere (feet + knees) pairs with the terrain
    assert len(m.pairs_hfield_sphere) >= 4
    assert soa.soa_supported(m)
    # unrolled-program size cap
    assert not soa.soa_supported(m.replace(hfield_nrow=5000))
    # non-world-static hfield geoms are the XLA path's job
    foot_geom = m.pairs_hfield_sphere[0][1]
    bad = m.replace(pairs_hfield_sphere=((foot_geom, foot_geom),))
    assert not soa.soa_supported(bad)


@pytest.mark.slow
def test_soa_emitter_matches_xla_pipeline_hfield(hfield_model):
    """Heightfield narrowphase + constraint rows in the SoA program vs the
    oracle-verified XLA path, with feet pinned onto terrain bumps."""
    m = hfield_model
    B = 12
    qpos, qvel, ctrl = _random_states(m, B, seed=11)
    s = soa._Static(m)
    hs = next(p for p in s.pairs if p.kind == "hs")
    H = np.array(hs.hf_grid)
    rx, ry, ez = hs.hf_size
    nrow, ncol = H.shape

    from puppax.physics import smooth

    qp0 = np.asarray(m.key_qpos, np.float32).copy()
    qp0[0:3] = 0.0
    kin0 = smooth.kinematics(m, jnp.asarray(qp0))
    foot_geoms = [p.sphere_geom for p in s.pairs if p.kind == "hs"]
    radii = {p.sphere_geom: p.radius for p in s.pairs if p.kind == "hs"}
    # bumpy target cells away from the flattened spawn disc (interior
    # nodes, offset +0.3 cell to sit strictly inside a bilinear patch)
    nodes = [
        (r, c)
        for r in range(2, nrow - 2)
        for c in range(2, ncol - 2)
        if H[r, c] > 0.5 and abs(-rx + 2 * rx * c / (ncol - 1)) > 0.6
    ]
    assert len(nodes) >= 4, "terrain seed produced no usable bumps"
    for e in range(4):
        r_t, c_t = nodes[(e * len(nodes)) // 4]
        g = foot_geoms[e % len(foot_geoms)]
        rel = np.asarray(kin0.geom_xpos[g])
        tx = -rx + 2 * rx * (c_t + 0.3) / (ncol - 1)
        ty = -ry + 2 * ry * (r_t + 0.3) / (nrow - 1)
        # bilinear surface height at (fu, fv) = (0.3, 0.3) of cell (r_t, c_t)
        surf = ez * (
            0.49 * H[r_t, c_t] + 0.21 * H[r_t, c_t + 1]
            + 0.21 * H[r_t + 1, c_t] + 0.09 * H[r_t + 1, c_t + 1]
        )
        target = np.array([tx, ty, surf + radii[g] - 0.004])
        base = target - rel
        qpos = qpos.at[e, 0:3].set(jnp.asarray(base, jnp.float32))
        qpos = qpos.at[e, 3:7].set(jnp.asarray([1.0, 0, 0, 0]))
        qpos = qpos.at[e, 7:].set(jnp.asarray(qp0[7:]))
        qvel = qvel.at[e].set(0.1 * qvel[e])
    kinds = np.array(
        [{"ps": 0, "ss": 1, "bs": 2, "hs": 3}[p.kind] for p in s.pairs]
    )

    def xla_step(qp, qv, ct):
        st = pipeline._zeros_state(m, qp, qv)
        out = pipeline.pipeline_step(m, st, ct, n_substeps=1)
        return out.qpos, out.qvel, out.contact.dist

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    dr = soa.dr_inputs(m, s, B)

    hs_dyn_checked = 0
    for e in range(B):
        ql = [qpos[e, i] for i in range(m.nq)]
        vl = [qvel[e, i] for i in range(m.nv)]
        cl = [ctrl[e, i] for i in range(m.nu)]
        drl = {
            k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr[e]).reshape(-1)]
            for k, arr in dr.items()
        }
        fw = soa._emit_forward(s, ql, vl, cl, drl)
        q2, v2 = soa._emit_integrate(s, ql, vl, fw["qacc"])
        q2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in q2])
        v2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in v2])
        dist = np.array(
            [float(soa.materialize(t, qpos[e, 0])) for t in fw["con_dist"]]
        )
        np.testing.assert_allclose(
            dist, np.asarray(ref[2][e]), atol=5e-5, err_msg=f"env {e} con_dist"
        )
        pen = dist < 0
        per_type_ok = all(
            int(np.sum(pen[kinds == t])) <= m.max_geom_pairs for t in range(4)
        )
        if not (per_type_ok and int(np.sum(pen)) <= m.max_contact_points):
            continue  # caps bind: the two solver semantics legitimately differ
        if np.any(pen[kinds == 3]):
            hs_dyn_checked += 1
        np.testing.assert_allclose(
            q2, np.asarray(ref[0][e]), atol=5e-5, err_msg=f"env {e} qpos"
        )
        scale_v = max(1.0, float(np.max(np.abs(ref[1][e]))))
        np.testing.assert_allclose(
            v2 / scale_v, np.asarray(ref[1][e]) / scale_v, atol=5e-4,
            err_msg=f"env {e} qvel (relative)",
        )
    assert hs_dyn_checked >= 1, (
        "no in-cap test state touched the terrain — dynamics not exercised"
    )


@pytest.fixture(scope="module")
def capsule_model():
    """Capsule-legged variant (the common real-world quadruped primitive):
    foot spheres -> capsules, exercising plane-capsule (2 rows/pair),
    sphere-capsule and capsule-capsule in the kernel's supported class."""
    import xml.etree.ElementTree as ET

    from puppax.model.assets import pupper_xml

    tree = ET.ElementTree(ET.fromstring(pupper_xml()))
    n = 0
    for geom in tree.getroot().iter("geom"):
        if geom.get("type") == "sphere" and geom.get("size") == "0.01995":
            geom.set("type", "capsule")
            geom.set("size", "0.015 0.02")
            n += 1
    assert n == 4, n
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    cm = load_model(None, xml_string=xml)
    m = cm.robot.tree_replace({"opt.timestep": 0.004})
    return m.replace(
        actuator_gainprm=_pd_gain(m, 5.0),
        actuator_biasprm=_pd_bias(m, 5.0, 0.25),
    )


def test_soa_supports_capsules(capsule_model):
    m = capsule_model
    assert len(m.pairs_plane_capsule) == 4
    assert soa.soa_supported(m)
    s = soa._Static(m)
    # two rows per plane-capsule pair, in collide's interleaved order
    pc = [p for p in s.pairs if p.kind == "pc"]
    assert len(pc) == 8
    assert [p.cap_end for p in pc[:4]] == [0, 1, 0, 1]
    assert s.npair == len(s.pairs)


@pytest.mark.slow
def test_soa_emitter_matches_xla_pipeline_capsules(capsule_model):
    """Capsule narrowphases (pc/sc/cc) + constraint rows in the SoA
    program vs the oracle-verified XLA path (tests/test_capsule.py pins
    that path against the MuJoCo C engine). con_dist parity covers the
    sc/cc closest-point math on every state (contact or not); dynamics
    are exercised through the standing plane-capsule contacts."""
    m = capsule_model
    B = 12
    qpos, qvel, ctrl = _random_states(m, B, seed=4)
    s = soa._Static(m)
    # pin the first four envs near standing so capsule feet penetrate
    qp0 = np.asarray(m.key_qpos, np.float32)
    for e in range(4):
        qpos = qpos.at[e].set(jnp.asarray(qp0))
        qpos = qpos.at[e, 2].set(qp0[2] - 0.004 * (e + 1))
        qvel = qvel.at[e].set(0.1 * qvel[e])
    kinds = np.array(
        [
            {"ps": 0, "ss": 1, "bs": 2, "hs": 3, "pc": 4, "sc": 5, "cc": 6}[
                p.kind
            ]
            for p in s.pairs
        ]
    )

    def xla_step(qp, qv, ct):
        st = pipeline._zeros_state(m, qp, qv)
        out = pipeline.pipeline_step(m, st, ct, n_substeps=1)
        return out.qpos, out.qvel, out.contact.dist

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    dr = soa.dr_inputs(m, s, B)

    pc_dyn_checked = 0
    for e in range(B):
        ql = [qpos[e, i] for i in range(m.nq)]
        vl = [qvel[e, i] for i in range(m.nv)]
        cl = [ctrl[e, i] for i in range(m.nu)]
        drl = {
            k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr[e]).reshape(-1)]
            for k, arr in dr.items()
        }
        fw = soa._emit_forward(s, ql, vl, cl, drl)
        q2, v2 = soa._emit_integrate(s, ql, vl, fw["qacc"])
        q2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in q2])
        v2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in v2])
        dist = np.array(
            [float(soa.materialize(t, qpos[e, 0])) for t in fw["con_dist"]]
        )
        np.testing.assert_allclose(
            dist, np.asarray(ref[2][e]), atol=5e-5, err_msg=f"env {e} con_dist"
        )
        pen = dist < 0
        per_type_ok = all(
            int(np.sum(pen[kinds == t])) <= m.max_geom_pairs for t in range(7)
        )
        if not (per_type_ok and int(np.sum(pen)) <= m.max_contact_points):
            continue  # caps bind: the two solver semantics legitimately differ
        if np.any(pen[kinds == 4]):
            pc_dyn_checked += 1
        np.testing.assert_allclose(
            q2, np.asarray(ref[0][e]), atol=5e-5, err_msg=f"env {e} qpos"
        )
        scale_v = max(1.0, float(np.max(np.abs(ref[1][e]))))
        np.testing.assert_allclose(
            v2 / scale_v, np.asarray(ref[1][e]) / scale_v, atol=5e-4,
            err_msg=f"env {e} qvel (relative)",
        )
    assert pc_dyn_checked >= 1, (
        "no in-cap test state stood on its capsule feet — dynamics not exercised"
    )


@pytest.mark.slow
def test_soa_all_pair_kinds_combined_reporting():
    """One model combining obstacle boxes + heightfield + sphere feet +
    knee spheres + floor plane (capsule feet can't join: box-capsule /
    hfield-capsule pairs are outside the engine's class — the mjcf
    enumerator rejects them for the XLA path too): con_dist reporting
    parity pins the _Static pair ordering against collision.collide's
    type-block order across the whole table."""
    import xml.etree.ElementTree as ET

    from puppax.model import assets, obstacles, terrain

    tree = obstacles.add_boxes_to_model(
        assets.pupper_xml_tree(), n_boxes=3, x_range=(-1.0, 1.0),
        y_range=(-1.0, 1.0),
    )
    tree = terrain.add_heightfield_to_model(tree, nrow=8, ncol=8, seed=3)
    xml = ET.tostring(tree.getroot(), encoding="unicode")
    cm = load_model(None, xml_string=xml)
    m = cm.robot.tree_replace({"opt.timestep": 0.004})
    assert soa.soa_supported(m)
    s = soa._Static(m)
    kinds_present = {p.kind for p in s.pairs}
    assert {"ps", "ss", "bs", "hs"} <= kinds_present, kinds_present

    B = 6
    qpos, qvel, ctrl = _random_states(m, B, seed=9)
    dr = soa.dr_inputs(m, s, B)

    def xla_step(qp, qv, ct):
        st = pipeline._zeros_state(m, qp, qv)
        out = pipeline.pipeline_step(m, st, ct, n_substeps=1)
        return out.contact.dist

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    for e in range(B):
        ql = [qpos[e, i] for i in range(m.nq)]
        vl = [qvel[e, i] for i in range(m.nv)]
        cl = [ctrl[e, i] for i in range(m.nu)]
        drl = {
            k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr[e]).reshape(-1)]
            for k, arr in dr.items()
        }
        fw = soa._emit_forward(s, ql, vl, cl, drl)
        dist = np.array(
            [float(soa.materialize(t, qpos[e, 0])) for t in fw["con_dist"]]
        )
        np.testing.assert_allclose(
            dist, np.asarray(ref[e]), atol=5e-5, err_msg=f"env {e} con_dist"
        )


@pytest.mark.slow
def test_soa_emitter_matches_xla_pipeline(model):
    """The SoA program (run host-side on 0-d values — the value algebra is
    layout-agnostic) vs the oracle-verified XLA path on random in-contact
    and airborne states. The pallas LOWERING of the same program is
    covered by the tpu-marked on-device test; full interpret-mode runs
    are impractically slow on CPU (>10 min)."""
    m = model
    B = 12
    qpos, qvel, ctrl = _random_states(m, B)
    s = soa._Static(m)

    def xla_step(qp, qv, ct):
        st = pipeline._zeros_state(m, qp, qv)
        out = pipeline.pipeline_step(m, st, ct, n_substeps=1)
        return out.qpos, out.qvel, out.qacc

    ref = jax.jit(jax.vmap(xla_step))(qpos, qvel, ctrl)
    dr = soa.dr_inputs(m, s, B)

    for e in range(B):
        ql = [qpos[e, i] for i in range(m.nq)]
        vl = [qvel[e, i] for i in range(m.nv)]
        cl = [ctrl[e, i] for i in range(m.nu)]
        drl = {
            k: [jnp.asarray(x, jnp.float32) for x in np.asarray(arr[e]).reshape(-1)]
            for k, arr in dr.items()
        }
        fw = soa._emit_forward(s, ql, vl, cl, drl)
        q2, v2 = soa._emit_integrate(s, ql, vl, fw["qacc"])
        q2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in q2])
        v2 = np.array([float(soa.materialize(t, qpos[e, 0])) for t in v2])
        scale_v = max(1.0, float(np.max(np.abs(ref[1][e]))))
        np.testing.assert_allclose(
            q2, np.asarray(ref[0][e]), atol=5e-5, err_msg=f"env {e} qpos"
        )
        np.testing.assert_allclose(
            v2 / scale_v, np.asarray(ref[1][e]) / scale_v, atol=5e-4,
            err_msg=f"env {e} qvel (relative)",
        )


@pytest.mark.slow
def test_env_cv_splice_matches_direct_pipeline(monkeypatch):
    """The custom_vmap splice's FALLBACK path (cv function + static
    contact reattachment) must reproduce the direct pipeline_step env
    path exactly — guards the splice wiring (tuple packing, Contacts
    reassembly). The kernel leg of the splice is covered by the
    tpu-marked on-device test (interpret mode is impractically slow for
    this program on CPU)."""
    from puppax.configs import get_config
    from puppax.env import PupperV3Env

    monkeypatch.setenv("PUPPAX_SOA", "off")

    def run(use_cv):
        env = PupperV3Env(
            path=None,
            reward_config=get_config(),
            action_scale=0.75,
            observation_history=2,
        )
        assert env._use_soa_cv
        if not use_cv:
            env._use_soa_cv = False  # direct pipeline.pipeline_step path
        B = 8
        rngs = jax.random.split(jax.random.PRNGKey(11), B)
        state = jax.jit(jax.vmap(env.reset))(rngs)
        step = jax.jit(jax.vmap(env.step))
        outs = []
        for t in range(3):
            act = jax.random.uniform(
                jax.random.PRNGKey(100 + t), (B, 12), minval=-0.5, maxval=0.5
            )
            state = step(state, act)
            outs.append(
                (np.asarray(state.obs), np.asarray(state.reward),
                 np.asarray(state.done), np.asarray(state.pipeline_state.qpos))
            )
        return outs

    ref = run(use_cv=False)
    got = run(use_cv=True)
    for t, ((obs_a, rew_a, done_a, q_a), (obs_b, rew_b, done_b, q_b)) in enumerate(
        zip(ref, got)
    ):
        np.testing.assert_allclose(q_a, q_b, atol=1e-5, err_msg=f"qpos t={t}")
        np.testing.assert_allclose(obs_a, obs_b, atol=1e-4, err_msg=f"obs t={t}")
        np.testing.assert_allclose(rew_a, rew_b, atol=1e-5, err_msg=f"rew t={t}")
        np.testing.assert_array_equal(done_a, done_b)


@pytest.mark.tpu
@pytest.mark.slow
def test_on_device_soa_matches_xla():
    """Compiled SoA kernel vs XLA path through the full env on the real
    chip: 3-step batched trajectories agree, finite, and the kernel path
    is faster (re-exec worker pattern, see tests/test_tpu_numerics.py)."""
    import json
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "soa_tpu_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # 45 min: two full env compiles through the TPU tunnel can exceed the
    # old 900 s budget (ADVICE r2 — the FF on-chip log was this timeout)
    proc = subprocess.run(
        [sys.executable, worker], env=env, capture_output=True, text=True,
        timeout=2700,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    if result["backend"] == "cpu":
        pytest.skip("no accelerator present (worker resolved to cpu)")
    assert result["finite"]
    assert result["d_done"] == 0.0
    # 3 steps from reset: f32-noise-level agreement (chaos has not had
    # time to amplify; see tests/test_reference_parity.py for the model)
    assert result["d_q"] < 5e-3, result
    assert result["d_obs"] < 2e-2, result
    assert result["d_rew"] < 1e-3, result
    # the kernel path must actually be faster end-to-end
    assert result["soa_us_per_step"] < result["xla_us_per_step"], result
