"""Loading the REAL (mesh-bearing) robot model (VERDICT r1 item 4).

Deployment users hand the framework the original monorepo MJCF with its 13
visual STL meshes (/root/reference/test/test_pupper_model.xml:24-47,
meshdir ../meshes/stl). The bundled puppax model is a mesh-stripped
derivation; these tests prove the original compiles into a RobotModel
whose physics is identical, and that the renderer can consume it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from puppax.model.mjcf import load_model
from puppax.physics import pipeline

REFERENCE_XML = "/root/reference/test/test_pupper_model.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_XML), reason="reference checkout not present"
)


@pytest.fixture(scope="module")
def models():
    mesh = load_model(REFERENCE_XML)
    bundled = load_model(None)
    return mesh, bundled


def test_mesh_model_compiles_with_visual_geoms(models):
    mesh, bundled = models
    m, b = mesh.robot, bundled.robot
    assert mesh.mj_model.nmesh == 13  # the STL visual meshes resolved
    assert m.ngeom > b.ngeom  # visual mesh geoms present
    # identical collision topology (visual meshes are contype 0)
    assert len(m.pairs_plane_sphere) == len(b.pairs_plane_sphere)
    assert len(m.pairs_sphere_sphere) == len(b.pairs_sphere_sphere)


def test_mesh_model_physics_tables_identical(models):
    """The mesh-stripped bundled model must be physically identical to the
    original: same joint/inertial/actuator/solver tables bit-for-bit."""
    mesh, bundled = models
    m, b = mesh.robot, bundled.robot
    for field in (
        "qpos0", "key_qpos", "body_pos", "body_quat", "body_ipos",
        "body_iquat", "body_mass", "body_inertia", "jnt_pos", "jnt_axis",
        "jnt_range", "dof_armature", "dof_damping", "dof_frictionloss",
        "dof_invweight0", "body_invweight0", "actuator_gainprm",
        "actuator_biasprm", "actuator_forcerange", "site_pos",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(m, field)), np.asarray(getattr(b, field)),
            err_msg=field,
        )
    assert m.body_parentid == b.body_parentid
    assert m.jnt_type == b.jnt_type
    assert m.timestep == b.timestep
    assert m.impratio == b.impratio


def test_mesh_model_rollout_matches_bundled(models):
    """250 physics substeps from the home keyframe: identical trajectories
    (the collision-active geoms have different indices but the same pair
    math in the same order)."""
    mesh, bundled = models
    m, b = mesh.robot, bundled.robot
    qpos = jnp.asarray(np.asarray(m.key_qpos), jnp.float32)
    qvel = jnp.zeros(m.nv, jnp.float32)
    ctrl = qpos[7:]

    def roll(model):
        st = pipeline.pipeline_init(model, qpos, qvel)
        step = jax.jit(
            lambda s: pipeline.pipeline_step(model, s, ctrl, n_substeps=5)
        )
        for _ in range(50):
            st = step(st)
        return np.asarray(st.qpos), np.asarray(st.qvel)

    qa, va = roll(m)
    qb, vb = roll(b)
    np.testing.assert_allclose(qa, qb, atol=1e-6)
    np.testing.assert_allclose(va, vb, atol=1e-5)


def test_mesh_model_renders_when_gl_available(models, tmp_path):
    """tools/video can render a frame of the mesh model (EGL/OSMesa
    probe; skip gracefully headless — the reference excluded its video
    test from CI the same way, python-package.yml:39)."""
    mesh, _ = models
    import mujoco

    try:
        renderer = mujoco.Renderer(mesh.mj_model, height=120, width=160)
    except Exception as e:  # no GL in this image
        pytest.skip(f"no GL: {e}")
    data = mujoco.MjData(mesh.mj_model)
    data.qpos[:] = np.asarray(mesh.mj_model.key_qpos).reshape(-1)
    mujoco.mj_forward(mesh.mj_model, data)
    renderer.update_scene(data, camera="tracking_cam")
    frame = renderer.render()
    assert frame.shape == (120, 160, 3)
    assert frame.std() > 1.0  # not a blank frame
