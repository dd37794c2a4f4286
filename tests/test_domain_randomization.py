"""DR tests (mirrors reference test/test_domain_randomization.py):
start-pose bounds over many seeds; batched-model shapes; deliberately
disjoint ranges prove every leaf actually changed."""

import jax
import jax.numpy as jnp
import numpy as np

from puppax.env import domain_randomization as dr
from puppax.model.assets import pupper_xml
from puppax.model.mjcf import load_model


def test_randomize_qpos_bounds():
    cfg = dr.StartPositionRandomization(
        x_min=-1.0, x_max=1.0, y_min=-2.0, y_max=2.0, z_min=0.18, z_max=0.24
    )
    qpos0 = jnp.zeros(19).at[3].set(1.0)
    for seed in range(100):
        q = dr.randomize_qpos(qpos0, cfg, jax.random.PRNGKey(seed))
        assert -1.0 <= float(q[0]) <= 1.0
        assert -2.0 <= float(q[1]) <= 2.0
        assert 0.18 <= float(q[2]) <= 0.24
        np.testing.assert_allclose(jnp.linalg.norm(q[3:7]), 1.0, atol=1e-6)
        # yaw-only quaternion: x and y components are zero
        np.testing.assert_allclose(q[4:6], 0.0, atol=1e-7)


def test_domain_randomize_batched_shapes_and_ranges():
    model = load_model(None, xml_string=pupper_xml()).robot
    N = 10
    rng = jax.random.split(jax.random.PRNGKey(0), N)
    # disjoint ranges so "changed" is provable (reference test pattern)
    batched, in_axes = dr.domain_randomize(
        model,
        rng,
        friction_range=(2.0, 10.0),  # default slide friction is 0.8/1.0
        kp_multiplier_range=(20.0, 30.0),
        kd_multiplier_range=(40.0, 50.0),
        body_com_x_shift_range=(10.0, 20.0),
        body_com_y_shift_range=(10.0, 20.0),
        body_com_z_shift_range=(10.0, 20.0),
        body_inertia_scale_range=(100.0, 200.0),
        body_mass_scale_range=(100.0, 200.0),
    )
    ngeom, nbody, nu = model.ngeom, model.nbody, model.nu
    assert batched.geom_friction.shape == (N, ngeom, 3)
    assert batched.actuator_gainprm.shape == (N, nu, 3)
    assert batched.actuator_biasprm.shape == (N, nu, 3)
    assert batched.body_ipos.shape == (N, nbody, 3)
    assert batched.body_inertia.shape == (N, nbody, 3)
    assert batched.body_mass.shape == (N, nbody)

    assert jnp.all(batched.geom_friction[:, :, 0] >= 2.0)
    assert jnp.all(batched.geom_friction[:, :, 0] <= 10.0)
    kp = batched.actuator_gainprm[:, :, 0]
    assert jnp.all(kp >= 20.0 * 5.0) and jnp.all(kp <= 30.0 * 5.0)
    np.testing.assert_allclose(batched.actuator_biasprm[:, :, 1], -kp)
    kd = -batched.actuator_biasprm[:, :, 2]
    assert jnp.all(kd >= 40.0 * 0.1 - 1e-5) and jnp.all(kd <= 50.0 * 0.1 + 1e-5)
    assert jnp.all(batched.body_ipos[:, 1] >= model.body_ipos[1] + 10.0 - 1e-6)
    assert jnp.all(batched.body_mass[:, 1:] >= 100.0 * model.body_mass[1:] - 1e-4)

    # in_axes: exactly the six randomized leaves carry axis 0
    assert in_axes.geom_friction == 0
    assert in_axes.actuator_gainprm == 0
    assert in_axes.actuator_biasprm == 0
    assert in_axes.body_ipos == 0
    assert in_axes.body_inertia == 0
    assert in_axes.body_mass == 0
    assert in_axes.body_pos is None
    assert in_axes.geom_size is None


def test_per_env_draws_differ():
    model = load_model(None, xml_string=pupper_xml()).robot
    rng = jax.random.split(jax.random.PRNGKey(1), 4)
    batched, _ = dr.domain_randomize(model, rng)
    f = np.asarray(batched.geom_friction[:, 0, 0])
    assert len(np.unique(f)) == 4
