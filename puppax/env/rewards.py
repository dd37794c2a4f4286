"""Reward term library: 16 stateless functions over the physics state.

Behavioral parity with /root/reference/pupperv3_mjx/rewards.py (the full
term set listed in SURVEY §2 C2). Terms operate on our ``PhysicsState``
surface (x_rot/x_pos/xd_vel/xd_ang with the world body dropped, plus
site_xpos/xpos/qfrc_actuator/contact), replacing the reference's brax
Transform/Motion structures. The geom-collision term is vectorized over
the fixed-size contact buffer instead of Python-unrolling per geom id
(reference rewards.py:131-138) — same result, one fused reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from puppax.ops import math
from puppax.physics.pipeline import PhysicsState


def reward_lin_vel_z(ps: PhysicsState) -> jax.Array:
    """Penalize z-axis base linear velocity (rewards.py:9-11)."""
    return jnp.square(ps.xd_vel[0, 2])


def reward_ang_vel_xy(ps: PhysicsState) -> jax.Array:
    """Penalize xy-axes base angular velocity (rewards.py:14-16)."""
    return jnp.sum(jnp.square(ps.xd_ang[0, :2]))


def reward_tracking_orientation(
    desired_world_z_in_body_frame: jax.Array, ps: PhysicsState, tracking_sigma: float
) -> jax.Array:
    """Track desired body orientation (rewards.py:19-26)."""
    world_z = jnp.array([0.0, 0.0, 1.0])
    world_z_in_body_frame = math.rotate(world_z, math.quat_inv(ps.x_rot[0]))
    error = jnp.sum(jnp.square(world_z_in_body_frame - desired_world_z_in_body_frame))
    return jnp.exp(-error / tracking_sigma)


def reward_orientation(ps: PhysicsState) -> jax.Array:
    """Penalize non-flat base orientation (rewards.py:29-33)."""
    up = jnp.array([0.0, 0.0, 1.0])
    rot_up = math.rotate(up, ps.x_rot[0])
    return jnp.sum(jnp.square(rot_up[:2]))


def reward_torques(torques: jax.Array) -> jax.Array:
    """L2 torque penalty (rewards.py:36-41, LeggedGym-style sum of squares)."""
    return jnp.sum(jnp.square(torques))


def reward_joint_acceleration(
    joint_vel: jax.Array, last_joint_vel: jax.Array, dt: float
) -> jax.Array:
    """Finite-difference joint acceleration penalty (rewards.py:44-45)."""
    return jnp.sum(jnp.square((joint_vel - last_joint_vel) / dt))


def reward_mechanical_work(torques: jax.Array, velocities: jax.Array) -> jax.Array:
    """L1 mechanical work penalty (rewards.py:48-50)."""
    return jnp.sum(jnp.abs(torques * velocities))


def reward_action_rate(act: jax.Array, last_act: jax.Array) -> jax.Array:
    """Penalize action changes (rewards.py:53-55)."""
    return jnp.sum(jnp.square(act - last_act))


def reward_tracking_lin_vel(
    commands: jax.Array, ps: PhysicsState, tracking_sigma
) -> jax.Array:
    """Track commanded xy linear velocity in the body frame (rewards.py:58-63)."""
    local_vel = math.rotate(ps.xd_vel[0], math.quat_inv(ps.x_rot[0]))
    lin_vel_error = jnp.sum(jnp.square(commands[:2] - local_vel[:2]))
    return jnp.exp(-lin_vel_error / tracking_sigma)


def reward_tracking_ang_vel(
    commands: jax.Array, ps: PhysicsState, tracking_sigma
) -> jax.Array:
    """Track commanded yaw rate in the body frame (rewards.py:66-70)."""
    base_ang_vel = math.rotate(ps.xd_ang[0], math.quat_inv(ps.x_rot[0]))
    ang_vel_error = jnp.square(commands[2] - base_ang_vel[2])
    return jnp.exp(-ang_vel_error / tracking_sigma)


def reward_feet_air_time(
    air_time: jax.Array,
    first_contact: jax.Array,
    commands: jax.Array,
    minimum_airtime: float = 0.1,
) -> jax.Array:
    """Reward swing time above the minimum at touch-down; gated off for
    near-zero commands (rewards.py:73-82)."""
    rew_air_time = jnp.sum((air_time - minimum_airtime) * first_contact)
    rew_air_time *= math.normalize(commands[:3])[1] > 0.05
    return rew_air_time


def reward_abduction_angle(
    joint_angles: jax.Array, desired_abduction_angles: jax.Array = None
) -> jax.Array:
    """Penalize abduction joints away from desired (rewards.py:85-87)."""
    if desired_abduction_angles is None:
        desired_abduction_angles = jnp.zeros(4)
    return jnp.sum(jnp.square(joint_angles[1::3] - desired_abduction_angles))


def reward_stand_still(
    commands: jax.Array,
    joint_angles: jax.Array,
    default_pose: jax.Array,
    command_threshold: float,
) -> jax.Array:
    """Penalize motion when the command is near zero (rewards.py:90-106)."""
    return jnp.sum(jnp.abs(joint_angles - default_pose)) * (
        math.normalize(commands[:3])[1] < command_threshold
    )


def reward_foot_slip(
    ps: PhysicsState,
    contact_filt: jax.Array,
    feet_site_id: np.ndarray,
    lower_leg_body_id: np.ndarray,
) -> jax.Array:
    """Penalize tangential foot velocity while in contact (rewards.py:109-124).

    Foot velocity via rigid-body transport from the lower-leg link:
    v_foot = v_link + omega_link x (p_foot - p_link), with link indices in
    the world-dropped x/xd arrays (lower_leg_body_id - 1, the brax frame
    convention noted in SURVEY §7 hard-parts #3).
    """
    pos = ps.site_xpos[feet_site_id]  # feet positions (4, 3)
    feet_offset = pos - ps.xpos[lower_leg_body_id]
    foot_indices = lower_leg_body_id - 1  # world body dropped in x/xd
    ang = ps.xd_ang[foot_indices]
    vel = ps.xd_vel[foot_indices]
    foot_vel = vel + jnp.cross(ang, feet_offset)
    return jnp.sum(jnp.square(foot_vel[:, :2]) * contact_filt.reshape((-1, 1)))


def reward_termination(done: jax.Array, step: jax.Array, step_threshold: int) -> jax.Array:
    """Penalize early termination (rewards.py:127-128)."""
    return done & (step < step_threshold)


def reward_geom_collision(ps: PhysicsState, geom_ids: np.ndarray) -> jax.Array:
    """Count active contacts touching any of ``geom_ids`` (rewards.py:131-138).

    Vectorized membership test over the fixed-size contact buffer; padded
    rows have dist > 0 and never count.
    """
    ids = jnp.asarray(geom_ids).reshape(-1, 1)
    hit = (ps.contact.geom1[None, :] == ids) | (ps.contact.geom2[None, :] == ids)
    return jnp.sum(hit * (ps.contact.dist[None, :] < 0.0), dtype=jnp.float32).astype(
        ps.contact.dist.dtype
    )
