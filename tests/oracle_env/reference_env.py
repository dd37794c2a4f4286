"""LITERAL TRANSCRIPTION of the reference PupperV3 environment, driving the
MuJoCo C engine — the independent parity oracle.

This module is deliberately NOT original code: it is a reviewed line-level
transcription of
  /root/reference/pupperv3_mjx/environment.py:314-543 (reset/step/_get_obs),
  /root/reference/pupperv3_mjx/rewards.py            (the 18 reward terms),
  /root/reference/pupperv3_mjx/utils.py:19-69        (latency buffers),
  /root/reference/pupperv3_mjx/domain_randomization.py:115-210 (qpos rand),
plus the small pieces of brax it calls:
  brax.math rotate/quat_inv/euler_to_quat/normalize,
  brax.base Transform.create(pos).vmap().do(Motion)  (velocity transport),
  brax.mjx.pipeline's x/xd reconstruction from MuJoCo Data
  (x = (xpos, xquat)[1:], cvel re-referenced from the subtree COM to the
  body frame origin).

The physics itself is ``mujoco.mj_step`` (the C engine) — NOT puppax — so a
trajectory produced here is an external replay of the reference semantics:
brax's mjx pipeline is a JAX re-implementation of exactly this C engine
step (MJX solves with warmstart disabled, hence mjDSBL_WARMSTART below).
It must share no code with puppax/: do not import puppax here.

RNG parity: every jax.random call below copies the reference's split order,
shapes, and distribution arguments verbatim, so under the same PRNGKey the
oracle and puppax draw bit-identical streams; the only divergence channel
left is physics floating-point noise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import mujoco
import numpy as np
from jax import numpy as jp

# ---------------------------------------------------------------------------
# brax.math transcriptions (brax 0.12.1 brax/math.py)
# ---------------------------------------------------------------------------


def rotate(vec, quat):
    """Rotate vec by quat (brax.math.rotate)."""
    if len(vec.shape) != 1:
        raise ValueError("vec must have no batch dimensions.")
    s, u = quat[0], quat[1:]
    r = 2 * (jp.dot(u, vec) * u) + (s * s - jp.dot(u, u)) * vec
    r = r + 2 * s * jp.cross(u, vec)
    return r


def quat_inv(q):
    """Unit-quaternion inverse (brax.math.quat_inv)."""
    return q * jp.array([1, -1, -1, -1])


def normalize(x, axis=None):
    """Return (normalized x, norm) with safe zero handling
    (brax.math.normalize / safe_norm value semantics)."""
    norm = jp.linalg.norm(x, axis=axis)
    n = x / (norm + 1e-6 * (norm == 0.0))
    return n, norm


def euler_to_quat(v):
    """Euler (degrees, intrinsic x-y'-z'') -> quaternion
    (brax.math.euler_to_quat)."""
    c1, c2, c3 = jp.cos(v * jp.pi / 360)
    s1, s2, s3 = jp.sin(v * jp.pi / 360)
    w = c1 * c2 * c3 - s1 * s2 * s3
    x = s1 * c2 * c3 + c1 * s2 * s3
    y = c1 * s2 * c3 - s1 * c2 * s3
    z = c1 * c2 * s3 + s1 * s2 * c3
    return jp.array([w, x, y, z])


def transform_motion_vel(t_pos, m_vel, m_ang):
    """brax base.Transform.create(pos=t_pos).do(Motion(vel, ang)).vel with
    identity rotation: vel' = vel - t_pos x ang (per-row)."""
    return m_vel - jp.cross(t_pos, m_ang)


# ---------------------------------------------------------------------------
# pupperv3_mjx.utils transcriptions (utils.py:19-69)
# ---------------------------------------------------------------------------


def circular_buffer_push_front(buffer, new_value):
    buffer = jp.roll(buffer, shift=1, axis=1)
    return buffer.at[:, 0].set(new_value)


def sample_lagged_value(rng, buffer_newest_first, new_value, distribution):
    buffer_newest_first = circular_buffer_push_front(buffer_newest_first, new_value)
    return (
        jax.random.choice(rng, buffer_newest_first, axis=1, p=distribution),
        buffer_newest_first,
    )


# ---------------------------------------------------------------------------
# pupperv3_mjx.domain_randomization transcriptions (:115-210)
# ---------------------------------------------------------------------------


@dataclass
class StartPositionRandomization:
    x_min: float
    x_max: float
    y_min: float
    y_max: float
    z_min: float
    z_max: float


def random_z_rotation_quaternion(rng):
    yaw = jax.random.uniform(rng, (1,), minval=-jp.pi, maxval=jp.pi)
    cos_yaw = jp.cos(yaw / 2)
    sin_yaw = jp.sin(yaw / 2)
    return jp.concatenate((cos_yaw, jp.zeros(2), sin_yaw))


def randomize_qpos(qpos, start_position_config, rng):
    rng, key_pos, key_yaw = jax.random.split(rng, 3)
    qpos = qpos.at[:3].set(
        jax.random.uniform(
            key_pos,
            shape=(3,),
            minval=jp.array(
                (
                    start_position_config.x_min,
                    start_position_config.y_min,
                    start_position_config.z_min,
                )
            ),
            maxval=jp.array(
                (
                    start_position_config.x_max,
                    start_position_config.y_max,
                    start_position_config.z_max,
                )
            ),
        )
    )
    random_yaw_quat = random_z_rotation_quaternion(key_yaw)
    qpos = qpos.at[3:7].set(random_yaw_quat)
    return qpos


# ---------------------------------------------------------------------------
# brax mjx pipeline-state reconstruction from MuJoCo C Data
# ---------------------------------------------------------------------------


@dataclass
class PipelineData:
    """The slice of the brax pipeline state the env/rewards consume,
    reconstructed from mujoco.MjData after mj_step (whose derived caches
    lag the final integration by one substep, exactly like mjx.step)."""

    q: jp.ndarray
    qd: jp.ndarray
    x_pos: jp.ndarray  # (nbody-1, 3) world body dropped
    x_rot: jp.ndarray  # (nbody-1, 4)
    xd_vel: jp.ndarray  # (nbody-1, 3)
    xd_ang: jp.ndarray  # (nbody-1, 3)
    xpos: jp.ndarray  # (nbody, 3) incl. world row
    site_xpos: jp.ndarray
    qfrc_actuator: jp.ndarray
    contact_geom1: np.ndarray
    contact_geom2: np.ndarray
    contact_dist: np.ndarray

    # aliases used by the transcribed env body
    @property
    def qpos(self):
        return self.q

    @property
    def qvel(self):
        return self.qd


def extract_pipeline_data(model: mujoco.MjModel, data: mujoco.MjData) -> PipelineData:
    # brax/mjx/pipeline.py: x = Transform(pos=xpos[1:], rot=xquat[1:]);
    # cvel is at the subtree COM of each body's kinematic root, re-referenced
    # to the body frame origin: offset = xpos - subtree_com[body_rootid]
    cvel = np.array(data.cvel)
    offset = np.array(data.xpos) - np.array(data.subtree_com)[model.body_rootid]
    ang = cvel[:, :3]
    vel = cvel[:, 3:] - np.cross(offset, ang)
    ncon = data.ncon
    geom = np.array(data.contact.geom[:ncon]).reshape(ncon, 2)
    return PipelineData(
        q=jp.array(data.qpos.copy()),
        qd=jp.array(data.qvel.copy()),
        x_pos=jp.array(data.xpos[1:].copy()),
        x_rot=jp.array(data.xquat[1:].copy()),
        xd_vel=jp.array(vel[1:]),
        xd_ang=jp.array(ang[1:]),
        xpos=jp.array(data.xpos.copy()),
        site_xpos=jp.array(data.site_xpos.copy()),
        qfrc_actuator=jp.array(data.qfrc_actuator.copy()),
        contact_geom1=geom[:, 0],
        contact_geom2=geom[:, 1],
        contact_dist=np.array(data.contact.dist[:ncon].copy()),
    )


# ---------------------------------------------------------------------------
# pupperv3_mjx.rewards transcriptions (rewards.py:9-138)
# ---------------------------------------------------------------------------


def reward_lin_vel_z(ps: PipelineData):
    return jp.square(ps.xd_vel[0, 2])


def reward_ang_vel_xy(ps: PipelineData):
    return jp.sum(jp.square(ps.xd_ang[0, :2]))


def reward_tracking_orientation(desired_world_z_in_body_frame, ps, tracking_sigma):
    world_z = jp.array([0.0, 0.0, 1.0])
    world_z_in_body_frame = rotate(world_z, quat_inv(ps.x_rot[0]))
    error = jp.sum(jp.square(world_z_in_body_frame - desired_world_z_in_body_frame))
    return jp.exp(-error / tracking_sigma)


def reward_orientation(ps: PipelineData):
    up = jp.array([0.0, 0.0, 1.0])
    rot_up = rotate(up, ps.x_rot[0])
    return jp.sum(jp.square(rot_up[:2]))


def reward_torques(torques):
    return jp.sum(jp.square(torques))


def reward_joint_acceleration(joint_vel, last_joint_vel, dt):
    return jp.sum(jp.square((joint_vel - last_joint_vel) / dt))


def reward_mechanical_work(torques, velocities):
    return jp.sum(jp.abs(torques * velocities))


def reward_action_rate(act, last_act):
    return jp.sum(jp.square(act - last_act))


def reward_tracking_lin_vel(commands, ps, tracking_sigma):
    local_vel = rotate(ps.xd_vel[0], quat_inv(ps.x_rot[0]))
    lin_vel_error = jp.sum(jp.square(commands[:2] - local_vel[:2]))
    return jp.exp(-lin_vel_error / tracking_sigma)


def reward_tracking_ang_vel(commands, ps, tracking_sigma):
    base_ang_vel = rotate(ps.xd_ang[0], quat_inv(ps.x_rot[0]))
    ang_vel_error = jp.square(commands[2] - base_ang_vel[2])
    return jp.exp(-ang_vel_error / tracking_sigma)


def reward_feet_air_time(air_time, first_contact, commands, minimum_airtime=0.1):
    rew_air_time = jp.sum((air_time - minimum_airtime) * first_contact)
    rew_air_time *= normalize(commands[:3])[1] > 0.05
    return rew_air_time


def reward_abduction_angle(joint_angles, desired_abduction_angles):
    return jp.sum(jp.square(joint_angles[1::3] - desired_abduction_angles))


def reward_stand_still(commands, joint_angles, default_pose, command_threshold):
    return jp.sum(jp.abs(joint_angles - default_pose)) * (
        normalize(commands[:3])[1] < command_threshold
    )


def reward_foot_slip(ps: PipelineData, contact_filt, feet_site_id, lower_leg_body_id):
    pos = ps.site_xpos[feet_site_id]
    feet_offset = pos - ps.xpos[lower_leg_body_id]
    foot_indices = lower_leg_body_id - 1  # we got rid of the world body
    foot_vel = transform_motion_vel(
        feet_offset, ps.xd_vel[foot_indices], ps.xd_ang[foot_indices]
    )
    return jp.sum(jp.square(foot_vel[:, :2]) * contact_filt.reshape((-1, 1)))


def reward_termination(done, step, step_threshold):
    return done & (step < step_threshold)


def reward_geom_collision(ps: PipelineData, geom_ids):
    contact = jp.array(0.0)
    for id_ in geom_ids:
        contact += jp.sum(
            ((ps.contact_geom1 == id_) | (ps.contact_geom2 == id_))
            * (ps.contact_dist < 0.0)
        )
    return contact


# ---------------------------------------------------------------------------
# the environment transcription (environment.py:32-543)
# ---------------------------------------------------------------------------


def body_name_to_geom_ids(mj_model, body_name):
    body = mj_model.body(body_name)
    return body.geomadr + np.arange(np.squeeze(body.geomnum))


def body_names_to_geom_ids(mj_model, body_names):
    return np.concatenate([body_name_to_geom_ids(mj_model, n) for n in body_names])


def body_names_to_body_ids(mj_model, body_names):
    ids = [
        mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY.value, n)
        for n in body_names
    ]
    assert not any(i == -1 for i in ids), "Body not found."
    return np.array(ids)


class ReferencePupperEnv:
    """The reference env, transcribed, on the MuJoCo C engine.

    State is a plain dict {pipeline (PipelineData), qpos, qvel, obs, reward,
    done, info} mirroring brax State; physics advances an internal MjData.
    """

    def __init__(
        self,
        reward_config,
        action_scale: float,
        observation_history: int,
        path: str = None,
        xml_string: str = None,
        joint_lower_limits: List = None,
        joint_upper_limits: List = None,
        dof_damping: float = 0.25,
        position_control_kp: float = 5.0,
        start_position_config: StartPositionRandomization = None,
        resample_velocity_step: int = 500,
        linear_velocity_x_range: Tuple[float, float] = (-0.75, 0.75),
        linear_velocity_y_range: Tuple[float, float] = (-0.5, 0.5),
        angular_velocity_range: Tuple[float, float] = (-2.0, 2.0),
        zero_command_probability: float = 0.01,
        stand_still_command_threshold: float = 0.1,
        maximum_pitch_command: float = 0.0,
        maximum_roll_command: float = 0.0,
        angular_velocity_noise: float = 0.3,
        gravity_noise: float = 0.1,
        motor_angle_noise: float = 0.1,
        last_action_noise: float = 0.01,
        kick_vel: float = 0.2,
        kick_probability: float = 0.02,
        terminal_body_z: float = 0.1,
        early_termination_step_threshold: int = 500,
        terminal_body_angle: float = 0.52,
        foot_radius: float = 0.02,
        environment_timestep: float = 0.02,
        physics_timestep: float = 0.004,
        latency_distribution=None,
        imu_latency_distribution=None,
        use_imu: bool = True,
    ):
        if joint_lower_limits is None:
            joint_lower_limits = [
                -1.220, -0.420, -2.790, -2.510, -3.140, -0.710,
                -1.220, -0.420, -2.790, -2.510, -3.140, -0.710,
            ]
        if joint_upper_limits is None:
            joint_upper_limits = [
                2.510, 3.140, 0.710, 1.220, 0.420, 2.790,
                2.510, 3.140, 0.710, 1.220, 0.420, 2.790,
            ]
        if start_position_config is None:
            start_position_config = StartPositionRandomization(
                x_min=-2.0, x_max=2.0, y_min=-2.0, y_max=2.0, z_min=0.15, z_max=0.20
            )
        if latency_distribution is None:
            latency_distribution = jp.array([0.2, 0.8])
        if imu_latency_distribution is None:
            imu_latency_distribution = jp.array([0.5, 0.5])

        if xml_string is not None:
            mj_model = mujoco.MjModel.from_xml_string(xml_string)
        else:
            mj_model = mujoco.MjModel.from_xml_path(path)
        mj_model.opt.timestep = physics_timestep
        # MJX runs the Newton solver without warmstart; the C engine
        # warmstarts by default — disable for engine-parity
        mj_model.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_WARMSTART
        # actuator override (environment.py:170-174)
        mj_model.actuator_gainprm[:, 0] = position_control_kp
        mj_model.actuator_biasprm[:, 1] = -position_control_kp
        mj_model.actuator_biasprm[:, 2] = -dof_damping

        default_pose = jp.array(
            [0.26, 0.0, -0.52, -0.26, 0.0, 0.52, 0.26, 0.0, -0.52, -0.26, 0.0, 0.52]
        )
        # override the default joint angles with default_pose (:176-177)
        mj_model.keyframe("home").qpos[7:] = np.asarray(default_pose)

        self.mj_model = mj_model
        self._data = mujoco.MjData(mj_model)
        self._dt = environment_timestep
        self._n_frames = int(environment_timestep // physics_timestep)

        self._reward_config = reward_config
        self._torso_geom_ids = body_name_to_geom_ids(mj_model, "base_link")
        self._torso_idx = mujoco.mj_name2id(
            mj_model, mujoco.mjtObj.mjOBJ_BODY.value, "base_link"
        )
        self._action_scale = jp.array(action_scale)
        self._angular_velocity_noise = angular_velocity_noise
        self._gravity_noise = gravity_noise
        self._motor_angle_noise = motor_angle_noise
        self._last_action_noise = last_action_noise
        self._kick_vel = kick_vel
        self._init_q = jp.array(mj_model.keyframe("home").qpos)
        self._default_pose = default_pose
        self._desired_abduction_angles = jp.array([0.0, 0.0, 0.0, 0.0])
        # the reference stores plain lists (brax-era jax coerced them);
        # jax 0.9 jp.clip requires arrays — value-identical
        self.lowers = jp.array(joint_lower_limits)
        self.uppers = jp.array(joint_upper_limits)
        feet_site = [
            "leg_front_r_3_foot_site",
            "leg_front_l_3_foot_site",
            "leg_back_r_3_foot_site",
            "leg_back_l_3_foot_site",
        ]
        self._feet_site_id = np.array(
            [
                mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SITE.value, f)
                for f in feet_site
            ]
        )
        self._lower_leg_body_id = body_names_to_body_ids(
            mj_model, ["leg_front_r_3", "leg_front_l_3", "leg_back_r_3", "leg_back_l_3"]
        )
        self._upper_leg_geom_ids = body_names_to_geom_ids(
            mj_model, ["leg_front_r_2", "leg_front_l_2", "leg_back_r_2", "leg_back_l_2"]
        )
        self._foot_radius = foot_radius
        self._nv = mj_model.nv
        self._start_position_config = start_position_config
        self._linear_velocity_x_range = linear_velocity_x_range
        self._linear_velocity_y_range = linear_velocity_y_range
        self._angular_velocity_range = angular_velocity_range
        self._zero_command_probability = zero_command_probability
        self._stand_still_command_threshold = stand_still_command_threshold
        self._maximum_pitch_command = maximum_pitch_command
        self._maximum_roll_command = maximum_roll_command
        self._kick_probability = kick_probability
        self._resample_velocity_step = resample_velocity_step
        self.observation_dim = 36
        self._observation_history = observation_history
        self._early_termination_step_threshold = early_termination_step_threshold
        self._terminal_body_z = terminal_body_z
        self._terminal_body_angle = terminal_body_angle
        self._desired_world_z_in_body_frame = jp.array([0.0, 0.0, 1.0])
        self._latency_distribution = latency_distribution
        self._imu_latency_distribution = imu_latency_distribution
        self._use_imu = use_imu

    @property
    def dt(self):
        return self._dt

    # -- transcribed samplers (environment.py:246-312) ----------------------
    def sample_command(self, rng):
        lin_vel_x = self._linear_velocity_x_range
        lin_vel_y = self._linear_velocity_y_range
        ang_vel_yaw = self._angular_velocity_range

        rng, key1, key2, key3, key4, key5 = jax.random.split(rng, 6)
        lin_vel_x = jax.random.uniform(
            key1, (1,), minval=lin_vel_x[0], maxval=lin_vel_x[1]
        )
        lin_vel_y = jax.random.uniform(
            key2, (1,), minval=lin_vel_y[0], maxval=lin_vel_y[1]
        )
        ang_vel_yaw = jax.random.uniform(
            key3, (1,), minval=ang_vel_yaw[0], maxval=ang_vel_yaw[1]
        )
        new_cmd = jp.array([lin_vel_x[0], lin_vel_y[0], ang_vel_yaw[0]])

        zero_cmd_prob = jax.random.uniform(key4, (1,))
        noisy_near_zero_command = jax.random.uniform(
            key5,
            (3,),
            minval=-self._stand_still_command_threshold,
            maxval=self._stand_still_command_threshold,
        )
        new_cmd = jp.where(
            zero_cmd_prob < self._zero_command_probability,
            noisy_near_zero_command,
            new_cmd,
        )
        return new_cmd

    def sample_body_orientation(self, rng):
        rng, key_pitch, key_roll = jax.random.split(rng, 3)
        pitch = (
            jax.random.uniform(key_pitch, (1,), minval=-1, maxval=1.0)
            * self._maximum_pitch_command
        )
        roll = (
            jax.random.uniform(key_roll, (1,), minval=-1, maxval=1.0)
            * self._maximum_roll_command
        )
        euler_rotation = euler_to_quat(jp.array([roll[0], pitch[0], 0.0]))
        return rotate(self._desired_world_z_in_body_frame, euler_rotation)

    def initial_action_buffer(self):
        return jp.zeros((12, self._latency_distribution.shape[0]), dtype=float)

    def initial_imu_buffer(self):
        buf = jp.zeros((6, self._imu_latency_distribution.shape[0]), dtype=float)
        buf = buf.at[5, :].set(-1.0)
        return buf

    # -- physics via the C engine ------------------------------------------
    def _pipeline_init(self, init_q, qvel):
        d = self._data
        mujoco.mj_resetData(self.mj_model, d)
        d.qpos[:] = np.asarray(init_q)
        d.qvel[:] = np.asarray(qvel)
        mujoco.mj_forward(self.mj_model, d)
        return extract_pipeline_data(self.mj_model, d)

    def _pipeline_step(self, qpos, qvel, motor_targets):
        d = self._data
        d.qpos[:] = np.asarray(qpos)
        d.qvel[:] = np.asarray(qvel)
        d.ctrl[:] = np.asarray(motor_targets)
        for _ in range(self._n_frames):
            mujoco.mj_step(self.mj_model, d)
        return extract_pipeline_data(self.mj_model, d)

    # -- transcribed reset/step/_get_obs (environment.py:314-543) -----------
    def reset(self, rng) -> Dict:
        rng, sample_command_key, sample_orientation_key, randomize_pos_key = (
            jax.random.split(rng, 4)
        )

        init_q = randomize_qpos(
            self._init_q, self._start_position_config, rng=randomize_pos_key
        )
        pipeline_state = self._pipeline_init(init_q, jp.zeros(self._nv))

        state_info = {
            "rng": rng,
            "last_act": jp.zeros(12, dtype=float),
            "action_buffer": self.initial_action_buffer(),
            "imu_buffer": self.initial_imu_buffer(),
            "last_vel": jp.zeros(12, dtype=float),
            "command": self.sample_command(sample_command_key),
            "last_contact": jp.zeros(4, dtype=bool),
            "feet_air_time": jp.zeros(4, dtype=float),
            "rewards": {k: 0.0 for k in self._reward_config.rewards.scales.keys()},
            "kick": jp.array([0.0, 0.0]),
            "step": 0,
            "desired_world_z_in_body_frame": self.sample_body_orientation(
                sample_orientation_key
            ),
        }

        obs_history = jp.zeros(self._observation_history * self.observation_dim,
                               dtype=float)
        obs = self._get_obs(pipeline_state, state_info, obs_history)
        return {
            "pipeline": pipeline_state,
            "obs": obs,
            "reward": 0.0,
            "done": 0.0,
            "info": state_info,
        }

    def step(self, state: Dict, action) -> Dict:
        info = state["info"]
        info["rng"], cmd_rng, kick_noise_2, kick_bernoulli, latency_key = (
            jax.random.split(info["rng"], 5)
        )

        kick = (
            jax.random.uniform(kick_noise_2, shape=(2,), minval=-1.0, maxval=1.0)
            * self._kick_vel
        )
        kick *= jax.random.bernoulli(
            kick_bernoulli, p=self._kick_probability, shape=(1,)
        )
        qvel = state["pipeline"].qvel
        qvel = qvel.at[:2].set(kick + qvel[:2])

        lagged_action, info["action_buffer"] = sample_lagged_value(
            latency_key, info["action_buffer"], action, self._latency_distribution
        )

        motor_targets = self._default_pose + lagged_action * self._action_scale
        motor_targets = jp.clip(motor_targets, self.lowers, self.uppers)
        pipeline_state = self._pipeline_step(
            state["pipeline"].qpos, qvel, motor_targets
        )

        obs = self._get_obs(pipeline_state, info, state["obs"])
        joint_angles = pipeline_state.q[7:]
        joint_vel = pipeline_state.qd[6:]

        foot_pos = pipeline_state.site_xpos[self._feet_site_id]
        foot_contact_z = foot_pos[:, 2] - self._foot_radius
        contact = foot_contact_z < 1e-3
        contact_filt_mm = contact | info["last_contact"]
        contact_filt_cm = (foot_contact_z < 3e-2) | info["last_contact"]
        first_contact = (info["feet_air_time"] > 0) * contact_filt_mm
        info["feet_air_time"] += self.dt

        up = jp.array([0.0, 0.0, 1.0])
        done = jp.dot(
            rotate(up, pipeline_state.x_rot[self._torso_idx - 1]), up
        ) < np.cos(self._terminal_body_angle)
        done |= jp.any(joint_angles < jp.array(self.lowers))
        done |= jp.any(joint_angles > jp.array(self.uppers))
        done |= pipeline_state.x_pos[self._torso_idx - 1, 2] < self._terminal_body_z

        sigma = self._reward_config.rewards.tracking_sigma
        rewards_dict = {
            "tracking_lin_vel": reward_tracking_lin_vel(
                info["command"], pipeline_state, tracking_sigma=sigma
            ),
            "tracking_ang_vel": reward_tracking_ang_vel(
                info["command"], pipeline_state, tracking_sigma=sigma
            ),
            "tracking_orientation": reward_tracking_orientation(
                info["desired_world_z_in_body_frame"], pipeline_state,
                tracking_sigma=sigma,
            ),
            "lin_vel_z": reward_lin_vel_z(pipeline_state),
            "ang_vel_xy": reward_ang_vel_xy(pipeline_state),
            "orientation": reward_orientation(pipeline_state),
            "torques": reward_torques(pipeline_state.qfrc_actuator),
            "joint_acceleration": reward_joint_acceleration(
                joint_vel, info["last_vel"], dt=self._dt
            ),
            "mechanical_work": reward_mechanical_work(
                pipeline_state.qfrc_actuator[6:], pipeline_state.qvel[6:]
            ),
            "action_rate": reward_action_rate(action, info["last_act"]),
            "stand_still": reward_stand_still(
                info["command"], joint_angles, self._default_pose, 0.1
            ),
            "stand_still_joint_velocity": reward_stand_still(
                info["command"], joint_vel, jp.zeros(12),
                self._stand_still_command_threshold,
            ),
            "abduction_angle": reward_abduction_angle(
                joint_angles,
                desired_abduction_angles=self._desired_abduction_angles,
            ),
            "feet_air_time": reward_feet_air_time(
                info["feet_air_time"], first_contact, info["command"]
            ),
            "foot_slip": reward_foot_slip(
                pipeline_state, contact_filt_cm,
                feet_site_id=self._feet_site_id,
                lower_leg_body_id=self._lower_leg_body_id,
            ),
            "termination": reward_termination(
                done, info["step"],
                step_threshold=self._early_termination_step_threshold,
            ),
            "knee_collision": reward_geom_collision(
                pipeline_state, self._upper_leg_geom_ids
            ),
            "body_collision": reward_geom_collision(
                pipeline_state, self._torso_geom_ids
            ),
        }
        rewards_dict = {
            k: v * self._reward_config.rewards.scales[k]
            for k, v in rewards_dict.items()
        }
        reward = jp.clip(sum(rewards_dict.values()) * self.dt, 0.0, 10000.0)

        info["kick"] = kick
        info["last_act"] = action
        info["last_vel"] = joint_vel
        info["feet_air_time"] *= ~contact_filt_mm
        info["last_contact"] = contact
        info["rewards"] = rewards_dict
        info["step"] += 1

        info["command"] = jp.where(
            info["step"] > self._resample_velocity_step,
            self.sample_command(cmd_rng),
            info["command"],
        )
        info["desired_world_z_in_body_frame"] = jp.where(
            info["step"] > self._resample_velocity_step,
            self.sample_body_orientation(cmd_rng),
            info["desired_world_z_in_body_frame"],
        )
        info["step"] = jp.where(
            done | (info["step"] > self._resample_velocity_step), 0, info["step"]
        )

        return {
            "pipeline": pipeline_state,
            "obs": obs,
            "reward": reward,
            "done": jp.float32(done) if not jax.config.x64_enabled else jp.float64(done),
            "info": info,
        }

    def _get_obs(self, pipeline_state: PipelineData, state_info, obs_history):
        if self._use_imu:
            inv_torso_rot = quat_inv(pipeline_state.x_rot[0])
            local_body_angular_velocity = rotate(
                pipeline_state.xd_ang[0], inv_torso_rot
            )
        else:
            inv_torso_rot = jp.array([1, 0, 0, 0])
            local_body_angular_velocity = jp.zeros(3)

        (
            state_info["rng"],
            ang_key,
            gravity_key,
            motor_angle_key,
            last_action_key,
            imu_sample_key,
        ) = jax.random.split(state_info["rng"], 6)

        ang_vel_noise = (
            jax.random.uniform(ang_key, (3,), minval=-1, maxval=1)
            * self._angular_velocity_noise
        )
        gravity_noise = (
            jax.random.uniform(gravity_key, (3,), minval=-1, maxval=1)
            * self._gravity_noise
        )
        motor_ang_noise = (
            jax.random.uniform(motor_angle_key, (12,), minval=-1, maxval=1)
            * self._motor_angle_noise
        )
        last_action_noise = (
            jax.random.uniform(last_action_key, (12,), minval=-1, maxval=1)
            * self._last_action_noise
        )

        noised_gravity = rotate(jp.array([0, 0, -1]), inv_torso_rot) + gravity_noise
        noised_gravity = noised_gravity / jp.linalg.norm(noised_gravity)
        noised_ang_vel = local_body_angular_velocity + ang_vel_noise
        noised_imu_data = jp.concatenate([noised_ang_vel, noised_gravity])

        lagged_imu_data, state_info["imu_buffer"] = sample_lagged_value(
            imu_sample_key,
            state_info["imu_buffer"],
            noised_imu_data,
            self._imu_latency_distribution,
        )

        obs = jp.concatenate(
            [
                lagged_imu_data,
                state_info["command"],
                state_info["desired_world_z_in_body_frame"],
                pipeline_state.q[7:] - self._default_pose + motor_ang_noise,
                state_info["last_act"] + last_action_noise,
            ]
        )
        assert self.observation_dim == obs.shape[0]
        obs = jp.clip(obs, -100.0, 100.0)
        new_obs_history = jp.roll(obs_history, obs.size).at[: obs.size].set(obs)
        return new_obs_history
