"""Fused env-step SoA kernel: physics + observation + rewards in ONE pallas call.

With the physics substeps fused (physics/soa.py, ~50us @4096 envs), the
remaining batched-step cost is the env layer's XLA code — obs assembly,
reward terms, contact filters, termination, carried-field updates — which
runs as many small lane-underutilized kernels plus layout changes at the
kernel boundary (docs/ROADMAP.md "Env-layer SoA"). This module re-emits
``PupperV3Env._step_core`` (reference environment.py:348-483 semantics)
in the same batch-on-lanes value algebra as the physics kernel and
appends it to the same ``pallas_call``: one kernel per batch tile now
covers kick -> latency -> 5 physics substeps -> obs -> rewards ->
termination -> resample bookkeeping.

RNG stays in XLA: every random the step consumes is drawn up front by
``PupperV3Env._draw_step_noise`` (bit-identical stream order) and enters
the kernel as plain input rows, so the parity-pinned threefry streams are
untouched.

The splice is a ``jax.custom_batching.custom_vmap`` over the whole step
core: traced per-env it falls back to the XLA implementation
(`_step_core`), under ``jax.vmap`` on a TPU backend the batch runs the
fused kernel. PUPPAX_SOA_ENV = auto (default; kernel on TPU backends) |
off | force | interpret — same protocol as PUPPAX_SOA.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from puppax.physics import soa
from puppax.physics.soa import (
    LANE,
    SUB,
    TILE_B,
    add,
    fma,
    materialize,
    mul,
    qrot,
    sub,
    vadd3,
    vcross3,
    vdot3,
    vsub3,
)

# fixed reward-term order — matches the insertion order of the rewards
# dict in PupperV3Env._step_core (reference environment.py:390-444)
REWARD_ORDER = (
    "tracking_lin_vel",
    "tracking_ang_vel",
    "tracking_orientation",
    "lin_vel_z",
    "ang_vel_xy",
    "orientation",
    "torques",
    "joint_acceleration",
    "mechanical_work",
    "action_rate",
    "stand_still",
    "stand_still_joint_velocity",
    "abduction_angle",
    "feet_air_time",
    "foot_slip",
    "termination",
    "knee_collision",
    "body_collision",
)


def _mat(x, ref):
    return materialize(x, ref)


def _lt(a, b, ref):
    """a < b as a 0/1 float mask."""
    return jnp.where(_mat(a, ref) < _mat(b, ref), 1.0, 0.0)


def _or(a, b):
    return jnp.maximum(a, b)


def _clip(x, lo, hi, ref):
    return jnp.clip(_mat(x, ref), lo, hi)


def _qconj(q):
    return [q[0], mul(-1.0, q[1]), mul(-1.0, q[2]), mul(-1.0, q[3])]


class _EnvStatic:
    """Host-side env constants digest (Python floats only — never read
    numerics off device leaves, see soa._Static docstring)."""

    def __init__(self, host: Dict[str, np.ndarray], env, s: soa._Static):
        self.default_pose = [float(x) for x in host["default_pose"]]
        self.action_scale = float(host["action_scale"])
        self.lowers = [float(x) for x in host["joint_lower_limits"]]
        self.uppers = [float(x) for x in host["joint_upper_limits"]]
        self.Da = int(len(host["latency_distribution"]))
        self.Di = int(len(host["imu_latency_distribution"]))
        self.dt = float(env._dt)
        self.foot_radius = float(env._foot_radius)
        self.use_imu = bool(env._use_imu)
        self.obs_dim = int(env.observation_dim)
        self.hist = int(env._observation_history) * self.obs_dim
        self.feet_sites = [int(i) for i in env._feet_site_id]
        self.torso_body = int(env._torso_idx)
        self.lower_leg_bodies = [int(i) for i in env._lower_leg_body_id]
        self.cos_term = float(np.cos(env._terminal_body_angle))
        self.terminal_z = float(env._terminal_body_z)
        self.early_term = int(env._early_termination_step_threshold)
        self.resample_step = int(env._resample_velocity_step)
        self.sigma = float(env._reward_config.rewards.tracking_sigma)
        self.scales = {
            k: float(env._reward_config.rewards.scales[k]) for k in REWARD_ORDER
        }
        self.desired_abduction = [float(x) for x in host["desired_abduction_angles"]]
        self.ss_thresh = float(env._stand_still_command_threshold)
        upper_geoms = set(int(g) for g in env._upper_leg_geom_ids)
        torso_geoms = set(int(g) for g in env._torso_geom_ids)
        self.knee_pairs = [
            i for i, p in enumerate(s.pairs)
            if p.geom1 in upper_geoms or p.geom2 in upper_geoms
        ]
        self.body_pairs = [
            i for i, p in enumerate(s.pairs)
            if p.geom1 in torso_geoms or p.geom2 in torso_geoms
        ]

        # privileged (critic-only) observation rows: emitted inside the
        # WRAPPED kernel only (the standard lane computes them in XLA,
        # pupper.py:298-331). The friction leaf is sourced from the
        # kernel's pair_mu[0] row = max(slide friction of pair 0's geoms).
        # Domain randomization SETS one scalar on every geom
        # (domain_randomization.py:63), making pair_mu[0] ==
        # geom_friction[0, 0] exactly; for an UNrandomized model the
        # equality must hold on the base values — otherwise the env keeps
        # the standard lane.
        # Contract: the canonical randomization_fn draws ONE friction
        # scalar per env and broadcasts it to every geom, so any pair's
        # combined mu equals geom_friction[0]; a non-uniform per-geom DR
        # would break this silently at runtime (dr_inputs detects batching
        # by rank only) — rollout.FastLane re-asserts uniformity on the
        # batched leaf in carry_from_state. A pair-less model (no contacts)
        # has no pair_mu row at all, so it keeps the standard lane.
        self.priv = bool(getattr(env, "_privileged_obs", False))
        if self.priv:
            gf = np.asarray(env.model.geom_friction)[..., 0]
            if len(s.pairs) == 0:
                self.priv = False
            else:
                p0 = s.pairs[0]
                if gf.ndim != 1 or not np.isclose(
                    max(gf[p0.geom1], gf[p0.geom2]), gf[0]
                ):
                    self.priv = False
        self.npriv = int(env.privileged_obs_size) if self.priv else 0

        # input row maps ---------------------------------------------------
        self.env_rows: Dict[str, Tuple[int, int]] = {}
        r = 0
        for name, n in (
            ("action_buffer", 12 * self.Da),
            ("imu_buffer", 6 * self.Di),
            ("command", 3),
            ("desired_z", 3),
            ("last_act", 12),
            ("last_vel", 12),
            ("feet_air_time", 4),
            ("last_contact", 4),
            ("step", 1),
            ("obs_history", self.hist),
        ):
            self.env_rows[name] = (r, n)
            r += n
        self.nenv_rows = r

        self.noise_rows: Dict[str, Tuple[int, int]] = {}
        r = 0
        for name, n in (
            ("kick", 2),
            ("act_lat", self.Da),
            ("imu_lat", self.Di),
            ("ang_vel_noise", 3),
            ("gravity_noise", 3),
            ("motor_ang_noise", 12),
            ("last_action_noise", 12),
            ("resample_cmd", 3),
            ("resample_ori", 3),
        ):
            self.noise_rows[name] = (r, n)
            r += n
        self.nnoise_rows = r

        # output row map ---------------------------------------------------
        self.out_rows: Dict[str, Tuple[int, int]] = {}
        r = 0
        for name, n in (
            ("obs_history", self.hist),
            ("reward", 1),
            ("done", 1),
            ("action_buffer", 12 * self.Da),
            ("imu_buffer", 6 * self.Di),
            ("command", 3),
            ("desired_z", 3),
            ("feet_air_time", 4),
            ("last_contact", 4),
            ("step", 1),
            ("rewards", len(REWARD_ORDER)),
            ("total_dist", 1),
        ):
            self.out_rows[name] = (r, n)
            r += n
        self.nout_rows = r


def host_consts_from_args(**kw) -> Dict[str, np.ndarray]:
    """Capture env ctor args as host numpy BEFORE jnp conversion. Returns
    None if any arg is already a device array (converting would trigger a
    device->host transfer, which permanently degrades the tunneled TPU
    process) — the env kernel is then disabled."""
    out = {}
    for k, v in kw.items():
        if isinstance(v, jax.Array):
            return None
        out[k] = np.asarray(v, np.float64)
    return out


# ---------------------------------------------------------------------------
# env-step emission (value algebra; mirrors PupperV3Env._step_core)
# ---------------------------------------------------------------------------


@soa.with_cse
def _emit_env_step(
    s: soa._Static,
    es: _EnvStatic,
    q: List,
    v: List,
    act: List,
    env: Dict[str, List],
    noi: Dict[str, List],
    dr: Dict[str, List],
    n_substeps: int,
):
    """Emit the full step core. Returns (q2, v2, fw, out) with ``out`` a
    dict following es.out_rows (values are algebra values)."""
    ref = _mat(q[0], None) if not isinstance(q[0], (int, float)) else q[0]

    # kick (environment.py:351-356)
    v = list(v)
    v[0] = add(v[0], noi["kick"][0])
    v[1] = add(v[1], noi["kick"][1])

    # action latency (environment.py:358-361): push-front + one-hot select
    Da = es.Da
    new_abuf, lag = [], []
    for j in range(12):
        cols = [act[j]] + [env["action_buffer"][j * Da + d] for d in range(Da - 1)]
        new_abuf.extend(cols)
        acc = 0.0
        for d in range(Da):
            acc = fma(acc, noi["act_lat"][d], cols[d])
        lag.append(acc)

    # motor targets (environment.py:364-365)
    ctrl = [
        _clip(
            add(es.default_pose[j], mul(lag[j], es.action_scale)),
            es.lowers[j], es.uppers[j], ref,
        )
        for j in range(12)
    ]

    # physics (environment.py:366)
    qp, vp, fw = soa._emit_substeps(s, q, v, ctrl, dr, n_substeps)
    q2, v2 = soa._emit_integrate(s, qp, vp, fw["qacc"])

    torso_q = fw["xquat"][es.torso_body]
    qc = _qconj(torso_q)
    ang_l, vel_l = soa._link_velocities(s, fw)
    torso_ang = ang_l[es.torso_body - 1]
    torso_vel = vel_l[es.torso_body - 1]

    # ---- observation (environment.py:485-543) ----
    if es.use_imu:
        local_ang = qrot(torso_ang, qc)
        grav_body = qrot([0.0, 0.0, -1.0], qc)
    else:
        local_ang = [0.0, 0.0, 0.0]
        grav_body = [0.0, 0.0, -1.0]
    ng = vadd3(grav_body, noi["gravity_noise"])
    gnorm = jnp.sqrt(_mat(vdot3(ng, ng), ref))
    ng = [ _mat(c, ref) / gnorm for c in ng ]
    na = vadd3(local_ang, noi["ang_vel_noise"])
    imu_data = list(na) + list(ng)

    Di = es.Di
    new_ibuf, lagged_imu = [], []
    for j in range(6):
        cols = [imu_data[j]] + [env["imu_buffer"][j * Di + d] for d in range(Di - 1)]
        new_ibuf.extend(cols)
        acc = 0.0
        for d in range(Di):
            acc = fma(acc, noi["imu_lat"][d], cols[d])
        lagged_imu.append(acc)

    obs36 = (
        lagged_imu
        + list(env["command"])
        + list(env["desired_z"])
        + [
            add(sub(q2[7 + j], es.default_pose[j]), noi["motor_ang_noise"][j])
            for j in range(12)
        ]
        + [add(env["last_act"][j], noi["last_action_noise"][j]) for j in range(12)]
    )
    obs36 = [_clip(o, -100.0, 100.0, ref) for o in obs36]
    obs_hist = obs36 + list(env["obs_history"][: es.hist - es.obs_dim])

    # ---- foot contact (environment.py:374-381) ----
    foot_z = [fw["sites"][sid][2] for sid in es.feet_sites]
    contact, filt_mm, filt_cm, first_contact, fat1 = [], [], [], [], []
    for i in range(4):
        fz = sub(foot_z[i], es.foot_radius)
        c = _lt(fz, 1e-3, ref)
        lc = env["last_contact"][i]
        contact.append(c)
        filt_mm.append(_or(c, _mat(lc, ref)))
        filt_cm.append(_or(_lt(fz, 3e-2, ref), _mat(lc, ref)))
        first_contact.append(
            mul(_lt(0.0, env["feet_air_time"][i], ref), filt_mm[i])
        )
        fat1.append(add(env["feet_air_time"][i], es.dt))

    # ---- termination (environment.py:383-388) ----
    rot_up = qrot([0.0, 0.0, 1.0], torso_q)
    done = _lt(rot_up[2], es.cos_term, ref)
    for j in range(12):
        done = _or(done, _lt(q2[7 + j], es.lowers[j], ref))
        done = _or(done, _lt(es.uppers[j], q2[7 + j], ref))
    done = _or(done, _lt(fw["xpos"][es.torso_body][2], es.terminal_z, ref))

    # ---- rewards (environment.py:390-444 / rewards.py) ----
    sigma = es.sigma
    cmd = env["command"]
    local_vel = qrot(torso_vel, qc)
    local_angv = qrot(torso_ang, qc)

    e_lin = add(
        mul(sub(cmd[0], local_vel[0]), sub(cmd[0], local_vel[0])),
        mul(sub(cmd[1], local_vel[1]), sub(cmd[1], local_vel[1])),
    )
    r_tracking_lin = jnp.exp(_mat(mul(e_lin, -1.0 / sigma), ref))
    e_ang = mul(sub(cmd[2], local_angv[2]), sub(cmd[2], local_angv[2]))
    r_tracking_ang = jnp.exp(_mat(mul(e_ang, -1.0 / sigma), ref))

    wz_body = qrot([0.0, 0.0, 1.0], qc)
    e_ori = 0.0
    for i in range(3):
        d = sub(wz_body[i], env["desired_z"][i])
        e_ori = add(e_ori, mul(d, d))
    r_tracking_ori = jnp.exp(_mat(mul(e_ori, -1.0 / sigma), ref))

    r_lin_vel_z = mul(torso_vel[2], torso_vel[2])
    r_ang_vel_xy = add(
        mul(torso_ang[0], torso_ang[0]), mul(torso_ang[1], torso_ang[1])
    )
    r_orientation = add(mul(rot_up[0], rot_up[0]), mul(rot_up[1], rot_up[1]))

    r_torques = 0.0
    for i in range(s.nv):
        r_torques = add(r_torques, mul(fw["qfrc_actuator"][i], fw["qfrc_actuator"][i]))

    r_joint_acc = 0.0
    inv_dt = 1.0 / es.dt
    for j in range(12):
        d = mul(sub(v2[6 + j], env["last_vel"][j]), inv_dt)
        r_joint_acc = add(r_joint_acc, mul(d, d))

    r_mech = 0.0
    for j in range(12):
        r_mech = add(
            r_mech, jnp.abs(_mat(mul(fw["qfrc_actuator"][6 + j], v2[6 + j]), ref))
        )

    r_action_rate = 0.0
    for j in range(12):
        d = sub(act[j], env["last_act"][j])
        r_action_rate = add(r_action_rate, mul(d, d))

    # command magnitude gates (math.normalize: plain L2 norm)
    cmd_norm = jnp.sqrt(_mat(vdot3(cmd, cmd), ref))

    ss_pose = 0.0
    for j in range(12):
        ss_pose = add(ss_pose, jnp.abs(_mat(sub(q2[7 + j], es.default_pose[j]), ref)))
    r_stand_still = mul(ss_pose, _lt(cmd_norm, 0.1, ref))

    ss_vel = 0.0
    for j in range(12):
        ss_vel = add(ss_vel, jnp.abs(_mat(v2[6 + j], ref)))
    r_ss_joint_vel = mul(ss_vel, _lt(cmd_norm, es.ss_thresh, ref))

    r_abduction = 0.0
    for k in range(4):
        d = sub(q2[7 + 1 + 3 * k], es.desired_abduction[k])
        r_abduction = add(r_abduction, mul(d, d))

    r_air = 0.0
    for i in range(4):
        r_air = add(r_air, mul(sub(fat1[i], 0.1), first_contact[i]))
    r_air = mul(r_air, _lt(0.05, cmd_norm, ref))

    r_slip = 0.0
    for i in range(4):
        b = es.lower_leg_bodies[i]
        off = vsub3(fw["sites"][es.feet_sites[i]], fw["xpos"][b])
        fv = vadd3(vel_l[b - 1], vcross3(ang_l[b - 1], off))
        sq = add(mul(fv[0], fv[0]), mul(fv[1], fv[1]))
        r_slip = add(r_slip, mul(sq, filt_cm[i]))

    r_term = mul(done, _lt(env["step"][0], float(es.early_term), ref))

    def _pair_count(pair_ids):
        acc = 0.0
        for p in pair_ids:
            acc = add(acc, _lt(fw["con_dist"][p], 0.0, ref))
        return acc

    r_knee = _pair_count(es.knee_pairs)
    r_body = _pair_count(es.body_pairs)

    terms = {
        "tracking_lin_vel": r_tracking_lin,
        "tracking_ang_vel": r_tracking_ang,
        "tracking_orientation": r_tracking_ori,
        "lin_vel_z": r_lin_vel_z,
        "ang_vel_xy": r_ang_vel_xy,
        "orientation": r_orientation,
        "torques": r_torques,
        "joint_acceleration": r_joint_acc,
        "mechanical_work": r_mech,
        "action_rate": r_action_rate,
        "stand_still": r_stand_still,
        "stand_still_joint_velocity": r_ss_joint_vel,
        "abduction_angle": r_abduction,
        "feet_air_time": r_air,
        "foot_slip": r_slip,
        "termination": r_term,
        "knee_collision": r_knee,
        "body_collision": r_body,
    }
    scaled = {k: mul(terms[k], es.scales[k]) for k in REWARD_ORDER}
    total = 0.0
    for k in REWARD_ORDER:
        total = add(total, scaled[k])
    reward = _clip(mul(total, es.dt), 0.0, 10000.0, ref)

    # ---- carried-field updates (environment.py:448-476) ----
    fat2 = [mul(fat1[i], sub(1.0, filt_mm[i])) for i in range(4)]
    stepc = add(env["step"][0], 1.0)
    resample = _lt(float(es.resample_step), stepc, ref)
    cmd2 = [
        jnp.where(resample > 0.5, _mat(noi["resample_cmd"][i], ref), _mat(cmd[i], ref))
        for i in range(3)
    ]
    dz2 = [
        jnp.where(
            resample > 0.5,
            _mat(noi["resample_ori"][i], ref),
            _mat(env["desired_z"][i], ref),
        )
        for i in range(3)
    ]
    stepc = jnp.where(_or(done, resample) > 0.5, 0.0, _mat(stepc, ref))

    tx = fw["xpos"][es.torso_body]
    total_dist = jnp.sqrt(_mat(vdot3(tx, tx), ref))

    out = {
        "obs_history": obs_hist,
        "reward": [reward],
        "done": [done],
        "action_buffer": new_abuf,
        "imu_buffer": new_ibuf,
        "command": cmd2,
        "desired_z": dz2,
        "feet_air_time": fat2,
        "last_contact": contact,
        "step": [stepc],
        "rewards": [scaled[k] for k in REWARD_ORDER],
        "total_dist": [total_dist],
    }

    if es.priv:
        # asymmetric-critic privileged rows (pupper.py:298-331, the same
        # POST-step quantities): true local lin/ang velocity + gravity,
        # joint velocities, this-step contact, updated feet air time,
        # this-step kick, DR leaves (friction via pair_mu[0], kp via
        # gain0[0], torso mass).
        grav_true = qrot([0.0, 0.0, -1.0], qc)
        out["privileged"] = (
            list(local_vel)
            + list(local_angv)
            + list(grav_true)
            + [v2[6 + j] for j in range(12)]
            + list(contact)
            + list(fat2)
            + list(noi["kick"])
            + [dr["pair_mu"][0], dr["gain0"][0], dr["mass"][es.torso_body]]
        )
        assert len(out["privileged"]) == es.npriv

    return q2, v2, fw, out


# ---------------------------------------------------------------------------
# kernel build + batched entry
# ---------------------------------------------------------------------------


def _build_env_kernel(s: soa._Static, es: _EnvStatic, n_substeps: int):
    def kernel(
        q_ref, v_ref, act_ref, env_ref, noi_ref, dr_ref,
        qout_ref, vout_ref, cache_ref, envout_ref,
    ):
        q = [q_ref[i] for i in range(s.nq)]
        v = [v_ref[i] for i in range(s.nv)]
        act = [act_ref[i] for i in range(s.nu)]
        env = {
            name: [env_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in es.env_rows.items()
        }
        noi = {
            name: [noi_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in es.noise_rows.items()
        }
        dr = {
            name: [dr_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in s.dr_rows.items()
        }
        ref = q[0]

        q2, v2, fw, out = _emit_env_step(s, es, q, v, act, env, noi, dr, n_substeps)

        soa._emit_caches(s, fw, cache_ref, ref)
        for i in range(s.nq):
            qout_ref[i] = materialize(q2[i], ref)
        for i in range(s.nv):
            vout_ref[i] = materialize(v2[i], ref)
        for name, (r0, n) in es.out_rows.items():
            vals = out[name]
            assert len(vals) == n, (name, len(vals), n)
            for i in range(n):
                envout_ref[r0 + i] = materialize(vals[i], ref)

    return kernel


def env_step_batched(
    s: soa._Static,
    es: _EnvStatic,
    qpos: jnp.ndarray,  # (B, nq)
    qvel: jnp.ndarray,  # (B, nv)
    action: jnp.ndarray,  # (B, 12)
    env_rows: jnp.ndarray,  # (B, nenv_rows)
    noise_rows: jnp.ndarray,  # (B, nnoise_rows)
    dr: Dict[str, jnp.ndarray],
    n_substeps: int,
    interpret: bool = False,
):
    """Run the fused env-step kernel over the batch. Returns
    (qpos', qvel', caches, env_out_rows)."""
    B = qpos.shape[0]
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    dtype = jnp.float32

    def pad(x):
        x = x.astype(dtype)
        if Bp == B:
            return x
        pad_width = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, mode="edge")

    q_t = soa._to_tiles(pad(qpos), Bp)
    v_t = soa._to_tiles(pad(qvel), Bp)
    a_t = soa._to_tiles(pad(action), Bp)
    e_t = soa._to_tiles(pad(env_rows), Bp)
    n_t = soa._to_tiles(pad(noise_rows), Bp)
    dr_parts = []
    for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
        dr_parts.append(pad(dr[name].reshape(B, n)))
    dr_t = soa._to_tiles(jnp.concatenate(dr_parts, axis=1), Bp)

    nb = Bp // TILE_B
    kernel = _build_env_kernel(s, es, n_substeps)

    def spec(rows):
        return pl.BlockSpec(
            (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    qout, vout, cache, envout = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            spec(s.nq), spec(s.nv), spec(s.nu),
            spec(es.nenv_rows), spec(es.nnoise_rows), spec(s.ndr),
        ],
        out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache), spec(es.nout_rows)],
        out_shape=[
            jax.ShapeDtypeStruct((s.nq, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((s.nv, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((s.ncache, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((es.nout_rows, Bp // LANE, LANE), dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_t, v_t, a_t, e_t, n_t, dr_t)

    qpos2 = soa._from_tiles(qout, Bp)[:B]
    qvel2 = soa._from_tiles(vout, Bp)[:B]
    cache_b = soa._from_tiles(cache, Bp)[:B]
    caches = {
        name: cache_b[:, r0 : r0 + n] for name, (r0, n) in s.cache_rows.items()
    }
    env_b = soa._from_tiles(envout, Bp)[:B]
    return qpos2, qvel2, caches, env_b


def _flatten_env_in(es: _EnvStatic, env_in: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """(B, *) env_in dict -> (B, nenv_rows) in es.env_rows order."""
    B = env_in["command"].shape[0]
    parts = []
    for name, (r0, n) in sorted(es.env_rows.items(), key=lambda kv: kv[1][0]):
        x = env_in[name]
        parts.append(x.astype(jnp.float32).reshape(B, n))
    return jnp.concatenate(parts, axis=1)


def _flatten_noise(es: _EnvStatic, noise: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    B = noise["kick"].shape[0]
    parts = []
    for name, (r0, n) in sorted(es.noise_rows.items(), key=lambda kv: kv[1][0]):
        parts.append(noise[name].astype(jnp.float32).reshape(B, n))
    return jnp.concatenate(parts, axis=1)


def make_batched_core(env, base_model, mj_model, n_substeps, host_consts):
    """custom_vmap over PupperV3Env._step_core's tuple form.

    Single-env trace: the XLA implementation (which itself splices the
    physics-only kernel when vmapped). Batched on a TPU backend with
    PUPPAX_SOA_ENV != off: the fused env-step kernel.
    """
    supported = soa.soa_supported(base_model) and host_consts is not None
    s = soa._Static(base_model, mj_model) if supported else None
    es = _EnvStatic(host_consts, env, s) if supported else None

    def _single(model, qpos, qvel, action, env_in, noise):
        ps, env_out = env._step_core(model, qpos, qvel, action, env_in, noise)
        ptuple = (
            ps.qpos, ps.qvel, ps.qacc, ps.x_pos, ps.x_rot, ps.xd_vel,
            ps.xd_ang, ps.xpos, ps.site_xpos, ps.qfrc_actuator,
            ps.contact.dist, ps.contact.pos,
        )
        return ptuple, env_out

    core = jax.custom_batching.custom_vmap(_single)

    @core.def_vmap
    def _vmap_rule(axis_size, in_batched, model, qpos, qvel, action, env_in, noise):
        mode = os.environ.get("PUPPAX_SOA_ENV", "auto")
        backend = jax.default_backend()
        use_kernel = (
            supported
            and mode != "off"
            and qpos.dtype == jnp.float32
            and (mode in ("force", "interpret") or backend in ("tpu", "axon"))
        )
        if not use_kernel:
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, tuple(in_batched)
            )
            out = jax.vmap(_single, in_axes=in_axes, axis_size=axis_size)(
                model, qpos, qvel, action, env_in, noise
            )
            return out, jax.tree_util.tree_map(lambda _: True, out)

        B = axis_size
        dr = soa.dr_inputs(model, s, B)
        env_rows = _flatten_env_in(es, env_in)
        noise_rows = _flatten_noise(es, noise)
        qpos2, qvel2, caches, env_b = env_step_batched(
            s, es, qpos, qvel, action, env_rows, noise_rows, dr, n_substeps,
            interpret=(mode == "interpret"),
        )
        nbody, nsite, npair = base_model.nbody, base_model.nsite, s.npair
        ptuple = (
            qpos2,
            qvel2,
            caches["qacc"],
            caches["xpos"].reshape(B, nbody, 3)[:, 1:],
            caches["xquat"].reshape(B, nbody - 1, 4),
            caches["xd_vel"].reshape(B, nbody - 1, 3),
            caches["xd_ang"].reshape(B, nbody - 1, 3),
            caches["xpos"].reshape(B, nbody, 3),
            caches["site_xpos"].reshape(B, nsite, 3),
            caches["qfrc_actuator"],
            caches["con_dist"],
            caches["con_pos"].reshape(B, npair, 3),
        )

        def rows(name):
            r0, n = es.out_rows[name]
            return env_b[:, r0 : r0 + n]

        env_out = {
            "obs": rows("obs_history"),
            "reward": rows("reward")[:, 0],
            "done": rows("done")[:, 0],
            "action_buffer": rows("action_buffer").reshape(B, 12, es.Da),
            "imu_buffer": rows("imu_buffer").reshape(B, 6, es.Di),
            "command": rows("command"),
            "desired_z": rows("desired_z"),
            "feet_air_time": rows("feet_air_time"),
            "last_contact": rows("last_contact") > 0.5,
            "step": rows("step")[:, 0].astype(jnp.int32),
            "rewards": {
                k: rows("rewards")[:, i] for i, k in enumerate(REWARD_ORDER)
            },
            "total_dist": rows("total_dist")[:, 0],
        }
        out = (ptuple, env_out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    core._s = s  # exposed for the emitter-parity tests
    core._es = es
    return core


# ---------------------------------------------------------------------------
# wrapped-lane kernel: env step + episode bookkeeping + auto-reset fused
# (consumed by puppax/env/rollout.py — the tiles-resident rollout fast lane)
# ---------------------------------------------------------------------------

# aux output rows: per-step training signals (everything the PPO rollout
# consumes that is not part of the carried env state)
AUX_ROWS = ("reward", "done", "truncation", "rewards", "total_dist")


def aux_row_map(es: _EnvStatic) -> Dict[str, Tuple[int, int]]:
    """Row map for the wrapped kernel's aux output block."""
    out: Dict[str, Tuple[int, int]] = {}
    r = 0
    names = [
        ("reward", 1),
        ("done", 1),
        ("truncation", 1),
        ("rewards", len(REWARD_ORDER)),
        ("total_dist", 1),
    ]
    if es.priv:
        names.append(("privileged", es.npriv))
    for name, n in names:
        out[name] = (r, n)
        r += n
    return out


def _sel(mask, a, b, ref):
    """where(mask > 0.5, a, b) over algebra values."""
    return jnp.where(_mat(mask, ref) > 0.5, _mat(a, ref), _mat(b, ref))


@soa.with_cse
def _emit_wrapped_step(
    s: soa._Static,
    es: _EnvStatic,
    q: List,
    v: List,
    act: List,
    env: Dict[str, List],
    noi: Dict[str, List],
    dr: Dict[str, List],
    first_q: List,
    first_v: List,
    first_obs: List,
    first_priv: List,
    steps,
    prev_done,
    n_substeps: int,
    episode_length: int,
):
    """Emit one WRAPPED env step: the step core plus the Episode/AutoReset
    wrapper algebra (puppax/env/wrappers.py:56-166 semantics, brax order):

      steps_in = where(prev_done, 0, steps)          # AutoReset prologue
      ...env step core (kick/latency/physics/obs/rewards/termination)...
      steps2  = steps_in + 1                          # EpisodeWrapper
      done2   = env_done OR steps2 >= episode_length
      trunc   = (steps2 >= L) * (1 - env_done)
      q/v/obs = where(done2, first_*, new)            # AutoReset restore

    Returns (q_out, v_out, env_out_rows_in_INPUT_order, steps2, done2, aux)
    so the env-state block round-trips through the kernel unchanged in
    layout — the scan carry needs no per-step row shuffling.
    """
    ref = _mat(q[0], None) if not isinstance(q[0], (int, float)) else q[0]

    steps_in = _sel(prev_done, 0.0, steps, ref)

    q2, v2, fw, out = _emit_env_step(s, es, q, v, act, env, noi, dr, n_substeps)
    env_done = out["done"][0]

    steps2 = add(steps_in, 1.0)
    # steps2 >= L  (steps are exact small integers in f32)
    trunc_flag = _lt(float(episode_length) - 0.5, steps2, ref)
    done2 = _or(_mat(env_done, ref), trunc_flag)
    truncation = mul(trunc_flag, sub(1.0, env_done))

    q_out = [_sel(done2, first_q[i], q2[i], ref) for i in range(s.nq)]
    v_out = [_sel(done2, first_v[i], v2[i], ref) for i in range(s.nv)]
    obs_out = [
        _sel(done2, first_obs[i], out["obs_history"][i], ref)
        for i in range(es.hist)
    ]

    # env-state output in env_rows INPUT order (the rollout carry layout).
    # last_act/last_vel are updated here because the fast lane has no
    # XLA-side step() epilogue (pupper.py:729-731): last_act is the raw
    # action, last_vel the PRE-restore joint velocity — both exactly the
    # standard lane's values (the wrapper only restores qpos/qvel/obs).
    env_out: Dict[str, List] = {
        "action_buffer": out["action_buffer"],
        "imu_buffer": out["imu_buffer"],
        "command": out["command"],
        "desired_z": out["desired_z"],
        "last_act": list(act),
        "last_vel": [v2[6 + j] for j in range(12)],
        "feet_air_time": out["feet_air_time"],
        "last_contact": out["last_contact"],
        "step": out["step"],
        "obs_history": obs_out,
    }

    aux = {
        "reward": out["reward"],
        "done": [done2],
        "truncation": [truncation],
        "rewards": out["rewards"],
        "total_dist": out["total_dist"],
    }
    if es.priv:
        # AutoResetWrapper restores privileged_obs from the reset-time
        # value on the effective done (wrappers.py:159-165)
        aux["privileged"] = [
            _sel(done2, first_priv[i], out["privileged"][i], ref)
            for i in range(es.npriv)
        ]
    return q_out, v_out, env_out, steps2, done2, aux


def _build_wrapped_kernel(
    s: soa._Static, es: _EnvStatic, n_substeps: int, episode_length: int
):
    """Kernel: (q, v, act, env, noise, dr, first, wrap) ->
    (q', v', env', wrap', aux). No physics-cache emission — the training
    rollout consumes only the carried state and the aux rows."""
    nfirst = s.nq + s.nv + es.hist + es.npriv
    aux_rows = aux_row_map(es)
    naux = sum(n for _, n in aux_rows.values())

    def kernel(
        q_ref, v_ref, act_ref, env_ref, noi_ref, dr_ref, first_ref, wrap_ref,
        qout_ref, vout_ref, envout_ref, wrapout_ref, auxout_ref,
    ):
        q = [q_ref[i] for i in range(s.nq)]
        v = [v_ref[i] for i in range(s.nv)]
        act = [act_ref[i] for i in range(s.nu)]
        env = {
            name: [env_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in es.env_rows.items()
        }
        noi = {
            name: [noi_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in es.noise_rows.items()
        }
        dr = {
            name: [dr_ref[r0 + i] for i in range(n)]
            for name, (r0, n) in s.dr_rows.items()
        }
        first_q = [first_ref[i] for i in range(s.nq)]
        first_v = [first_ref[s.nq + i] for i in range(s.nv)]
        first_obs = [first_ref[s.nq + s.nv + i] for i in range(es.hist)]
        first_priv = [
            first_ref[s.nq + s.nv + es.hist + i] for i in range(es.npriv)
        ]
        steps = wrap_ref[0]
        prev_done = wrap_ref[1]
        ref = q[0]

        q_out, v_out, env_out, steps2, done2, aux = _emit_wrapped_step(
            s, es, q, v, act, env, noi, dr, first_q, first_v, first_obs,
            first_priv, steps, prev_done, n_substeps, episode_length,
        )

        for i in range(s.nq):
            qout_ref[i] = materialize(q_out[i], ref)
        for i in range(s.nv):
            vout_ref[i] = materialize(v_out[i], ref)
        for name, (r0, n) in es.env_rows.items():
            vals = env_out[name]
            assert len(vals) == n, (name, len(vals), n)
            for i in range(n):
                envout_ref[r0 + i] = materialize(vals[i], ref)
        wrapout_ref[0] = materialize(steps2, ref)
        wrapout_ref[1] = materialize(done2, ref)
        for name, (r0, n) in aux_rows.items():
            vals = aux[name]
            assert len(vals) == n, (name, len(vals), n)
            for i in range(n):
                auxout_ref[r0 + i] = materialize(vals[i], ref)

    kernel._nfirst = nfirst
    kernel._naux = naux
    return kernel


def wrapped_step_rows_xla(
    s: soa._Static,
    es: _EnvStatic,
    n_substeps: int,
    episode_length: int,
    q_t, v_t, act_t, env_t, noi_t, dr_t, first_t, wrap_t,
):
    """Pure-XLA evaluation of the wrapped-step emission on flat (Bp,)
    batch values — the SAME program `_build_wrapped_kernel` lowers to
    pallas, run as ordinary XLA ops (the value algebra is shape-agnostic).
    Used as the fast lane's non-TPU execution mode and as the CPU test
    oracle for the kernel path (tests/test_rollout.py)."""
    shape = q_t.shape  # (rows, Bp/LANE, LANE) or (rows, B)
    Bp = int(np.prod(shape[1:]))

    def rows(x):
        return [x[i].reshape(Bp) for i in range(x.shape[0])]

    q, v, act = rows(q_t), rows(v_t), rows(act_t)
    env_r, noi_r, dr_r, first_r = rows(env_t), rows(noi_t), rows(dr_t), rows(first_t)
    env = {
        name: [env_r[r0 + i] for i in range(n)]
        for name, (r0, n) in es.env_rows.items()
    }
    noi = {
        name: [noi_r[r0 + i] for i in range(n)]
        for name, (r0, n) in es.noise_rows.items()
    }
    dr = {
        name: [dr_r[r0 + i] for i in range(n)]
        for name, (r0, n) in s.dr_rows.items()
    }
    first_q = first_r[: s.nq]
    first_v = first_r[s.nq : s.nq + s.nv]
    first_obs = first_r[s.nq + s.nv : s.nq + s.nv + es.hist]
    first_priv = first_r[s.nq + s.nv + es.hist :]
    wrap_r = rows(wrap_t)
    ref = q[0]

    q_out, v_out, env_out, steps2, done2, aux = _emit_wrapped_step(
        s, es, q, v, act, env, noi, dr, first_q, first_v, first_obs,
        first_priv, wrap_r[0], wrap_r[1], n_substeps, episode_length,
    )

    def stack(vals):
        return jnp.stack(
            [materialize(x, ref) for x in vals]
        ).reshape((len(vals),) + shape[1:])

    aux_rows = aux_row_map(es)
    env_flat = []
    for name, (r0, n) in sorted(es.env_rows.items(), key=lambda kv: kv[1][0]):
        env_flat.extend(env_out[name])
    aux_flat = []
    for name, (r0, n) in sorted(aux_rows.items(), key=lambda kv: kv[1][0]):
        aux_flat.extend(aux[name])
    return (
        stack(q_out), stack(v_out), stack(env_flat),
        stack([steps2, done2]), stack(aux_flat),
    )


def wrapped_step_tiles(
    s: soa._Static,
    es: _EnvStatic,
    kernel,
    q_t: jnp.ndarray,  # (nq, Bp/LANE, LANE)
    v_t: jnp.ndarray,
    act_t: jnp.ndarray,  # (nu, Bp/LANE, LANE)
    env_t: jnp.ndarray,  # (nenv_rows, Bp/LANE, LANE)
    noi_t: jnp.ndarray,  # (nnoise_rows, Bp/LANE, LANE)
    dr_t: jnp.ndarray,  # (ndr, Bp/LANE, LANE)
    first_t: jnp.ndarray,  # (nq+nv+hist, Bp/LANE, LANE)
    wrap_t: jnp.ndarray,  # (2, Bp/LANE, LANE)
    interpret: bool = False,
):
    """One wrapped env step on already-tiled rows. All inputs/outputs stay
    in the (rows, B/LANE, LANE) tile layout — zero relayouts per step."""
    Bp = q_t.shape[1] * LANE
    nb = Bp // TILE_B
    dtype = jnp.float32

    def spec(rows):
        return pl.BlockSpec(
            (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    def shape(rows):
        return jax.ShapeDtypeStruct((rows, Bp // LANE, LANE), dtype)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            spec(s.nq), spec(s.nv), spec(s.nu), spec(es.nenv_rows),
            spec(es.nnoise_rows), spec(s.ndr), spec(kernel._nfirst), spec(2),
        ],
        out_specs=[
            spec(s.nq), spec(s.nv), spec(es.nenv_rows), spec(2),
            spec(kernel._naux),
        ],
        out_shape=[
            shape(s.nq), shape(s.nv), shape(es.nenv_rows), shape(2),
            shape(kernel._naux),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_t, v_t, act_t, env_t, noi_t, dr_t, first_t, wrap_t)
