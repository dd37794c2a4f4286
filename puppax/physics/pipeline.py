"""Fused physics pipeline: init / step over the RobotModel pytree.

TPU-native replacement for the brax mjx pipeline the reference env calls
(``self.pipeline_init`` /root/reference/pupperv3_mjx/environment.py:319 and
``self.pipeline_step`` /root/reference/pupperv3_mjx/environment.py:366).

``pipeline_step`` runs ``n_substeps`` forward+integrate passes (the
reference runs 5: env dt 0.02 / physics dt 0.004, environment.py:166,179).
Matching MJX/MuJoCo step semantics, the returned state carries
post-integration qpos/qvel while every position/velocity-derived cache
(x, xd, site_xpos, contacts, qfrc_actuator) is from the final forward pass
— i.e. lags integration by one substep, exactly like mjx.step's Data.

The whole step is one jit region of small dense batched linear algebra;
``jax.vmap`` over the leading env axis turns it into (B, ...) kernels that
XLA tiles across MXU/VPU; sharding the env axis over a mesh scales it to a
pod slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from puppax.model.mjcf import RobotModel
from puppax.ops import linalg
from puppax.physics import collision, constraint, integrate, smooth, solver


@struct.dataclass
class PhysicsState:
    """Per-env physics state pytree (the env layer's 'pipeline state').

    Field surface mirrors what the reference env/rewards consume from the
    brax mjx pipeline state (SURVEY §1 L2): q/qd aliases, x (per-link world
    transforms, world body dropped => torso at index torso_idx-1), xd
    (per-link world-frame velocities), site_xpos, xpos (with world row),
    qfrc_actuator, and the contact set (geom1/geom2/dist).
    """

    qpos: jnp.ndarray  # (nq,)
    qvel: jnp.ndarray  # (nv,)
    qacc: jnp.ndarray  # (nv,)
    x_pos: jnp.ndarray  # (nbody-1, 3) link positions (world dropped)
    x_rot: jnp.ndarray  # (nbody-1, 4) link quaternions
    xd_vel: jnp.ndarray  # (nbody-1, 3) link linear velocity (world frame)
    xd_ang: jnp.ndarray  # (nbody-1, 3) link angular velocity (world frame)
    xpos: jnp.ndarray  # (nbody, 3) body positions incl. world row
    site_xpos: jnp.ndarray  # (nsite, 3)
    qfrc_actuator: jnp.ndarray  # (nv,)
    contact: collision.Contacts

    # --- reference-compatible aliases (brax State field names) ---
    @property
    def q(self) -> jnp.ndarray:
        return self.qpos

    @property
    def qd(self) -> jnp.ndarray:
        return self.qvel


def forward(m: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray, ctrl):
    """One full forward-dynamics pass; returns (qacc, caches).

    The whole pass runs under matmul precision 'highest': TPU MXU matmuls
    default to bf16 operand rounding, which corrupts the mass matrix /
    constraint Jacobians enough to NaN the Newton solve within a few env
    steps (MJX documents the same requirement).
    """
    with jax.default_matmul_precision("highest"):
        kin = smooth.kinematics(m, qpos)
        com = smooth.com_pos(m, kin)
        vel = smooth.com_vel(m, com, qvel)
        qM = smooth.crb(m, com)
        qfrc_bias = smooth.rne(m, com, vel, qvel)
        qfrc_passive = smooth.passive(m, qvel)
        qfrc_actuator = smooth.actuation(m, qpos, qvel, ctrl)
        qfrc_smooth = qfrc_passive + qfrc_actuator - qfrc_bias

        # unrolled small-SPD solve (ops/linalg): ~4x faster than XLA's
        # generic batched Cholesky on TPU for these tiny systems
        qacc_smooth = linalg.spd_solve(qM, qfrc_smooth)

        contacts = collision.collide(m, kin)
        efc = constraint.make_efc(m, com, qpos, qvel, contacts)
        res = solver.solve(m, qM, qacc_smooth, efc)
        return res.qacc, (kin, com, vel, contacts, qfrc_actuator)


def _make_state(m, qpos, qvel, qacc, caches) -> PhysicsState:
    kin, com, vel, contacts, qfrc_actuator = caches
    # world-frame per-link velocities from com-referenced spatial velocities:
    # v_origin = cvel_lin + cvel_ang x (xpos - subtree_com[root])
    from puppax.ops.select import take_rows

    offset = kin.xpos - take_rows(com.subtree_com, m.body_rootid)
    ang = vel.cvel[:, :3]
    lin = vel.cvel[:, 3:] + jnp.cross(ang, offset)
    # reporting surface: the full uncapped per-pair contact set (MuJoCo C
    # semantics, matching the independent oracle replay); the solver used
    # the capped `contacts` internally (MJX dynamics semantics)
    del contacts
    report = collision.collide_pairs(m, kin)
    return PhysicsState(
        qpos=qpos,
        qvel=qvel,
        qacc=qacc,
        x_pos=kin.xpos[1:],
        x_rot=kin.xquat[1:],
        xd_vel=lin[1:],
        xd_ang=ang[1:],
        xpos=kin.xpos,
        site_xpos=kin.site_xpos,
        qfrc_actuator=qfrc_actuator,
        contact=report,
    )


def pipeline_init(m: RobotModel, qpos: jnp.ndarray, qvel: jnp.ndarray) -> PhysicsState:
    """Initialize state with a forward pass (mjx.forward semantics)."""
    ctrl = jnp.zeros(m.nu, qpos.dtype)
    qacc, caches = forward(m, qpos, qvel, ctrl)
    return _make_state(m, qpos, qvel, qacc, caches)


def pipeline_step(
    m: RobotModel, state: PhysicsState, ctrl: jnp.ndarray, n_substeps: int = 5
) -> PhysicsState:
    """Advance n_substeps physics steps under constant ctrl (one env step).

    The substep loop is a ``lax.scan`` so the (large) forward-dynamics body
    is traced/compiled once regardless of substep count; XLA still fuses
    within each body and the env-batch axis carries the parallelism.
    """

    def substep(carry, _):
        qpos, qvel = carry
        qacc, caches = forward(m, qpos, qvel, ctrl)
        qpos_new, qvel_new = integrate.euler(m, qpos, qvel, qacc)
        return (qpos_new, qvel_new), (qacc, caches)

    (qpos, qvel), (qaccs, caches) = jax.lax.scan(
        substep, (state.qpos, state.qvel), (), length=n_substeps
    )
    # keep the caches of the LAST substep (mjx.step semantics: kinematic
    # caches lag integration by one substep)
    last = jax.tree_util.tree_map(lambda x: x[-1], (qaccs, caches))
    qacc, caches = last
    return _make_state(m, qpos, qvel, qacc, caches)


# ---------------------------------------------------------------------------
# batched step with the SoA pallas kernel (custom_vmap splice)
# ---------------------------------------------------------------------------


def _zeros_state(m: RobotModel, qpos, qvel) -> PhysicsState:
    """Minimal PhysicsState carrier: pipeline_step only reads qpos/qvel."""
    z = jnp.zeros
    dt = qpos.dtype
    return PhysicsState(
        qpos=qpos, qvel=qvel, qacc=z(m.nv, dt),
        x_pos=z((m.nbody - 1, 3), dt), x_rot=z((m.nbody - 1, 4), dt),
        xd_vel=z((m.nbody - 1, 3), dt), xd_ang=z((m.nbody - 1, 3), dt),
        xpos=z((m.nbody, 3), dt), site_xpos=z((m.nsite, 3), dt),
        qfrc_actuator=z(m.nv, dt), contact=None,
    )


def make_batched_step(base_model: RobotModel, n_substeps: int, mj_model=None):
    """Build ``step(model, qpos, qvel, ctrl) -> tuple`` with a custom vmap
    rule: traced per-env it is the XLA pipeline; under ``jax.vmap`` on a TPU
    backend the whole batch is handled by ONE fused SoA pallas kernel
    (puppax.physics.soa) instead of hundreds of small XLA kernels.

    Control: env var PUPPAX_SOA = auto (default; kernel on TPU backends) |
    off (always XLA) | force (kernel everywhere, compiled) | interpret
    (kernel in pallas interpret mode — CPU testing).

    The returned tuple is (qpos, qvel, qacc, x_pos, x_rot, xd_vel, xd_ang,
    xpos, site_xpos, qfrc_actuator, con_dist, con_pos); contact metadata
    (frames/solref/...) is static per pair for the supported model class
    and is re-attached by the caller.
    """
    import os

    from puppax.physics import soa

    supported = soa.soa_supported(base_model)
    # mj_model: host-side numerics source — building the digest off device
    # arrays does a D2H transfer, which permanently degrades the tunneled
    # TPU's dispatch latency (see soa._Static docstring)
    s = soa._Static(base_model, mj_model) if supported else None

    def _single(model, qpos, qvel, ctrl):
        out = pipeline_step(
            model, _zeros_state(model, qpos, qvel), ctrl, n_substeps=n_substeps
        )
        return (
            out.qpos, out.qvel, out.qacc, out.x_pos, out.x_rot,
            out.xd_vel, out.xd_ang, out.xpos, out.site_xpos,
            out.qfrc_actuator, out.contact.dist, out.contact.pos,
        )

    step = jax.custom_batching.custom_vmap(_single)

    @step.def_vmap
    def _vmap_rule(axis_size, in_batched, model, qpos, qvel, ctrl):
        mode = os.environ.get("PUPPAX_SOA", "auto")
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
                model, qpos, qvel, ctrl
            )
            return out, jax.tree_util.tree_map(lambda _: True, out)

        B = axis_size
        dr = soa.dr_inputs(model, s, B)
        qpos2, qvel2, caches = soa.step_batched(
            s, qpos, qvel, ctrl, dr, n_substeps,
            interpret=(mode == "interpret"),
        )
        nbody, nsite, npair = base_model.nbody, base_model.nsite, s.npair
        out = (
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
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return step


def pair_contact_statics(base_model: RobotModel, mj_model=None):
    """Static per-pair Contacts metadata for the SoA-supported model class
    (plane frames are constants); used to re-attach full Contacts around
    the make_batched_step tuple."""
    from puppax.physics import soa

    s = soa._Static(base_model, mj_model)
    frames = np.stack(
        [
            np.stack([p.plane_n, p.frame_t1, p.frame_t2]).astype(np.float32)
            for p in s.pairs
        ]
    )
    return dict(
        frame=jnp.asarray(frames),
        solref=jnp.asarray(
            np.stack([p.solref for p in s.pairs]).astype(np.float32)
        ),
        solimp=jnp.asarray(
            np.stack([p.solimp for p in s.pairs]).astype(np.float32)
        ),
        invweight=jnp.asarray(
            np.asarray([p.invweight for p in s.pairs], np.float32)
        ),
        geom1=jnp.asarray([p.geom1 for p in s.pairs], jnp.int32),
        geom2=jnp.asarray([p.geom2 for p in s.pairs], jnp.int32),
        body1=jnp.asarray([p.body1 for p in s.pairs], jnp.int32),
        body2=jnp.asarray([p.body2 for p in s.pairs], jnp.int32),
        pair_geoms=[(p.geom1, p.geom2) for p in s.pairs],
    )
