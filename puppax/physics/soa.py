"""Structure-of-arrays fused physics substep — one Pallas TPU kernel.

The round-1 XLA path runs each substep as ~hundreds of small fused kernels
whose launch/fusion-boundary overhead dominates (docs/ROADMAP.md: neither
HBM- nor FLOP-bound at 651k env-steps/s). This module is the batch-on-lanes
rewrite that roadmap calls for: every physics scalar becomes an
(8, 128)-tile over the env batch, the whole ``pipeline_step`` (all
n_substeps forward+integrate passes) becomes ONE ``pallas_call`` per batch
tile, and every intermediate lives in VMEM/registers. No MXU is used at
all — the model is tiny, so the entire program is straight-line VPU
arithmetic unrolled over the static body tree.

Same math as the XLA path (smooth.py / collision.py / constraint.py /
solver.py / integrate.py — the MuJoCo computation model the reference ran
via mjx.step, /root/reference/pupperv3_mjx/environment.py:366), with a
mini constant-folding layer: static model parameters are Python floats
folded at trace time, so identity quaternions, zero offsets and one-hot
Jacobian rows vanish from the emitted program.

Design notes:
  * the qacc_smooth solve uses a fill-in-free sparse LDL^T in reverse dof
    order (MuJoCo mj_factorM ordering) over the kinematic-tree pattern of
    M — ~400 multiplies instead of a dense 18^3/3 Cholesky. The Newton
    Hessian factors on the dense lower pattern (sphere-sphere contact rows
    couple two legs, breaking tree sparsity), like MuJoCo C's dense
    constraint-Hessian Cholesky.
  * contacts are evaluated for ALL candidate pairs (plane-sphere and
    sphere-sphere) with no top-k caps; rows for separated pairs are masked
    via D=0. This is the MuJoCo C semantics; the XLA path applies the
    reference's MJX max_geom_pairs/max_contact_points caps, so the two
    paths agree exactly whenever at most max_geom_pairs pairs of one type
    penetrate at once (true for all oracle-verified gaits —
    tests/test_soa.py). Sphere-sphere Jacobians exploit exact base-dof
    cancellation (J2 - J1 shares the point and root COM), leaving 6-dof
    rows.
  * the line search finds the same exact root of the piecewise-linear
    phi' as solver.py, but via bracketed bisection + final secant
    (~36 O(nefc) evaluations) instead of the O(nefc^2) every-breakpoint
    sweep; row quantities are stacked into (nefc, 8, 128) arrays and the
    loops are fori_loops, keeping the emitted program small.

Supported model class: free+hinge tree with plane-sphere (static plane),
sphere-sphere, world-static sphere-box (obstacle terrain), world-static
heightfield-sphere (rough terrain, grids up to MAX_HFIELD_CELLS),
plane-capsule (two end rows, capsule-aligned friction frames),
sphere-capsule and capsule-capsule contacts — all three training
configurations plus capsule-legged robot variants. ``soa_supported(m)``
gates; unsupported models (dynamic boxes/planes, giant hfield grids,
multi-tree scenes) fall back to the vmapped XLA path.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from puppax.model.mjcf import JNT_FREE, JNT_HINGE, RobotModel

# Batch-tile geometry: each algebra value is a (SUB, LANE) block covering
# TILE_B envs. SUB=8 matches the f32 vreg sublane count; PUPPAX_SUB widens
# the tile (16/32) so each Mosaic op covers more envs — a perf experiment
# knob for the op-issue-bound emission (read ONCE at import; everything
# downstream derives from these constants).
import os as _os

SUB = int(_os.environ.get("PUPPAX_SUB", "8"))
if SUB not in (8, 16, 32):
    raise ValueError(
        f"PUPPAX_SUB={SUB} is not a supported tile width: must be 8, 16 or "
        "32 (a multiple of the f32 vreg sublane count; other values "
        "mis-size every (SUB, LANE) block and surface as obscure Mosaic "
        "tiling failures)"
    )
LANE = 128
TILE_B = SUB * LANE

_MINVAL = 1e-15
_BIG = 1e12
_PAD_DIST = 1e10  # collision._PAD_DIST: outside-extent hfield contacts

# largest unrolled heightfield grid (the masked bilinear lookup emits
# ~2*nrow*ncol vector FMAs per foot per substep; 32x32 is the terrain
# default and costs ~2k ops per foot-substep)
MAX_HFIELD_CELLS = 4096

# perf-bisection hook (dev only): truncate the emitted program after a
# named phase, padding outputs with already-computed values
PHASE_LIMIT = None

# Line-search trip counts (the Illinois regula-falsi in _emit_newton).
# Each iteration is one dphi sweep over every one-sided constraint row —
# ~20% of the substep body's vector work at the defaults — so these are
# first-order perf knobs. The roofline entry (docs/ROADMAP.md r5) and the
# CPU oracle suite bound how low they can go; PUPPAX_LS_* override for
# A/B experiments.
LS_EXPAND_ITERS = int(_os.environ.get("PUPPAX_LS_EXPAND", "12"))
LS_ILLINOIS_ITERS = int(_os.environ.get("PUPPAX_LS_ILLINOIS", "24"))


# ---------------------------------------------------------------------------
# value algebra with constant folding
# values are either Python floats (trace-time constants) or (SUB, LANE) tiles
# ---------------------------------------------------------------------------


def _c(x) -> bool:
    return isinstance(x, (int, float))


# --- trace-time CSE (hash-consing) -----------------------------------------
# Inside a ``cse_scope`` the algebra memoizes every emitted op on the
# IDENTITY of its operands: re-emitting the same (op, a, b) returns the
# first result instead of a duplicate equation. Bit-identical numerics
# (the reused value IS the original computation); the win is real op-count
# reduction in the Mosaic program — the r4 fma probe showed Mosaic does no
# mul+add peephole and the census measured ~43k eqs with heavy repetition
# across the quaternion/spatial chains (VERDICT r5 item 1). The memo keeps
# strong references to operands so id() values cannot be recycled while
# they serve as keys. NESTED trace contexts (the substep fori_loop body)
# must push their own scope: a memo entry whose result is an inner-trace
# tracer would otherwise leak into the outer trace.
_CSE_MEMO = None
# PUPPAX_CSE=off: emit without hash-consing (the pre-r5 program) — the
# A/B switch for measuring the op-count reduction on-chip
_CSE_ENABLED = _os.environ.get("PUPPAX_CSE", "on") != "off"


class cse_scope:
    """Context manager activating hash-consing for emissions inside it.

    Default (``fresh=False``): JOIN the active scope when one exists so
    nested emitters share one memo (cross-phase CSE), creating a memo only
    at the outermost entry. ``fresh=True``: always push a new memo — used
    at TRACE boundaries (the substep fori_loop body), where a memo entry
    whose result is an inner-trace tracer must not leak outward."""

    def __init__(self, fresh: bool = False):
        self._fresh = fresh

    def __enter__(self):
        global _CSE_MEMO
        self._prev = _CSE_MEMO
        if not _CSE_ENABLED:
            return self
        if self._fresh or _CSE_MEMO is None:
            _CSE_MEMO = {}
        return self

    def __exit__(self, *exc):
        global _CSE_MEMO
        _CSE_MEMO = self._prev
        return False


def with_cse(fn):
    """Decorator: run ``fn`` inside a (joining) cse_scope."""

    def wrapped(*args, **kwargs):
        with cse_scope():
            return fn(*args, **kwargs)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


def _ckey(x):
    return ("c", x) if _c(x) else ("t", id(x))


def _cse2(op: str, a, b, emit):
    memo = _CSE_MEMO
    if memo is None:
        return emit()
    ka, kb = _ckey(a), _ckey(b)
    if op in ("add", "mul") and kb < ka:  # commutative: canonical order
        ka, kb = kb, ka
    key = (op, ka, kb)
    hit = memo.get(key)
    if hit is not None:
        return hit[2]
    res = emit()
    memo[key] = (a, b, res)
    return res


def add(a, b):
    if _c(a) and _c(b):
        return a + b
    if _c(a) and a == 0.0:
        return b
    if _c(b) and b == 0.0:
        return a
    return _cse2("add", a, b, lambda: a + b)


def sub(a, b):
    if _c(a) and _c(b):
        return a - b
    if _c(b) and b == 0.0:
        return a
    if _c(a) and a == 0.0:
        return neg(b)
    return _cse2("sub", a, b, lambda: a - b)


def neg(a):
    if _c(a):
        return -a
    return _cse2("neg", a, a, lambda: -a)


def mul(a, b):
    if _c(a) and _c(b):
        return a * b
    if _c(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
        if a == -1.0:
            return neg(b)
        return _cse2("mul", a, b, lambda: a * b)
    if _c(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
        if b == -1.0:
            return neg(a)
    return _cse2("mul", a, b, lambda: a * b)


def fma(acc, a, b):
    """acc + a*b with folding."""
    return add(acc, mul(a, b))


def v3(x=0.0, y=0.0, z=0.0):
    return [x, y, z]


def vadd3(a, b):
    return [add(a[i], b[i]) for i in range(3)]


def vsub3(a, b):
    return [sub(a[i], b[i]) for i in range(3)]


def vscale3(a, s):
    return [mul(a[i], s) for i in range(3)]


def vdot3(a, b):
    return add(add(mul(a[0], b[0]), mul(a[1], b[1])), mul(a[2], b[2]))


def vcross3(a, b):
    return [
        sub(mul(a[1], b[2]), mul(a[2], b[1])),
        sub(mul(a[2], b[0]), mul(a[0], b[2])),
        sub(mul(a[0], b[1]), mul(a[1], b[0])),
    ]


def qmul(u, v):
    """Hamilton product on (w,x,y,z) component lists (ops.math.quat_mul)."""
    return [
        sub(sub(sub(mul(u[0], v[0]), mul(u[1], v[1])), mul(u[2], v[2])), mul(u[3], v[3])),
        sub(add(add(mul(u[0], v[1]), mul(u[1], v[0])), mul(u[2], v[3])), mul(u[3], v[2])),
        add(add(sub(mul(u[0], v[2]), mul(u[1], v[3])), mul(u[2], v[0])), mul(u[3], v[1])),
        add(sub(add(mul(u[0], v[3]), mul(u[1], v[2])), mul(u[2], v[1])), mul(u[3], v[0])),
    ]


def qrot(vec, q):
    """rotate(vec, q) — same formula as ops.math.rotate."""
    s, u = q[0], q[1:]
    uv = vdot3(u, vec)
    uu = vdot3(u, u)
    k = sub(mul(s, s), uu)
    c = vcross3(u, vec)
    return [
        add(add(mul(mul(2.0, uv), u[i]), mul(k, vec[i])), mul(mul(2.0, s), c[i]))
        for i in range(3)
    ]


def quat_to_mat(q):
    """3x3 rotation matrix rows (list of 3 row lists), ops.math.quat_to_mat."""
    w, x, y, z = q
    return [
        [
            sub(1.0, mul(2.0, add(mul(y, y), mul(z, z)))),
            mul(2.0, sub(mul(x, y), mul(w, z))),
            mul(2.0, add(mul(x, z), mul(w, y))),
        ],
        [
            mul(2.0, add(mul(x, y), mul(w, z))),
            sub(1.0, mul(2.0, add(mul(x, x), mul(z, z)))),
            mul(2.0, sub(mul(y, z), mul(w, x))),
        ],
        [
            mul(2.0, sub(mul(x, z), mul(w, y))),
            mul(2.0, add(mul(y, z), mul(w, x))),
            sub(1.0, mul(2.0, add(mul(x, x), mul(y, y)))),
        ],
    ]


def materialize(x, ref_tile):
    """Constant -> broadcast tile matching a reference tile's shape/dtype."""
    if _c(x):
        return jnp.full(ref_tile.shape, x, ref_tile.dtype)
    return x


# spatial 6-vectors as (ang3, lin3) pairs -------------------------------------


def motion_cross(v, m):
    """ops.math.motion_cross on (ang, lin) pairs."""
    va, vl = v
    ma, ml = m
    ang = vcross3(va, ma)
    lin = vadd3(vcross3(va, ml), vcross3(vl, ma))
    return (ang, lin)


def motion_cross_force(v, f):
    """ops.math.motion_cross_force on (ang, lin) pairs."""
    va, vl = v
    fa, fl = f
    ang = vadd3(vcross3(va, fa), vcross3(vl, fl))
    lin = vcross3(va, fl)
    return (ang, lin)


# ---------------------------------------------------------------------------
# static model digest (host-side numpy, hashable per model topology)
# ---------------------------------------------------------------------------


class _Pair(NamedTuple):
    kind: str  # 'ps' (plane-sphere) or 'ss' (sphere-sphere)
    sphere_geom: int
    sphere_body: int
    radius: float
    sphere_off: tuple  # local geom_pos on the body
    plane_point: tuple  # ps only: world point on the plane
    plane_n: tuple  # ps only: world unit normal
    frame_t1: tuple  # ps only (ss frames are state-dependent)
    frame_t2: tuple
    solref: tuple  # combined (2,)
    solimp: tuple  # combined (5,)
    invweight: float
    geom1: int
    geom2: int
    body1: int
    body2: int
    # ss only: the first sphere (geom1 side)
    radius1: float = 0.0
    sphere_off1: tuple = (0.0, 0.0, 0.0)
    # bs only: world-static box pose (rows of the rotation matrix) + size
    box_R: tuple = ()
    box_pos: tuple = (0.0, 0.0, 0.0)
    box_half: tuple = (0.0, 0.0, 0.0)
    # hs only: world-static heightfield pose + elevation grid constants
    hf_R: tuple = ()  # rows of the world rotation matrix
    hf_pos: tuple = (0.0, 0.0, 0.0)
    hf_size: tuple = (0.0, 0.0, 0.0)  # rx, ry, elevation_z
    hf_grid: tuple = ()  # (nrow, ncol) normalized elevations, row tuples
    # capsule fields: geom2-side capsule ('pc'/'sc'/'cc')
    cap_half: float = 0.0  # axis half-length
    cap_quat: tuple = (1.0, 0.0, 0.0, 0.0)  # local geom quat
    cap_end: int = 0  # pc only: endpoint index (0 -> -axis, 1 -> +axis)
    # cc only: the geom1-side capsule (center/radius ride radius1/sphere_off1)
    cap_half1: float = 0.0
    cap_quat1: tuple = (1.0, 0.0, 0.0, 0.0)


def soa_supported(m: RobotModel) -> bool:
    """True when the model is in the SoA kernel's supported class."""
    # heightfield supported for a WORLD-STATIC hfield geom: its pose and
    # elevation grid are trace-time constants, so the bilinear-patch
    # narrowphase (collision._hfield_sphere) becomes a masked constant
    # lookup. The fold is O(nrow*ncol) unrolled vector FMAs per foot per
    # substep — cap the grid so the emitted program stays compilable.
    if m.pairs_hfield_sphere:
        if m.hfield_data is None or m.hfield_nrow < 2 or m.hfield_ncol < 2:
            return False
        if m.hfield_nrow * m.hfield_ncol > MAX_HFIELD_CELLS:
            return False
        for g1, _ in m.pairs_hfield_sphere:
            if m.geom_bodyid[g1] != 0:
                return False
    # sphere-box supported only for WORLD-STATIC boxes (obstacle terrain:
    # box pose is a trace-time constant, so the narrowphase reduces to
    # clamped point-in-OBB algebra like the plane case)
    for _, g2 in m.pairs_sphere_box:
        if m.geom_bodyid[g2] != 0:
            return False
    # capsules supported; plane-capsule planes must be world-static (their
    # pose + contact frame fallback are trace-time constants, like ps)
    for g1, _ in getattr(m, "pairs_plane_capsule", ()):
        if m.geom_bodyid[g1] != 0:
            return False
    if m.solver_iterations != 1:
        # the kernel unrolls iterations without the XLA path's masked
        # tolerance early-exit; only the 1-iteration reference setting is
        # certified equivalent
        return False
    for j in range(m.njnt):
        if m.jnt_type[j] not in (JNT_FREE, JNT_HINGE):
            return False
    # planes must be world-static (their body has no joint path to root)
    for g1, _ in m.pairs_plane_sphere:
        b = m.geom_bodyid[g1]
        if b != 0:
            return False
    # single kinematic tree rooted at body 1 (subtree_com shortcut)
    for b in range(1, m.nbody):
        if m.body_rootid[b] != 1:
            return False
    # exactly one free joint, on body 1
    free = [j for j in range(m.njnt) if m.jnt_type[j] == JNT_FREE]
    if len(free) != 1 or m.jnt_bodyid[free[0]] != 1:
        return False
    return True


def _np(x):
    return np.asarray(jax.device_get(x), np.float64)


class _Static:
    """Everything the kernel bakes in as Python constants.

    Numeric tables come from the host-side ``mujoco.MjModel`` when given:
    pulling them off the RobotModel's device arrays requires a
    device->host transfer, and on the tunneled TPU a SINGLE D2H transfer
    permanently degrades every later ``block_until_ready`` to the tunnel
    round-trip (~27 ms). The jnp fallback is for CPU-backend contexts
    (tests) where no tunnel exists.
    """

    def __init__(self, m: RobotModel, mj_model=None):
        self.nq, self.nv, self.nu = m.nq, m.nv, m.nu
        self.nbody, self.njnt, self.nsite = m.nbody, m.njnt, m.nsite
        self.body_parentid = m.body_parentid
        self.body_jntid = m.body_jntid
        self.jnt_type = m.jnt_type
        self.jnt_qposadr = m.jnt_qposadr
        self.jnt_dofadr = m.jnt_dofadr
        self.jnt_bodyid = m.jnt_bodyid
        self.timestep = float(m.timestep)
        self.impratio = float(m.impratio)
        self.solver_iterations = int(m.solver_iterations)
        if mj_model is not None:
            def g(name):
                # reshape to the RobotModel leaf's shape (mujoco exposes
                # some per-element fields with a trailing singleton);
                # reading .shape off a jnp leaf does NOT transfer data
                tgt = getattr(m, name).shape
                return np.asarray(getattr(mj_model, name), np.float64).reshape(tgt).copy()

            self.gravity = tuple(np.asarray(mj_model.opt.gravity, np.float64).reshape(3))
            self.qpos0 = tuple(np.asarray(mj_model.qpos0, np.float64).reshape(-1))
            geom_solref, geom_solimp = g("geom_solref"), g("geom_solimp")
            geom_pos, geom_quat, geom_size = g("geom_pos"), g("geom_quat"), g("geom_size")
            # mujoco biasprm is (nu, 10) vs the RobotModel's (nu, 3):
            # slice before any shape normalization
            self.actuator_b0 = np.asarray(
                mj_model.actuator_biasprm, np.float64
            )[:, 0].copy()
            self.forcerange = g("actuator_forcerange")
            body_iw_tab = g("body_invweight0")
        else:
            def g(name):
                return _np(getattr(m, name))

            self.gravity = tuple(_np(m.gravity))
            self.qpos0 = tuple(_np(m.qpos0))
            geom_solref, geom_solimp = _np(m.geom_solref), _np(m.geom_solimp)
            geom_pos, geom_quat, geom_size = (
                _np(m.geom_pos), _np(m.geom_quat), _np(m.geom_size)
            )
            self.actuator_b0 = _np(m.actuator_biasprm)[:, 0]
            self.forcerange = _np(m.actuator_forcerange)
            body_iw_tab = _np(m.body_invweight0)
        self.body_pos = g("body_pos")
        self.body_quat = g("body_quat")
        self.body_iquat = g("body_iquat")
        self.jnt_pos = g("jnt_pos")
        self.jnt_axis = g("jnt_axis")
        self.jnt_range = g("jnt_range")
        self.jnt_solref = g("jnt_solref")
        self.jnt_solimp = g("jnt_solimp")
        self.jnt_margin = g("jnt_margin")
        self.jnt_limited = m.jnt_limited
        self.dof_armature = g("dof_armature")
        self.dof_damping = g("dof_damping")
        self.dof_frictionloss = g("dof_frictionloss")
        self.dof_solref = g("dof_solref")
        self.dof_solimp = g("dof_solimp")
        self.dof_invweight0 = g("dof_invweight0")
        self.dof_frictional = m.dof_frictional
        self.site_pos = g("site_pos")
        self.site_bodyid = m.site_bodyid
        self.actuator_jntid = m.actuator_jntid

        # ---- per-dof ancestor chains (tree sparsity) ----
        body_dofs = [[] for _ in range(m.nbody)]
        for j in range(m.njnt):
            b, d = m.jnt_bodyid[j], m.jnt_dofadr[j]
            n = 6 if m.jnt_type[j] == JNT_FREE else 1
            body_dofs[b].extend(range(d, d + n))
        chains = [[] for _ in range(m.nbody)]
        for i in range(1, m.nbody):
            chains[i] = chains[m.body_parentid[i]] + body_dofs[i]
        self.body_dofs = body_dofs
        self.chains = chains  # dofs of the chain from root to body i, in order
        dof_body = [0] * m.nv
        for j in range(m.njnt):
            b, d = m.jnt_bodyid[j], m.jnt_dofadr[j]
            n = 6 if m.jnt_type[j] == JNT_FREE else 1
            for dd in range(d, d + n):
                dof_body[dd] = b
        self.dof_body = dof_body
        # anc[j][k] True iff k <= j and k in chain of j's body
        anc = np.zeros((m.nv, m.nv), bool)
        for jd in range(m.nv):
            for kd in chains[dof_body[jd]]:
                if kd <= jd:
                    anc[jd, kd] = True
        self.anc = anc
        # dense lower pattern for the Newton Hessian factor: sphere-sphere
        # contact rows couple two legs, which breaks the tree sparsity
        self.dense = np.tril(np.ones((m.nv, m.nv), bool))

        # ---- collision pairs (plane-sphere, plane static) ----
        body_iw = body_iw_tab[:, 0]
        self.pairs: List[_Pair] = []
        for g1, g2 in m.pairs_plane_sphere:
            # plane world pose: its body is world-static (gated in
            # soa_supported), so pos/quat of the geom are the world pose
            w, x, y, z = geom_quat[g1]
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            n = R[:, 2]
            # frame rows exactly as collision._make_frames (mju_makeFrame)
            e = (
                np.array([0.0, 1.0, 0.0])
                if abs(n[1]) < 0.5
                else np.array([0.0, 0.0, 1.0])
            )
            t2 = np.cross(n, e)
            t2 = t2 / max(np.linalg.norm(t2), 1e-12)
            t1 = np.cross(t2, n)
            sb = m.geom_bodyid[g2]
            self.pairs.append(
                _Pair(
                    kind="ps",
                    sphere_geom=g2,
                    sphere_body=sb,
                    radius=float(geom_size[g2][0]),
                    sphere_off=tuple(geom_pos[g2]),
                    plane_point=tuple(geom_pos[g1]),
                    plane_n=tuple(n),
                    frame_t1=tuple(t1),
                    frame_t2=tuple(t2),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[m.geom_bodyid[g1]] + body_iw[sb]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(m.geom_bodyid[g1]),
                    body2=int(sb),
                )
            )
        # sphere-sphere candidates (same order as collide_pairs reporting)
        for g1, g2 in m.pairs_sphere_sphere:
            b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
            self.pairs.append(
                _Pair(
                    kind="ss",
                    sphere_geom=g2,
                    sphere_body=b2,
                    radius=float(geom_size[g2][0]),
                    sphere_off=tuple(geom_pos[g2]),
                    plane_point=(0.0, 0.0, 0.0),
                    plane_n=(0.0, 0.0, 1.0),
                    frame_t1=(0.0, 1.0, 0.0),
                    frame_t2=(-1.0, 0.0, 0.0),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[b1] + body_iw[b2]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(b1),
                    body2=int(b2),
                    radius1=float(geom_size[g1][0]),
                    sphere_off1=tuple(geom_pos[g1]),
                )
            )
        # sphere-box candidates (world-static boxes: obstacle terrain).
        # Pair order must match collision.collide's reporting order
        # (plane-sphere, sphere-sphere, sphere-box).
        for g1, g2 in m.pairs_sphere_box:
            sb = m.geom_bodyid[g1]
            w, x, y, z = geom_quat[g2]
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            self.pairs.append(
                _Pair(
                    kind="bs",
                    sphere_geom=g1,
                    sphere_body=sb,
                    radius=float(geom_size[g1][0]),
                    sphere_off=tuple(geom_pos[g1]),
                    plane_point=(0.0, 0.0, 0.0),
                    plane_n=(0.0, 0.0, 1.0),
                    frame_t1=(0.0, 1.0, 0.0),
                    frame_t2=(-1.0, 0.0, 0.0),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[sb] + body_iw[m.geom_bodyid[g2]]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(sb),
                    body2=int(m.geom_bodyid[g2]),
                    box_R=tuple(tuple(float(c) for c in row) for row in R),
                    box_pos=tuple(float(c) for c in geom_pos[g2]),
                    box_half=tuple(float(c) for c in geom_size[g2]),
                )
            )
        # heightfield-sphere candidates (world-static hfield: rough terrain).
        # Reporting order matches collision.collide (hfield after box).
        if m.pairs_hfield_sphere:
            if mj_model is not None:
                hf_data = np.asarray(mj_model.hfield_data, np.float64).reshape(
                    m.hfield_nrow, m.hfield_ncol
                )
                hf_size = np.asarray(
                    mj_model.hfield_size, np.float64
                ).reshape(-1)
            else:
                hf_data = _np(m.hfield_data)
                hf_size = _np(m.hfield_size).reshape(-1)
            hf_grid = tuple(tuple(float(x) for x in row) for row in hf_data)
        for g1, g2 in m.pairs_hfield_sphere:
            sb = m.geom_bodyid[g2]
            w, x, y, z = geom_quat[g1]
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            self.pairs.append(
                _Pair(
                    kind="hs",
                    sphere_geom=g2,
                    sphere_body=sb,
                    radius=float(geom_size[g2][0]),
                    sphere_off=tuple(geom_pos[g2]),
                    plane_point=(0.0, 0.0, 0.0),
                    plane_n=(0.0, 0.0, 1.0),
                    frame_t1=(0.0, 1.0, 0.0),
                    frame_t2=(-1.0, 0.0, 0.0),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[m.geom_bodyid[g1]] + body_iw[sb]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(m.geom_bodyid[g1]),
                    body2=int(sb),
                    hf_R=tuple(tuple(float(c) for c in row) for row in R),
                    hf_pos=tuple(float(c) for c in geom_pos[g1]),
                    hf_size=tuple(float(c) for c in hf_size[:3]),
                    hf_grid=hf_grid,
                )
            )
        # plane-capsule: TWO rows per pair (one per endpoint sphere), in
        # collide's interleaved order [pair0_end0, pair0_end1, pair1_end0...]
        for g1, g2 in getattr(m, "pairs_plane_capsule", ()):
            w, x, y, z = geom_quat[g1]
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            n = R[:, 2]
            e = (
                np.array([0.0, 1.0, 0.0])
                if abs(n[1]) < 0.5
                else np.array([0.0, 0.0, 1.0])
            )
            t2 = np.cross(n, e)
            t2 = t2 / max(np.linalg.norm(t2), 1e-12)
            t1 = np.cross(t2, n)
            cb = m.geom_bodyid[g2]
            for end in (0, 1):
                self.pairs.append(
                    _Pair(
                        kind="pc",
                        sphere_geom=g2,
                        sphere_body=cb,
                        radius=float(geom_size[g2][0]),
                        sphere_off=tuple(geom_pos[g2]),
                        plane_point=tuple(geom_pos[g1]),
                        plane_n=tuple(n),
                        frame_t1=tuple(t1),  # vertical-capsule fallback
                        frame_t2=tuple(t2),
                        solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                        solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                        invweight=float(body_iw[m.geom_bodyid[g1]] + body_iw[cb]),
                        geom1=int(g1),
                        geom2=int(g2),
                        body1=int(m.geom_bodyid[g1]),
                        body2=int(cb),
                        cap_half=float(geom_size[g2][1]),
                        cap_quat=tuple(float(c) for c in geom_quat[g2]),
                        cap_end=end,
                    )
                )
        # sphere-capsule (sphere is geom1, like ss's first-sphere side)
        for g1, g2 in getattr(m, "pairs_sphere_capsule", ()):
            b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
            self.pairs.append(
                _Pair(
                    kind="sc",
                    sphere_geom=g2,
                    sphere_body=b2,
                    radius=float(geom_size[g2][0]),
                    sphere_off=tuple(geom_pos[g2]),
                    plane_point=(0.0, 0.0, 0.0),
                    plane_n=(0.0, 0.0, 1.0),
                    frame_t1=(0.0, 1.0, 0.0),
                    frame_t2=(-1.0, 0.0, 0.0),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[b1] + body_iw[b2]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(b1),
                    body2=int(b2),
                    radius1=float(geom_size[g1][0]),
                    sphere_off1=tuple(geom_pos[g1]),
                    cap_half=float(geom_size[g2][1]),
                    cap_quat=tuple(float(c) for c in geom_quat[g2]),
                )
            )
        # capsule-capsule (geom1 capsule rides the radius1/off1/cap_*1 slots)
        for g1, g2 in getattr(m, "pairs_capsule_capsule", ()):
            b1, b2 = m.geom_bodyid[g1], m.geom_bodyid[g2]
            self.pairs.append(
                _Pair(
                    kind="cc",
                    sphere_geom=g2,
                    sphere_body=b2,
                    radius=float(geom_size[g2][0]),
                    sphere_off=tuple(geom_pos[g2]),
                    plane_point=(0.0, 0.0, 0.0),
                    plane_n=(0.0, 0.0, 1.0),
                    frame_t1=(0.0, 1.0, 0.0),
                    frame_t2=(-1.0, 0.0, 0.0),
                    solref=tuple(0.5 * (geom_solref[g1] + geom_solref[g2])),
                    solimp=tuple(0.5 * (geom_solimp[g1] + geom_solimp[g2])),
                    invweight=float(body_iw[b1] + body_iw[b2]),
                    geom1=int(g1),
                    geom2=int(g2),
                    body1=int(b1),
                    body2=int(b2),
                    radius1=float(geom_size[g1][0]),
                    sphere_off1=tuple(geom_pos[g1]),
                    cap_half=float(geom_size[g2][1]),
                    cap_quat=tuple(float(c) for c in geom_quat[g2]),
                    cap_half1=float(geom_size[g1][1]),
                    cap_quat1=tuple(float(c) for c in geom_quat[g1]),
                )
            )
        self.npair = len(self.pairs)

        # Newton-Hessian sparsity from the ACTUAL contact-row couplings
        # (r5): start from the kinematic-tree ancestor pattern (what the
        # CRB mass matrix occupies), add a clique over the union of both
        # bodies' chains for every collision pair (conservative: the
        # emitter's dof_coeff sets are subsets after shared-dof
        # cancellation), then close under symbolic reverse-elimination
        # fill-in (the _ldl_factor_dict order). For flat/obstacle/hfield
        # configs — whose rows each couple ONE chain — this collapses to
        # the fill-in-free tree pattern, cutting the dense 18x18 factor
        # (~2x Sum k^2 = 3.6k eqs/iter) to the ~1.4k tree factor;
        # leg-leg pairs (sphere-sphere, capsule-capsule) grow it only
        # where they actually couple.
        hess = anc.copy()
        for pr in self.pairs:
            dofs = sorted(
                set(chains[pr.body1]) | set(chains[pr.body2])
            )
            for i_d in dofs:
                for j_d in dofs:
                    if j_d <= i_d:
                        hess[i_d, j_d] = True
        for k in reversed(range(m.nv)):
            ancs = [i for i in range(k) if hess[k, i]]
            for a_i in ancs:
                for b_i in ancs:
                    if b_i <= a_i:
                        hess[a_i, b_i] = True
        self.hess = hess

        # limited joints
        self.lim_joints = [j for j in range(m.njnt) if m.jnt_limited[j]]

        # DR input row map: rows of the (NDR, B) per-env parameter array
        self.dr_rows: Dict[str, Tuple[int, int]] = {}
        r = 0
        for name, n in (
            ("mass", m.nbody),
            ("inertia", m.nbody * 3),
            ("ipos", m.nbody * 3),
            ("gain0", m.nu),
            ("bias1", m.nu),
            ("bias2", m.nu),
            ("pair_mu", self.npair),
        ):
            self.dr_rows[name] = (r, n)
            r += n
        self.ndr = r

        # caches output row map
        self.cache_rows: Dict[str, Tuple[int, int]] = {}
        r = 0
        for name, n in (
            ("qacc", m.nv),
            ("xpos", m.nbody * 3),
            ("xquat", (m.nbody - 1) * 4),
            ("xd_ang", (m.nbody - 1) * 3),
            ("xd_vel", (m.nbody - 1) * 3),
            ("site_xpos", m.nsite * 3),
            ("qfrc_actuator", m.nv),
            ("con_dist", self.npair),
            ("con_pos", self.npair * 3),
        ):
            self.cache_rows[name] = (r, n)
            r += n
        self.ncache = r


# ---------------------------------------------------------------------------
# program emitters (operate on value-algebra objects)
# ---------------------------------------------------------------------------


def _impedance(solimp: tuple, pos):
    """MuJoCo impedance d(pos) with STATIC solimp (constraint.impedance)."""
    dmin, dmax, width, mid, power = (float(x) for x in solimp)
    if _c(pos):
        # fully static row (e.g. friction rows, pos = 0)
        x = min(max(abs(pos) / max(width, _MINVAL), 0.0), 1.0)
        a = 1.0 / max(mid, _MINVAL) ** (power - 1.0)
        b = 1.0 / max(1.0 - mid, _MINVAL) ** (power - 1.0)
        y = a * x**power if x < mid else 1.0 - b * (1.0 - x) ** power
        return min(max(dmin + y * (dmax - dmin), 1e-4), 0.9999)
    x = jnp.clip(jnp.abs(pos) / max(width, _MINVAL), 0.0, 1.0)
    a = 1.0 / max(mid, _MINVAL) ** (power - 1.0)
    b = 1.0 / max(1.0 - mid, _MINVAL) ** (power - 1.0)
    if power == 2.0:
        y_lo = a * x * x
        one_minus = 1.0 - x
        y_hi = 1.0 - b * one_minus * one_minus
    else:
        y_lo = a * jnp.power(x, power)
        y_hi = 1.0 - b * jnp.power(1.0 - x, power)
    y = jnp.where(x < mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 0.9999)


def _kb(solref: tuple, solimp: tuple) -> Tuple[float, float]:
    """Static stiffness/damping from solref (constraint._kb)."""
    dmax = float(solimp[1])
    timeconst, dampratio = float(solref[0]), float(solref[1])
    if timeconst <= 0 or dampratio <= 0:
        return (
            -timeconst / max(dmax * dmax, _MINVAL),
            -dampratio / max(dmax, _MINVAL),
        )
    k = 1.0 / max(dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL)
    b = 2.0 / max(dmax * timeconst, _MINVAL)
    return k, b


class _Row(NamedTuple):
    J: dict  # dof -> value
    aref: object
    D: object
    R: object
    floss: float
    fric: bool


def _emit_fk(s: _Static, q, dr):
    """Forward kinematics; returns xpos/xquat per body + anchors/axes."""
    xpos = [None] * s.nbody
    xquat = [None] * s.nbody
    xanchor = [None] * s.njnt
    xaxis = [None] * s.njnt
    xpos[0] = [0.0, 0.0, 0.0]
    xquat[0] = [1.0, 0.0, 0.0, 0.0]
    for b in range(1, s.nbody):
        p = s.body_parentid[b]
        j = s.body_jntid[b]
        if j != -1 and s.jnt_type[j] == JNT_FREE:
            qa = s.jnt_qposadr[j]
            pos = [q[qa], q[qa + 1], q[qa + 2]]
            raw = [q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6]]
            n2 = add(
                add(mul(raw[0], raw[0]), mul(raw[1], raw[1])),
                add(mul(raw[2], raw[2]), mul(raw[3], raw[3])),
            )
            inv = jax.lax.rsqrt(n2)
            quat = [mul(raw[i], inv) for i in range(4)]
            xpos[b], xquat[b] = pos, quat
            xanchor[j] = pos
            xaxis[j] = [float(x) for x in s.jnt_axis[j]]
            continue
        bq = [float(x) for x in s.body_quat[b]]
        bp = [float(x) for x in s.body_pos[b]]
        frame_quat = qmul(xquat[p], bq)
        frame_pos = vadd3(xpos[p], qrot(bp, xquat[p]))
        if j == -1:  # fixed body
            xpos[b], xquat[b] = frame_pos, frame_quat
            continue
        qa = s.jnt_qposadr[j]
        angle = sub(q[qa], float(s.qpos0[qa]))
        half = mul(0.5, angle)
        ch, sh = jnp.cos(half), jnp.sin(half)
        ax = [float(x) for x in s.jnt_axis[j]]
        qloc = [ch, mul(ax[0], sh), mul(ax[1], sh), mul(ax[2], sh)]
        quat = qmul(frame_quat, qloc)
        jp_ = [float(x) for x in s.jnt_pos[j]]
        anchor = vadd3(frame_pos, qrot(jp_, frame_quat))
        pos = vsub3(anchor, qrot(jp_, quat))
        xpos[b], xquat[b] = pos, quat
        xanchor[j] = anchor
        xaxis[j] = qrot(ax, quat)
    return xpos, xquat, xanchor, xaxis


def _spatial_inertia(mass, inertia, offset, R):
    """Dense symmetric 6x6 spatial inertia (ops.math.transform_inertia)."""
    # I3 = R diag(inertia) R^T
    I3 = [[0.0] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(i, 3):
            acc = 0.0
            for jj in range(3):
                acc = fma(acc, mul(R[i][jj], inertia[jj]), R[k][jj])
            I3[i][k] = acc
            I3[k][i] = acc
    c = offset
    cdot = vdot3(c, c)
    I6 = [[0.0] * 6 for _ in range(6)]
    for i in range(3):
        for k in range(i, 3):
            delta = cdot if i == k else 0.0
            v = add(I3[i][k], mul(mass, sub(delta, mul(c[i], c[k]))))
            I6[i][k] = v
            I6[k][i] = v
    # top-right = m * cx (skew of c); bottom-left = its transpose
    cx = [
        [0.0, neg(c[2]), c[1]],
        [c[2], 0.0, neg(c[0])],
        [neg(c[1]), c[0], 0.0],
    ]
    for i in range(3):
        for k in range(3):
            v = mul(mass, cx[i][k])
            I6[i][3 + k] = v
            I6[3 + k][i] = v
    for i in range(3):
        I6[3 + i][3 + i] = mass
    return I6


def _inert_mv(I6, m6):
    """6x6 spatial inertia times a 6-vector (list of 6 values)."""
    return [
        functools.reduce(add, [mul(I6[i][k], m6[k]) for k in range(6)])
        for i in range(6)
    ]


def _emit_forward(s: _Static, q, v, ctrl, dr):
    """One full forward-dynamics pass (pipeline.forward equivalent)."""
    xpos, xquat, xanchor, xaxis = _emit_fk(s, q, dr)

    # inertial frames (DR ipos) + subtree COM of the single tree
    mass = [dr["mass"][b] for b in range(s.nbody)]
    xipos = [None] * s.nbody
    ximat = [None] * s.nbody
    for b in range(1, s.nbody):
        ip = [dr["ipos"][3 * b + i] for i in range(3)]
        xipos[b] = vadd3(xpos[b], qrot(ip, xquat[b]))
        iq = [float(x) for x in s.body_iquat[b]]
        ximat[b] = quat_to_mat(qmul(xquat[b], iq))
    tot_mass = functools.reduce(add, mass[1:])
    mom = [0.0, 0.0, 0.0]
    for b in range(1, s.nbody):
        mom = vadd3(mom, vscale3(xipos[b], mass[b]))
    inv_tot = 1.0 / jnp.maximum(materialize(tot_mass, mom[0]), 1e-12)
    com_root = vscale3(mom, inv_tot)

    def _phase_out(**kw):
        pad = dict(
            qacc=[q[0]] * s.nv, qacc_smooth=[q[0]] * s.nv,
            qfrc_actuator=[q[0]] * s.nv,
            xpos=xpos, xquat=xquat,
            cvel=[([q[0]] * 3, [q[0]] * 3)] * s.nbody,
            com_root=[q[0]] * 3,
            con_dist=[q[0]] * s.npair,
            con_pos=[[q[0]] * 3] * s.npair,
            sites=[[q[0]] * 3] * s.nsite,
        )
        pad.update(kw)
        return pad

    if PHASE_LIMIT == "fk":
        return _phase_out()

    # com-frame spatial inertias
    cinert = [None] * s.nbody
    for b in range(1, s.nbody):
        inertia = [dr["inertia"][3 * b + i] for i in range(3)]
        offset = vsub3(xipos[b], com_root)
        cinert[b] = _spatial_inertia(mass[b], inertia, offset, ximat[b])

    # dof axes about the root com
    cdof = [None] * s.nv  # each (ang3, lin3)
    for j in range(s.njnt):
        b = s.jnt_bodyid[j]
        d = s.jnt_dofadr[j]
        if s.jnt_type[j] == JNT_FREE:
            for i in range(3):
                e = [0.0, 0.0, 0.0]
                e[i] = 1.0
                cdof[d + i] = ([0.0, 0.0, 0.0], e)
            R = quat_to_mat(xquat[b])
            off = vsub3(com_root, xanchor[j])
            for i in range(3):
                axis = [R[0][i], R[1][i], R[2][i]]  # column i = body axis
                cdof[d + 3 + i] = (axis, vcross3(axis, off))
        else:
            ax = xaxis[j]
            off = vsub3(com_root, xanchor[j])
            cdof[d] = (ax, vcross3(ax, off))

    if PHASE_LIMIT == "compos":
        return _phase_out()

    # com velocities (forward pass)
    cvel = [None] * s.nbody
    cvel[0] = ([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    cdof_dot = [([0.0, 0.0, 0.0], [0.0, 0.0, 0.0])] * s.nv
    for b in range(1, s.nbody):
        p = s.body_parentid[b]
        j = s.body_jntid[b]
        if j == -1:
            cvel[b] = cvel[p]
            continue
        d = s.jnt_dofadr[j]
        if s.jnt_type[j] == JNT_FREE:
            vp = cvel[p]
            v_trans = (
                vp[0],
                vadd3(vp[1], [v[d], v[d + 1], v[d + 2]]),
            )
            acc = v_trans
            for i in range(3):
                cdof_dot[d + 3 + i] = motion_cross(v_trans, cdof[d + 3 + i])
                ang, lin = cdof[d + 3 + i]
                acc = (
                    vadd3(acc[0], vscale3(ang, v[d + 3 + i])),
                    vadd3(acc[1], vscale3(lin, v[d + 3 + i])),
                )
            cvel[b] = acc
        else:
            cdof_dot[d] = motion_cross(cvel[p], cdof[d])
            ang, lin = cdof[d]
            cvel[b] = (
                vadd3(cvel[p][0], vscale3(ang, v[d])),
                vadd3(cvel[p][1], vscale3(lin, v[d])),
            )

    if PHASE_LIMIT == "comvel":
        return _phase_out()

    # CRB mass matrix (sparse entries over the ancestor pattern)
    crb = [None] + [[row[:] for row in cinert[b]] for b in range(1, s.nbody)]
    for b in range(s.nbody - 1, 0, -1):
        p = s.body_parentid[b]
        if p > 0:
            for i in range(6):
                for k in range(6):
                    crb[p][i][k] = add(crb[p][i][k], crb[b][i][k])
    F = [None] * s.nv
    for d in range(s.nv):
        b = s.dof_body[d]
        m6 = list(cdof[d][0]) + list(cdof[d][1])
        F[d] = _inert_mv(crb[b], m6)
    M: Dict[Tuple[int, int], object] = {}
    for jd in range(s.nv):
        for kd in range(jd + 1):
            if not s.anc[jd, kd]:
                continue
            m6 = list(cdof[kd][0]) + list(cdof[kd][1])
            acc = 0.0
            for i in range(6):
                acc = fma(acc, F[jd][i], m6[i])
            if jd == kd:
                acc = add(acc, float(s.dof_armature[jd]))
            M[(jd, kd)] = acc

    if PHASE_LIMIT == "crb":
        return _phase_out()

    # RNE bias forces
    cacc = [None] * s.nbody
    g = s.gravity
    cacc[0] = ([0.0, 0.0, 0.0], [-g[0], -g[1], -g[2]])
    for b in range(1, s.nbody):
        p = s.body_parentid[b]
        j = s.body_jntid[b]
        a = cacc[p]
        if j != -1:
            d = s.jnt_dofadr[j]
            n = 6 if s.jnt_type[j] == JNT_FREE else 1
            for dd in range(d, d + n):
                ang, lin = cdof_dot[dd]
                a = (
                    vadd3(a[0], vscale3(ang, v[dd])),
                    vadd3(a[1], vscale3(lin, v[dd])),
                )
        cacc[b] = a
    total = [None] * s.nbody
    for b in range(1, s.nbody):
        v6 = list(cvel[b][0]) + list(cvel[b][1])
        a6 = list(cacc[b][0]) + list(cacc[b][1])
        Iv = _inert_mv(cinert[b], v6)
        Ia = _inert_mv(cinert[b], a6)
        crossed = motion_cross_force(cvel[b], (Iv[:3], Iv[3:]))
        cf = list(crossed[0]) + list(crossed[1])
        total[b] = [add(Ia[i], cf[i]) for i in range(6)]
    for b in range(s.nbody - 1, 0, -1):
        p = s.body_parentid[b]
        if p > 0:
            total[p] = [add(total[p][i], total[b][i]) for i in range(6)]
    qfrc_bias = [0.0] * s.nv
    for d in range(s.nv):
        b = s.dof_body[d]
        m6 = list(cdof[d][0]) + list(cdof[d][1])
        acc = 0.0
        for i in range(6):
            acc = fma(acc, m6[i], total[b][i])
        qfrc_bias[d] = acc

    if PHASE_LIMIT == "rne":
        return _phase_out()

    # passive + actuation
    qfrc_passive = [mul(-float(s.dof_damping[d]), v[d]) for d in range(s.nv)]
    qfrc_act = [0.0] * s.nv
    for a in range(s.nu):
        j = s.actuator_jntid[a]
        qa, d = s.jnt_qposadr[j], s.jnt_dofadr[j]
        force = add(
            mul(dr["gain0"][a], ctrl[a]),
            add(
                float(s.actuator_b0[a]),
                add(mul(dr["bias1"][a], q[qa]), mul(dr["bias2"][a], v[d])),
            ),
        )
        lo, hi = float(s.forcerange[a][0]), float(s.forcerange[a][1])
        force = jnp.clip(materialize(force, v[0]), lo, hi)
        qfrc_act[d] = add(qfrc_act[d], force)

    qfrc_smooth = [
        add(qfrc_passive[d], sub(qfrc_act[d], qfrc_bias[d])) for d in range(s.nv)
    ]
    qacc_smooth = _ldl_solve_dict(s, M, qfrc_smooth)

    if PHASE_LIMIT == "smooth":
        return _phase_out(qacc=qacc_smooth, qacc_smooth=qacc_smooth)

    # ---- contacts: ALL candidate pairs, no caps (C semantics) ----
    con_dist, con_pos, rows_con = [], [], []
    for pi, pr in enumerate(s.pairs):
        b = pr.sphere_body
        off = [float(x) for x in pr.sphere_off]
        center = vadd3(xpos[b], qrot(off, xquat[b]))
        if pr.kind == "ps":
            n = [float(x) for x in pr.plane_n]
            pp = [float(x) for x in pr.plane_point]
            dist = sub(vdot3(n, vsub3(center, pp)), pr.radius)
            cpos = vsub3(center, vscale3(n, add(pr.radius, mul(0.5, dist))))
            t1 = [float(x) for x in pr.frame_t1]
            t2 = [float(x) for x in pr.frame_t2]
            # signed dof coefficients: world side contributes nothing
            dof_coeff = {d: 1.0 for d in s.chains[b]}
        elif pr.kind == "bs":
            # sphere vs WORLD-STATIC box (collision._sphere_box semantics):
            # box rotation/pose/halfsize are trace-time constants
            R = pr.box_R
            ref0 = materialize(center[0], center[0])
            d0 = vsub3(center, pr.box_pos)
            # p = R^T (c - bp) : sphere center in the box frame
            p = [
                materialize(
                    add(add(mul(R[0][j], d0[0]), mul(R[1][j], d0[1])),
                        mul(R[2][j], d0[2])),
                    ref0,
                )
                for j in range(3)
            ]
            half = [float(h) for h in pr.box_half]
            clamped = [jnp.clip(p[j], -half[j], half[j]) for j in range(3)]
            absp = [jnp.abs(p[j]) for j in range(3)]
            inside = (
                (absp[0] < half[0]) & (absp[1] < half[1]) & (absp[2] < half[2])
            )
            # outside: closest surface point
            d_out = vsub3(p, clamped)
            dist_out = jnp.sqrt(materialize(vdot3(d_out, d_out), ref0))
            inv_out = 1.0 / jnp.maximum(dist_out, 1e-12)
            n_out = [-materialize(d_out[j], ref0) * inv_out for j in range(3)]
            # inside: push out along the nearest face (first-min tie-break,
            # matching jnp.argmin)
            gaps = [half[j] - absp[j] for j in range(3)]
            m0 = jnp.where((gaps[0] <= gaps[1]) & (gaps[0] <= gaps[2]), 1.0, 0.0)
            m1 = jnp.where((gaps[1] <= gaps[2]), 1.0 - m0, 0.0)
            m2 = 1.0 - m0 - m1
            oh = [m0, m1, m2]
            psel = p[0] * m0 + p[1] * m1 + p[2] * m2
            sgn = jnp.where(psel >= 0.0, 1.0, -1.0)
            n_in = [-sgn * oh[j] for j in range(3)]
            dist_in = -(gaps[0] * m0 + gaps[1] * m1 + gaps[2] * m2)
            surf_in = [
                p[j] * (1.0 - oh[j]) + oh[j] * sgn * half[j] for j in range(3)
            ]
            dist = jnp.where(inside, dist_in, dist_out) - pr.radius
            n_loc = [jnp.where(inside, n_in[j], n_out[j]) for j in range(3)]
            surf_loc = [jnp.where(inside, surf_in[j], clamped[j]) for j in range(3)]
            # back to world: n = R n_loc ; surface = bp + R surf_loc
            n = [
                add(add(mul(R[i][0], n_loc[0]), mul(R[i][1], n_loc[1])),
                    mul(R[i][2], n_loc[2]))
                for i in range(3)
            ]
            surface = [
                add(pr.box_pos[i],
                    add(add(mul(R[i][0], surf_loc[0]), mul(R[i][1], surf_loc[1])),
                        mul(R[i][2], surf_loc[2])))
                for i in range(3)
            ]
            sph_surf = [add(center[i], mul(n[i], pr.radius)) for i in range(3)]
            cpos = [mul(0.5, add(sph_surf[i], surface[i])) for i in range(3)]
            # dynamic contact frame (mju_makeFrame, as collision._make_frames)
            use_y = jnp.abs(materialize(n[1], ref0)) < 0.5
            ax = [0.0, jnp.where(use_y, 1.0, 0.0), jnp.where(use_y, 0.0, 1.0)]
            t2 = vcross3(n, ax)
            t2n = jnp.maximum(jnp.sqrt(materialize(vdot3(t2, t2), ref0)), 1e-12)
            t2 = [materialize(t2[i], ref0) / t2n for i in range(3)]
            t1 = vcross3(t2, n)
            # J = frame @ (jac(body2=box) - jac(body1=sphere)) = -jac_sphere:
            # the SPHERE is geom1 here (normal points sphere -> box), the
            # opposite of the plane-sphere orientation
            dof_coeff = {d: -1.0 for d in s.chains[b]}
        elif pr.kind == "hs":
            # sphere vs WORLD-STATIC heightfield (collision._hfield_sphere
            # semantics): pose + elevation grid are trace-time constants, so
            # the bilinear-patch lookup is a masked constant fold — per-row
            # column contractions with Python-float coefficients (zero
            # elevations, e.g. the flattened spawn disc, vanish entirely).
            R = pr.hf_R
            rx, ry, ez = pr.hf_size
            grid = pr.hf_grid
            nrow, ncol = len(grid), len(grid[0])
            ref0 = materialize(center[0], center[0])
            d0 = vsub3(center, pr.hf_pos)
            # p = R^T (c - hp): sphere center in the heightfield frame
            p = [
                materialize(
                    add(add(mul(R[0][j], d0[0]), mul(R[1][j], d0[1])),
                        mul(R[2][j], d0[2])),
                    ref0,
                )
                for j in range(3)
            ]
            # fractional grid coordinates of the footprint (uc/vc named to
            # avoid shadowing the qvel list ``v``)
            uc = (p[0] + rx) / (2.0 * rx) * (ncol - 1)
            vc = (p[1] + ry) / (2.0 * ry) * (nrow - 1)
            outside = (jnp.abs(p[0]) > rx) | (jnp.abs(p[1]) > ry)
            iu = jnp.clip(jnp.floor(uc), 0.0, float(ncol - 2))
            iv = jnp.clip(jnp.floor(vc), 0.0, float(nrow - 2))
            fu = jnp.clip(uc - iu, 0.0, 1.0)
            fv = jnp.clip(vc - iv, 0.0, 1.0)
            cmask = [
                jnp.where(iu == float(c), 1.0, 0.0) for c in range(ncol - 1)
            ]
            rmask = [
                jnp.where(iv == float(r), 1.0, 0.0) for r in range(nrow - 1)
            ]
            # per-row column picks: s0[r] = H[r, iu], s1[r] = H[r, iu+1]
            s0, s1 = [], []
            for r in range(nrow):
                a0, a1 = 0.0, 0.0
                for c in range(ncol - 1):
                    a0 = fma(a0, cmask[c], grid[r][c])
                    a1 = fma(a1, cmask[c], grid[r][c + 1])
                s0.append(a0)
                s1.append(a1)
            # corner picks: row shifts are free Python-list shifts
            c00, c01, c10, c11 = 0.0, 0.0, 0.0, 0.0
            for r in range(nrow - 1):
                c00 = fma(c00, rmask[r], s0[r])
                c01 = fma(c01, rmask[r], s1[r])
                c10 = fma(c10, rmask[r], s0[r + 1])
                c11 = fma(c11, rmask[r], s1[r + 1])
            c00 = materialize(c00, ref0)
            c01 = materialize(c01, ref0)
            c10 = materialize(c10, ref0)
            c11 = materialize(c11, ref0)
            gu, gv = 1.0 - fu, 1.0 - fv
            # h = ez * w_r^T H w_c ; slopes from d_c / d_r one-hot deltas
            h = ez * (gu * (gv * c00 + fv * c10) + fu * (gv * c01 + fv * c11))
            dhdx = (
                ez * (gv * (c01 - c00) + fv * (c11 - c10))
                * ((ncol - 1) / (2.0 * rx))
            )
            dhdy = (
                ez * (gu * (c10 - c00) + fu * (c11 - c01))
                * ((nrow - 1) / (2.0 * ry))
            )
            inv_nn = 1.0 / jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
            n_loc = [-dhdx * inv_nn, -dhdy * inv_nn, inv_nn]
            dist = (p[2] - h) * n_loc[2] - pr.radius
            dist = jnp.where(outside, jnp.asarray(_PAD_DIST, dist.dtype), dist)
            # back to world: n = R n_loc (identity R folds away)
            n = [
                materialize(
                    add(add(mul(R[i][0], n_loc[0]), mul(R[i][1], n_loc[1])),
                        mul(R[i][2], n_loc[2])),
                    ref0,
                )
                for i in range(3)
            ]
            safe = jnp.where(outside, jnp.zeros_like(dist), dist)
            cpos = [
                sub(center[i], mul(n[i], pr.radius + 0.5 * safe))
                for i in range(3)
            ]
            cpos = [materialize(cp, ref0) for cp in cpos]
            # dynamic contact frame (mju_makeFrame, as collision._make_frames)
            use_y = jnp.abs(n[1]) < 0.5
            ax = [0.0, jnp.where(use_y, 1.0, 0.0), jnp.where(use_y, 0.0, 1.0)]
            t2 = vcross3(n, ax)
            t2n = jnp.maximum(jnp.sqrt(materialize(vdot3(t2, t2), ref0)), 1e-12)
            t2 = [materialize(t2[i], ref0) / t2n for i in range(3)]
            t1 = vcross3(t2, n)
            # normal points hfield -> sphere (like plane-sphere): J = +jac
            dof_coeff = {d: 1.0 for d in s.chains[b]}
        elif pr.kind == "pc":
            # plane vs capsule ENDPOINT (collision._plane_capsule: one row
            # per end). Frame: t1 = capsule axis projected onto the plane
            # (the friction pyramid aligns with the capsule), falling back
            # to the constant mju_makeFrame tangent for vertical capsules.
            ref0 = materialize(center[0], center[0])
            q_g = qmul(xquat[b], [float(x) for x in pr.cap_quat])
            axis = qrot([0.0, 0.0, 1.0], q_g)
            sgn = -1.0 if pr.cap_end == 0 else 1.0
            end = vadd3(center, vscale3(axis, mul(sgn, pr.cap_half)))
            n = [float(x) for x in pr.plane_n]
            pp = [float(x) for x in pr.plane_point]
            dist = sub(vdot3(n, vsub3(end, pp)), pr.radius)
            cpos = vsub3(end, vscale3(n, add(pr.radius, mul(0.5, dist))))
            na = vdot3(n, axis)
            proj = [
                materialize(sub(axis[i], mul(n[i], na)), ref0) for i in range(3)
            ]
            pn = jnp.sqrt(materialize(vdot3(proj, proj), ref0))
            use_proj = pn > 1e-8
            inv_pn = 1.0 / jnp.maximum(pn, 1e-12)
            t1 = [
                jnp.where(use_proj, proj[i] * inv_pn, float(pr.frame_t1[i]))
                for i in range(3)
            ]
            t2 = vcross3(n, t1)
            # normal points plane -> capsule: J = +jac (like ps)
            dof_coeff = {d: 1.0 for d in s.chains[b]}
        elif pr.kind == "sc":
            # sphere (geom1) vs nearest point on the capsule axis segment
            # (collision._sphere_capsule semantics)
            b1 = pr.body1
            off1 = [float(x) for x in pr.sphere_off1]
            c1 = vadd3(xpos[b1], qrot(off1, xquat[b1]))
            ref0 = materialize(center[0], center[0])
            q_g = qmul(xquat[b], [float(x) for x in pr.cap_quat])
            axis = qrot([0.0, 0.0, 1.0], q_g)
            tpar = jnp.clip(
                materialize(vdot3(vsub3(c1, center), axis), ref0),
                -pr.cap_half, pr.cap_half,
            )
            nearest = vadd3(center, vscale3(axis, tpar))
            delta = vsub3(nearest, c1)
            length = jnp.sqrt(materialize(vdot3(delta, delta), ref0))
            inv_len = 1.0 / jnp.maximum(length, 1e-12)
            n = [materialize(delta[i], ref0) * inv_len for i in range(3)]
            dist = sub(length, pr.radius1 + pr.radius)
            cpos = vadd3(c1, vscale3(n, add(pr.radius1, mul(0.5, dist))))
            # dynamic contact frame (mju_makeFrame, as collision._make_frames)
            use_y = jnp.abs(n[1]) < 0.5
            ax = [0.0, jnp.where(use_y, 1.0, 0.0), jnp.where(use_y, 0.0, 1.0)]
            t2 = vcross3(n, ax)
            t2n = jnp.maximum(jnp.sqrt(materialize(vdot3(t2, t2), ref0)), 1e-12)
            t2 = [materialize(t2[i], ref0) / t2n for i in range(3)]
            t1 = vcross3(t2, n)
            # n points sphere -> capsule: J = J2 - J1, shared dofs cancel
            dof_coeff = {}
            for d in s.chains[b]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) + 1.0
            for d in s.chains[b1]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) - 1.0
            dof_coeff = {d: c for d, c in dof_coeff.items() if c != 0.0}
        elif pr.kind == "cc":
            # capsule-capsule: closest points between the axis segments
            # (Ericson 5.1.9 clamped, exactly collision._capsule_capsule),
            # then the virtual sphere-sphere contact
            b1 = pr.body1
            off1 = [float(x) for x in pr.sphere_off1]
            c1 = vadd3(xpos[b1], qrot(off1, xquat[b1]))
            ref0 = materialize(center[0], center[0])
            q1 = qmul(xquat[b1], [float(x) for x in pr.cap_quat1])
            axis1 = qrot([0.0, 0.0, 1.0], q1)
            q2 = qmul(xquat[b], [float(x) for x in pr.cap_quat])
            axis2 = qrot([0.0, 0.0, 1.0], q2)
            a0 = vsub3(c1, vscale3(axis1, pr.cap_half1))
            a1e = vadd3(c1, vscale3(axis1, pr.cap_half1))
            b0 = vsub3(center, vscale3(axis2, pr.cap_half))
            b1e = vadd3(center, vscale3(axis2, pr.cap_half))
            d1v = vsub3(a1e, a0)
            d2v = vsub3(b1e, b0)
            r_ = vsub3(a0, b0)
            a_ = materialize(vdot3(d1v, d1v), ref0)
            e_ = materialize(vdot3(d2v, d2v), ref0)
            f_ = materialize(vdot3(d2v, r_), ref0)
            c_ = materialize(vdot3(d1v, r_), ref0)
            bb = materialize(vdot3(d1v, d2v), ref0)
            denom = a_ * e_ - bb * bb
            sseg = jnp.where(
                denom > 1e-12,
                jnp.clip(
                    (bb * f_ - c_ * e_) / jnp.maximum(denom, 1e-12), 0.0, 1.0
                ),
                0.0,
            )
            tseg = (bb * sseg + f_) / jnp.maximum(e_, 1e-12)
            t_cl = jnp.clip(tseg, 0.0, 1.0)
            sseg = jnp.where(
                tseg != t_cl,
                jnp.clip(
                    (bb * t_cl - c_) / jnp.maximum(a_, 1e-12), 0.0, 1.0
                ),
                sseg,
            )
            p1 = vadd3(a0, vscale3(d1v, sseg))
            p2 = vadd3(b0, vscale3(d2v, t_cl))
            delta = vsub3(p2, p1)
            length = jnp.sqrt(materialize(vdot3(delta, delta), ref0))
            inv_len = 1.0 / jnp.maximum(length, 1e-12)
            n = [materialize(delta[i], ref0) * inv_len for i in range(3)]
            dist = sub(length, pr.radius1 + pr.radius)
            cpos = vadd3(p1, vscale3(n, add(pr.radius1, mul(0.5, dist))))
            # dynamic contact frame (mju_makeFrame, as collision._make_frames)
            use_y = jnp.abs(n[1]) < 0.5
            ax = [0.0, jnp.where(use_y, 1.0, 0.0), jnp.where(use_y, 0.0, 1.0)]
            t2 = vcross3(n, ax)
            t2n = jnp.maximum(jnp.sqrt(materialize(vdot3(t2, t2), ref0)), 1e-12)
            t2 = [materialize(t2[i], ref0) / t2n for i in range(3)]
            t1 = vcross3(t2, n)
            # n points capsule1 -> capsule2: J = J2 - J1, shared dofs cancel
            dof_coeff = {}
            for d in s.chains[b]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) + 1.0
            for d in s.chains[b1]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) - 1.0
            dof_coeff = {d: c for d, c in dof_coeff.items() if c != 0.0}
        else:  # sphere-sphere (collision._sphere_sphere semantics)
            b1 = pr.body1
            off1 = [float(x) for x in pr.sphere_off1]
            c1 = vadd3(xpos[b1], qrot(off1, xquat[b1]))
            delta = vsub3(center, c1)
            length = jnp.sqrt(materialize(vdot3(delta, delta), center[0]))
            inv_len = 1.0 / jnp.maximum(length, 1e-12)
            n = [materialize(delta[i], length) * inv_len for i in range(3)]
            dist = sub(length, pr.radius1 + pr.radius)
            cpos = vadd3(c1, vscale3(n, add(pr.radius1, mul(0.5, dist))))
            # dynamic contact frame (mju_makeFrame, as collision._make_frames)
            use_y = jnp.abs(n[1]) < 0.5
            ax = [0.0, jnp.where(use_y, 1.0, 0.0), jnp.where(use_y, 0.0, 1.0)]
            t2 = vcross3(n, ax)
            t2n = jnp.maximum(jnp.sqrt(materialize(vdot3(t2, t2), length)), 1e-12)
            t2 = [materialize(t2[i], length) / t2n for i in range(3)]
            t1 = vcross3(t2, n)
            # J = J2 - J1: shared (base) dofs cancel exactly (same offset)
            dof_coeff = {}
            for d in s.chains[b]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) + 1.0
            for d in s.chains[b1]:
                dof_coeff[d] = dof_coeff.get(d, 0.0) - 1.0
            dof_coeff = {d: c for d, c in dof_coeff.items() if c != 0.0}
        con_dist.append(dist)
        con_pos.append(cpos)

        offc = vsub3(cpos, com_root)
        jn, jt1, jt2 = {}, {}, {}
        dofs = sorted(dof_coeff)
        for d in dofs:
            ang, lin = cdof[d]
            jac3 = vscale3(vadd3(lin, vcross3(ang, offc)), dof_coeff[d])
            jn[d] = vdot3(n, jac3)
            jt1[d] = vdot3(t1, jac3)
            jt2[d] = vdot3(t2, jac3)
        mu = dr["pair_mu"][pi]
        jn_v = functools.reduce(add, [mul(jn[d], v[d]) for d in dofs])
        jt1_v = functools.reduce(add, [mul(jt1[d], v[d]) for d in dofs])
        jt2_v = functools.reduce(add, [mul(jt2[d], v[d]) for d in dofs])

        imp = _impedance(pr.solimp, dist)  # tile (dist is dynamic)
        K, Bc = _kb(pr.solref, pr.solimp)
        mu2 = mul(mu, mu)
        r_t = mul(mul(pr.invweight * 2.0 / s.impratio, mu2), add(1.0, mu2))
        base_R = jnp.maximum(
            (1.0 - imp) / jnp.maximum(imp, _MINVAL), _MINVAL
        )
        pen_active = dist < 0
        # facet order matches constraint.make_efc: [t1+, t1-, t2+, t2-].
        # The +/- facets share mu*jt products BIT-EXACTLY: IEEE gives
        # (-mu)*jt == -(mu*jt) and a + (-x) == a - x, so emitting the
        # product once and using sub for the - facet is the identical
        # value at half the muls (r5 op-count reduction; the old form
        # mul(mul(-1, mu), jt) emitted a fresh neg-side product chain
        # CSE cannot merge with the + side)
        base0 = neg(mul(mul(imp, K), dist))
        R = jnp.maximum(base_R * materialize(r_t, base_R), _MINVAL)
        D = jnp.where(pen_active, 1.0 / R, 0.0)
        for jt, jtv in ((jt1, jt1_v), (jt2, jt2_v)):
            mujt = {d: mul(mu, jt[d]) for d in dofs}
            mujtv = mul(mu, jtv)
            for pos_facet in (True, False):
                if pos_facet:
                    J = {d: add(jn[d], mujt[d]) for d in dofs}
                    jvel = add(jn_v, mujtv)
                else:
                    J = {d: sub(jn[d], mujt[d]) for d in dofs}
                    jvel = sub(jn_v, mujtv)
                aref = sub(base0, mul(Bc, jvel))
                rows_con.append(
                    _Row(J=J, aref=aref, D=D, R=R, floss=0.0, fric=False)
                )

    # ---- dof friction rows (static D/R) ----
    rows_fric = []
    for d in s.dof_frictional:
        imp = _impedance(tuple(s.dof_solimp[d]), 0.0)  # static float
        K, Bc = _kb(tuple(s.dof_solref[d]), tuple(s.dof_solimp[d]))
        R = max(max((1.0 - imp) / max(imp, _MINVAL), _MINVAL)
                * float(s.dof_invweight0[d]), _MINVAL)
        rows_fric.append(
            _Row(
                J={d: 1.0},
                aref=mul(-Bc, v[d]),
                D=1.0 / R,
                R=R,
                floss=float(s.dof_frictionloss[d]),
                fric=True,
            )
        )

    # ---- joint limit rows ----
    rows_lim = []
    for j in s.lim_joints:
        qa, d = s.jnt_qposadr[j], s.jnt_dofadr[j]
        lo, hi = float(s.jnt_range[j][0]), float(s.jnt_range[j][1])
        dist_lo = sub(q[qa], lo)
        dist_hi = sub(hi, q[qa])
        lower = materialize(dist_lo, v[0]) < materialize(dist_hi, v[0])
        side = jnp.where(lower, 1.0, -1.0)
        pos = jnp.where(
            lower, materialize(dist_lo, side), materialize(dist_hi, side)
        ) - float(s.jnt_margin[j])
        imp = _impedance(tuple(s.jnt_solimp[j]), pos)
        K, Bc = _kb(tuple(s.jnt_solref[j]), tuple(s.jnt_solimp[j]))
        jvel = mul(side, v[d])
        aref = sub(mul(-imp * K, pos), mul(Bc, jvel))
        R = jnp.maximum(
            jnp.maximum((1.0 - imp) / jnp.maximum(imp, _MINVAL), _MINVAL)
            * float(s.dof_invweight0[d]),
            _MINVAL,
        )
        D = jnp.where(pos < 0, 1.0 / R, 0.0)
        rows_lim.append(
            _Row(J={d: side}, aref=aref, D=D, R=R, floss=0.0, fric=False)
        )

    if PHASE_LIMIT == "efc":
        return _phase_out(qacc=qacc_smooth, qacc_smooth=qacc_smooth,
                          con_dist=con_dist, con_pos=con_pos)

    rows = rows_fric + rows_lim + rows_con
    qacc = _emit_newton(s, M, qacc_smooth, rows, v)

    if dr.get("_debug"):
        return dict(
            qacc=qacc, qacc_smooth=qacc_smooth, M=M, qfrc_bias=qfrc_bias,
            qfrc_act=qfrc_act, qfrc_passive=qfrc_passive, rows=rows,
            xpos=xpos, xquat=xquat, cvel=cvel, com_root=com_root, cdof=cdof,
            con_dist=con_dist, con_pos=con_pos,
        )

    return dict(
        qacc=qacc,
        qacc_smooth=qacc_smooth,
        xpos=xpos,
        xquat=xquat,
        cvel=cvel,
        com_root=com_root,
        qfrc_actuator=qfrc_act,
        con_dist=con_dist,
        con_pos=con_pos,
        sites=[
            vadd3(
                xpos[s.site_bodyid[i]],
                qrot([float(x) for x in s.site_pos[i]], xquat[s.site_bodyid[i]]),
            )
            for i in range(s.nsite)
        ],
    )


# ---------------------------------------------------------------------------
# sparse LDL^T over the kinematic-tree pattern (reverse elimination — the
# mj_factorM ordering, which is fill-in-free for tree-structured matrices)
# ---------------------------------------------------------------------------


def _ldl_factor_dict(s: _Static, M: Dict[Tuple[int, int], object], pattern):
    """Factor M = L^T D L (L unit lower, entries only on ``pattern``).
    Returns (L, D) with L as {k: {i: val}} for i in pattern(k)."""
    A = dict(M)
    L: Dict[int, Dict[int, object]] = {}
    D = [None] * s.nv
    for k in reversed(range(s.nv)):
        d = A[(k, k)]
        D[k] = d
        inv_d = 1.0 / d  # float or tile, both fine
        ancs = [i for i in range(k) if pattern[k, i]]
        c = {i: mul(A[(k, i)], inv_d) for i in ancs}
        for i in ancs:
            for jj in ancs:
                if jj <= i:
                    A[(i, jj)] = sub(A[(i, jj)], mul(c[i], A[(k, jj)]))
        L[k] = c
    return L, D


def _ldl_solve_fac(s: _Static, L, D, b, pattern):
    """Solve (L^T D L) x = b given the factor."""
    nv = s.nv
    # L^T y = b (unit upper): bottom-up
    y = [None] * nv
    for i in reversed(range(nv)):
        acc = b[i]
        for k in range(i + 1, nv):
            if pattern[k, i]:
                acc = sub(acc, mul(L[k][i], y[k]))
        y[i] = acc
    # z = y / D
    z = [mul(y[k], 1.0 / D[k]) for k in range(nv)]
    # L x = z (unit lower): top-down
    x = [None] * nv
    for k in range(nv):
        acc = z[k]
        for i in range(k):
            if pattern[k, i]:
                acc = sub(acc, mul(L[k][i], x[i]))
        x[k] = acc
    return x


def _ldl_solve_dict(s: _Static, M, b, pattern=None):
    pattern = s.anc if pattern is None else pattern
    L, D = _ldl_factor_dict(s, M, pattern)
    return _ldl_solve_fac(s, L, D, b, pattern)


def _sym_mv(s: _Static, M: Dict[Tuple[int, int], object], x):
    """Symmetric sparse matvec over the ancestor pattern."""
    out = [0.0] * s.nv
    for (j, k), val in M.items():
        out[j] = fma(out[j], val, x[k])
        if j != k:
            out[k] = fma(out[k], val, x[j])
    return out


# ---------------------------------------------------------------------------
# Newton solve with exact line search (solver.py semantics, SoA form)
# ---------------------------------------------------------------------------


def _emit_newton(s: _Static, M, qacc_smooth, rows: List["_Row"], v):
    x = list(qacc_smooth)
    nr = len(rows)
    if nr == 0:
        return x
    ref = None
    for val in x:
        if not _c(val):
            ref = val
            break

    for _ in range(max(s.solver_iterations, 1)):
        jar = []
        for r in rows:
            acc = neg(r.aref)
            for d, jv in r.J.items():
                acc = fma(acc, jv, x[d])
            jar.append(acc)

        # per-row force + quadratic-zone mask
        force, quadw = [], []
        for r, ja in zip(rows, jar):
            ja_t = materialize(ja, ref)
            if r.fric:
                thresh = r.floss * r.R  # static for friction rows
                quad = jnp.abs(ja_t) <= thresh
                f = jnp.where(quad, -r.D * ja_t, -jnp.sign(ja_t) * r.floss)
            else:
                quad = ja_t < 0
                f = jnp.where(quad, -materialize(r.D, ref) * ja_t, 0.0)
            force.append(f)
            quadw.append(
                jnp.where(quad, materialize(r.D, ref), 0.0)
            )

        dx0 = [sub(x[d], qacc_smooth[d]) for d in range(s.nv)]
        ma = _sym_mv(s, M, dx0)
        grad = list(ma)
        for r, f in zip(rows, force):
            for d, jv in r.J.items():
                grad[d] = sub(grad[d], mul(jv, f))

        # Hessian on the row-coupling pattern s.hess (r5): the tree
        # ancestor pattern plus a clique per collision pair plus symbolic
        # fill-in — exactly dense when leg-leg pairs demand it, tree-sparse
        # for flat/obstacle/hfield (see _Static)
        H = {
            (j, k): M.get((j, k), 0.0)
            for j in range(s.nv)
            for k in range(j + 1)
            if s.hess[j, k]
        }
        for r, w in zip(rows, quadw):
            dofs = list(r.J.keys())
            for a_i, d1 in enumerate(dofs):
                for d2 in dofs[: a_i + 1]:
                    hi, lo = (d1, d2) if d1 >= d2 else (d2, d1)
                    H[(hi, lo)] = fma(
                        H[(hi, lo)], mul(w, r.J[d1]), r.J[d2]
                    )
        dx = [neg(t) for t in _ldl_solve_dict(s, H, grad, pattern=s.hess)]

        # ---- exact line search (solver.py:97-139), rows stacked ----
        jv_rows = []
        for r in rows:
            acc = 0.0
            for d, jval in r.J.items():
                acc = fma(acc, jval, dx[d])
            jv_rows.append(acc)
        mdx = _sym_mv(s, M, dx)
        g0 = functools.reduce(add, [mul(dx[d], ma[d]) for d in range(s.nv)])
        h0 = jnp.maximum(
            materialize(
                functools.reduce(add, [mul(dx[d], mdx[d]) for d in range(s.nv)]),
                ref,
            ),
            1e-12,
        )
        g0 = materialize(g0, ref)

        # VMEM discipline: only the ONE-SIDED rows are stacked into
        # (n_os, SUB, LANE) arrays; the few friction rows stay unrolled so
        # no per-row constant arrays (floss/is_friction masks) are needed.
        os_rows = [i for i, r in enumerate(rows) if not r.fric]
        fr_rows = [i for i, r in enumerate(rows) if r.fric]
        jar_os = jnp.stack([materialize(jar[i], ref) for i in os_rows])
        jv_os = jnp.stack([materialize(jv_rows[i], ref) for i in os_rows])
        D_os = jnp.stack([materialize(rows[i].D, ref) for i in os_rows])
        jar_fr = [jar[i] for i in fr_rows]
        jv_fr = [jv_rows[i] for i in fr_rows]

        def dphi(alpha):
            # alpha: (SUB, LANE) -> phi'(alpha): (SUB, LANE)
            jar_a = jar_os + alpha[None] * jv_os
            acc = jnp.sum(jnp.minimum(D_os * jar_a, 0.0) * jv_os, axis=0)
            for i, (ja, jv) in enumerate(zip(jar_fr, jv_fr)):
                r = rows[fr_rows[i]]
                dja = mul(r.D, add(ja, mul(alpha, jv)))
                sval = jnp.clip(materialize(dja, ref), -r.floss, r.floss)
                acc = acc + sval * materialize(jv, ref)
            return g0 + alpha * h0 + acc
        # Illinois regula falsi instead of solver.py's every-breakpoint
        # sweep: phi' is monotone piecewise linear, so secant steps land
        # exactly once the bracket is inside one segment; the Illinois
        # halving guarantees bracket progress. ~40 O(nefc) dphi evals
        # instead of O(nefc^2), which matters at nefc=152 uncapped rows.
        hi = jnp.full_like(ref, 1.0)

        def expand(i, hi):
            # grow until phi'(hi) > 0 (root may sit beyond any kink;
            # phi' eventually increases with slope >= h0)
            return jnp.where(dphi(hi) <= 0, hi * 4.0, hi)

        hi = jax.lax.fori_loop(0, LS_EXPAND_ITERS, expand, hi)
        lo = jnp.zeros_like(hi)
        f_lo = dphi(lo)
        f_hi = dphi(hi)

        def illinois(i, carry):
            lo, f_lo, hi, f_hi, side = carry
            denom = f_hi - f_lo
            denom = jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
            mid = hi - f_hi * (hi - lo) / denom
            # keep mid strictly inside the bracket
            mid = jnp.clip(mid, lo, hi)
            fm = dphi(mid)
            take_lo = fm <= 0  # root in [mid, hi]
            new_lo = jnp.where(take_lo, mid, lo)
            new_flo = jnp.where(take_lo, fm, f_lo)
            new_hi = jnp.where(take_lo, hi, mid)
            new_fhi = jnp.where(take_lo, f_hi, fm)
            # Illinois: same-side repeat halves the opposite f value
            rep_lo = take_lo & (side == 1)
            rep_hi = (~take_lo) & (side == -1)
            new_fhi = jnp.where(rep_lo, new_fhi * 0.5, new_fhi)
            new_flo = jnp.where(rep_hi, new_flo * 0.5, new_flo)
            new_side = jnp.where(take_lo, 1, -1)
            return new_lo, new_flo, new_hi, new_fhi, new_side

        side0 = jnp.zeros_like(hi, jnp.int32)
        lo, _, hi, _, _ = jax.lax.fori_loop(
            0, LS_ILLINOIS_ITERS, illinois, (lo, f_lo, hi, f_hi, side0)
        )
        # final exact secant on the (now segment-local) bracket with
        # un-scaled phi' values
        f_lo = dphi(lo)
        f_hi = dphi(hi)
        slope = jnp.maximum((f_hi - f_lo) / jnp.maximum(hi - lo, 1e-30), 1e-12)
        alpha = jnp.maximum(lo - f_lo / slope, 0.0)

        x = [add(x[d], mul(alpha, dx[d])) for d in range(s.nv)]

    return x


# ---------------------------------------------------------------------------
# semi-implicit Euler (integrate.py semantics)
# ---------------------------------------------------------------------------


def _emit_integrate(s: _Static, q, v, qacc):
    dt = s.timestep
    v2 = [add(v[d], mul(dt, qacc[d])) for d in range(s.nv)]
    q2 = list(q)
    for j in range(s.njnt):
        qa, d = s.jnt_qposadr[j], s.jnt_dofadr[j]
        if s.jnt_type[j] == JNT_HINGE:
            q2[qa] = add(q[qa], mul(dt, v2[d]))
        else:  # free joint
            for i in range(3):
                q2[qa + i] = add(q[qa + i], mul(dt, v2[d + i]))
            # quat_integrate (ops.math): body-frame omega exponential map
            om = [v2[d + 3], v2[d + 4], v2[d + 5]]  # tiles by construction
            norm = jnp.sqrt(vdot3(om, om))
            axis_den = jnp.where(norm < 1e-12, 1.0, norm)
            axis = [om[i] / axis_den for i in range(3)]
            half = 0.5 * norm * dt
            ch, sh = jnp.cos(half), jnp.sin(half)
            dq = [ch, axis[0] * sh, axis[1] * sh, axis[2] * sh]
            quat = [q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6]]
            out = qmul(quat, dq)
            on = jax.lax.rsqrt(
                add(
                    add(mul(out[0], out[0]), mul(out[1], out[1])),
                    add(mul(out[2], out[2]), mul(out[3], out[3])),
                )
            )
            for i in range(4):
                q2[qa + 3 + i] = mul(out[i], on)
    return q2, v2


# ---------------------------------------------------------------------------
# kernel builder + public batched API
# ---------------------------------------------------------------------------


def _emit_caches(s: _Static, fw, out_ref, ref):
    """Write the last-forward caches into the (ncache, SUB, LANE) out ref."""

    def put(name, values):
        r0, n = s.cache_rows[name]
        assert len(values) == n, (name, len(values), n)
        for i, val in enumerate(values):
            out_ref[r0 + i] = materialize(val, ref)

    put("qacc", fw["qacc"])
    xpos_flat = []
    for b in range(s.nbody):
        xpos_flat.extend(fw["xpos"][b])
    put("xpos", xpos_flat)
    xq = []
    for b in range(1, s.nbody):
        xq.extend(fw["xquat"][b])
    put("xquat", xq)
    ang_l, vel_l = _link_velocities(s, fw)
    put("xd_ang", [c for a in ang_l for c in a])
    put("xd_vel", [c for vv in vel_l for c in vv])
    sites = []
    for sxyz in fw["sites"]:
        sites.extend(sxyz)
    put("site_xpos", sites)
    put("qfrc_actuator", fw["qfrc_actuator"])
    put("con_dist", fw["con_dist"])
    cpos = []
    for p3 in fw["con_pos"]:
        cpos.extend(p3)
    put("con_pos", cpos)


@with_cse
def _emit_substeps(s: _Static, q, v, ctrl, dr, n_substeps: int):
    """Emit the n_substeps pipeline: all-but-last substeps via a fori_loop
    of (forward + integrate), then the final forward. Returns
    (q, v, fw) with q/v the state BEFORE the final integrate and fw the
    last forward pass — the step's cache source. Shared by the physics
    kernel and the fused env-step kernel."""
    ref = q[0]
    if n_substeps > 1:
        def body(_, carry):
            # fresh CSE scope: the body is a NESTED trace — memo entries
            # whose results are body-trace tracers must not leak into the
            # outer kernel trace (outer-scope hits inside here are fine:
            # capturing an outer value in the loop body is legal)
            with cse_scope(fresh=True):
                qs, vs = carry
                ql = [qs[i] for i in range(s.nq)]
                vl = [vs[i] for i in range(s.nv)]
                fw = _emit_forward(s, ql, vl, ctrl, dr)
                q2, v2 = _emit_integrate(s, ql, vl, fw["qacc"])
                return (
                    jnp.stack([materialize(t, ref) for t in q2]),
                    jnp.stack([materialize(t, ref) for t in v2]),
                )

        qs, vs = jax.lax.fori_loop(
            0, n_substeps - 1, body,
            (
                jnp.stack([materialize(t, ref) for t in q]),
                jnp.stack([materialize(t, ref) for t in v]),
            ),
        )
        q = [qs[i] for i in range(s.nq)]
        v = [vs[i] for i in range(s.nv)]

    fw = _emit_forward(s, q, v, ctrl, dr)
    return q, v, fw


def _link_velocities(s: _Static, fw):
    """World-frame per-link velocities from the forward caches
    (pipeline._make_state semantics): ang = cvel_ang,
    vel = cvel_lin + ang x (xpos - com_root). Returns (xd_ang, xd_vel)
    lists indexed by body-1 (world dropped)."""
    xd_ang, xd_vel = [], []
    for b in range(1, s.nbody):
        ang, lin = fw["cvel"][b]
        off = vsub3(fw["xpos"][b], fw["com_root"])
        vel = vadd3(lin, vcross3(ang, off))
        xd_ang.append(ang)
        xd_vel.append(vel)
    return xd_ang, xd_vel


def _build_kernel(s: _Static, n_substeps: int, integrate: bool):
    """Kernel: (q, v, ctrl, dr) -> (q', v', caches-of-last-forward)."""

    def kernel(q_ref, v_ref, ctrl_ref, dr_ref, qout_ref, vout_ref, cache_ref):
        with cse_scope():
            q = [q_ref[i] for i in range(s.nq)]
            v = [v_ref[i] for i in range(s.nv)]
            ctrl = [ctrl_ref[i] for i in range(s.nu)]
            dr = {
                name: [dr_ref[r0 + i] for i in range(n)]
                for name, (r0, n) in s.dr_rows.items()
            }
            ref = q[0]

            q, v, fw = _emit_substeps(s, q, v, ctrl, dr, n_substeps)
            _emit_caches(s, fw, cache_ref, ref)
            if integrate:
                q2, v2 = _emit_integrate(s, q, v, fw["qacc"])
            else:
                q2, v2 = q, v
            for i in range(s.nq):
                qout_ref[i] = materialize(q2[i], ref)
            for i in range(s.nv):
                vout_ref[i] = materialize(v2[i], ref)

    return kernel


def _to_tiles(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """(B, rows) -> (rows, B/LANE, LANE) tile layout."""
    rows = x.shape[1] if x.ndim == 2 else 1
    xt = x.reshape(B, rows).T
    return xt.reshape(rows, B // LANE, LANE)


def _from_tiles(x: jnp.ndarray, B: int) -> jnp.ndarray:
    """(rows, B/LANE, LANE) -> (B, rows)."""
    rows = x.shape[0]
    return x.reshape(rows, B).T


def step_batched(
    s: _Static,
    qpos: jnp.ndarray,  # (B, nq)
    qvel: jnp.ndarray,  # (B, nv)
    ctrl: jnp.ndarray,  # (B, nu)
    dr: Dict[str, jnp.ndarray],  # name -> (B, n) per-env parameter rows
    n_substeps: int,
    integrate: bool = True,
    interpret: bool = False,
):
    """Run the fused SoA kernel over the env batch.

    Returns (qpos', qvel', caches) with caches a dict of (B, n) arrays per
    the _Static.cache_rows map. B is padded to a TILE_B multiple internally.
    """
    B = qpos.shape[0]
    Bp = ((B + TILE_B - 1) // TILE_B) * TILE_B
    dtype = jnp.float32

    def pad(x):
        x = x.astype(dtype)
        if Bp == B:
            return x
        pad_width = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, mode="edge")

    q_t = _to_tiles(pad(qpos), Bp)
    v_t = _to_tiles(pad(qvel), Bp)
    c_t = _to_tiles(pad(ctrl), Bp)
    dr_rows = []
    for name, (r0, n) in sorted(s.dr_rows.items(), key=lambda kv: kv[1][0]):
        x = pad(dr[name].reshape(B, n))
        dr_rows.append(x)
    dr_t = _to_tiles(jnp.concatenate(dr_rows, axis=1), Bp)

    nb = Bp // TILE_B
    kernel = _build_kernel(s, n_substeps, integrate)

    def spec(rows):
        return pl.BlockSpec(
            (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    qout, vout, cache = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[spec(s.nq), spec(s.nv), spec(s.nu), spec(s.ndr)],
        out_specs=[spec(s.nq), spec(s.nv), spec(s.ncache)],
        out_shape=[
            jax.ShapeDtypeStruct((s.nq, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((s.nv, Bp // LANE, LANE), dtype),
            jax.ShapeDtypeStruct((s.ncache, Bp // LANE, LANE), dtype),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the fused program's live set + block buffers exceed the
            # default 16M scoped-vmem budget; v5e VMEM is larger
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q_t, v_t, c_t, dr_t)

    qpos2 = _from_tiles(qout, Bp)[:B]
    qvel2 = _from_tiles(vout, Bp)[:B]
    cache_b = _from_tiles(cache, Bp)[:B]
    caches = {
        name: cache_b[:, r0 : r0 + n]
        for name, (r0, n) in s.cache_rows.items()
    }
    return qpos2, qvel2, caches


def dr_inputs(m: RobotModel, s: _Static, B: int) -> Dict[str, jnp.ndarray]:
    """Assemble the per-env parameter rows from (possibly DR-batched) model
    leaves; unbatched leaves are broadcast over the env batch. Batched-ness
    is detected by rank (each DR leaf has a fixed unbatched rank)."""

    def rows(x, unbatched_ndim, n):
        x = jnp.asarray(x)
        if x.ndim == unbatched_ndim + 1:  # leading env axis present
            return x.reshape(x.shape[0], n)
        return jnp.broadcast_to(x.reshape(n)[None], (B, n))

    out = {
        "mass": rows(m.body_mass, 1, s.nbody),
        "inertia": rows(m.body_inertia, 2, s.nbody * 3),
        "ipos": rows(m.body_ipos, 2, s.nbody * 3),
        "gain0": rows(m.actuator_gainprm[..., 0], 1, s.nu),
        "bias1": rows(m.actuator_biasprm[..., 1], 1, s.nu),
        "bias2": rows(m.actuator_biasprm[..., 2], 1, s.nu),
    }
    # per-pair combined slide friction = max of the two geoms
    # (collision._combine semantics)
    gf = rows(m.geom_friction[..., 0], 1, len(m.geom_bodyid))  # (B, ngeom)
    out["pair_mu"] = jnp.stack(
        [jnp.maximum(gf[:, pr.geom1], gf[:, pr.geom2]) for pr in s.pairs],
        axis=1,
    )
    return out
