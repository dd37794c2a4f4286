"""Analytic narrowphase collision for the pupper model class.

Supported pair types (everything the reference model + obstacle terrain
produces): plane-sphere, sphere-sphere, sphere-box. All candidate pairs are
evaluated every step with fixed shapes; the reference's MJX contact caps
(``max_geom_pairs`` per pair type, then ``max_contact_points`` overall,
/root/reference/test/test_pupper_model.xml:227-230 via
utils.set_mjx_custom_options) are applied as dynamic top-k selections by
penetration depth — fully static shapes, no ragged gathers, TPU-friendly.

Contact conventions match MuJoCo: ``dist`` < 0 means penetration, the
frame's first row is the normal pointing from geom1 into geom2, ``pos`` is
the midpoint of the overlap, and per-contact friction/solref/solimp are
combined from both geoms (solmix-weighted average for solref/solimp,
elementwise max for friction — verified against mjData in
tests/test_physics_constraint.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from puppax.model.mjcf import RobotModel
from puppax.physics.smooth import Kinematics


class Contacts(NamedTuple):
    """Fixed-size contact set (ncon = max_contact_points)."""

    dist: jnp.ndarray  # (ncon,) penetration (<0) or large positive for pads
    pos: jnp.ndarray  # (ncon, 3)
    frame: jnp.ndarray  # (ncon, 3, 3) rows = [normal, tangent1, tangent2]
    friction: jnp.ndarray  # (ncon, 2) tangential friction coefficients
    solref: jnp.ndarray  # (ncon, 2)
    solimp: jnp.ndarray  # (ncon, 5)
    invweight: jnp.ndarray  # (ncon,) body_invweight0 lin sum of the two bodies
    geom1: jnp.ndarray  # (ncon,) int
    geom2: jnp.ndarray  # (ncon,) int
    body1: jnp.ndarray  # (ncon,) int
    body2: jnp.ndarray  # (ncon,) int


_PAD_DIST = 1e10


def _make_frame(n: jnp.ndarray) -> jnp.ndarray:
    """Contact frame from a unit normal (MuJoCo mju_makeFrame semantics):
    tangent1 = normalized projection of the smallest-|component| world axis,
    tangent2 = normal x tangent1."""
    an = jnp.abs(n)
    # MuJoCo's selection: x if strictly smallest, else y if |y|<|z|, else z
    use_x = (an[0] < an[1]) & (an[0] < an[2])
    use_y = (~use_x) & (an[1] < an[2])
    axis = jnp.where(
        use_x,
        jnp.array([1.0, 0.0, 0.0], n.dtype),
        jnp.where(
            use_y,
            jnp.array([0.0, 1.0, 0.0], n.dtype),
            jnp.array([0.0, 0.0, 1.0], n.dtype),
        ),
    )
    t1 = axis - n * jnp.dot(n, axis)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def _combine(m: RobotModel, g1: int, g2: int):
    """Per-contact parameter combination (priorities equal, solmix default):
    friction = elementwise max, solref/solimp = mean."""
    friction = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
    # MuJoCo contact friction = [slide, slide, torsion, roll, roll]; both
    # tangential directions use the slide coefficient
    tangential = jnp.stack([friction[0], friction[0]])
    solref = 0.5 * (m.geom_solref[g1] + m.geom_solref[g2])
    solimp = 0.5 * (m.geom_solimp[g1] + m.geom_solimp[g2])
    geom_bodyid = jnp.asarray(m.geom_bodyid, jnp.int32)
    b1, b2 = geom_bodyid[g1], geom_bodyid[g2]
    invweight = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
    return tangential.astype(solref.dtype), solref, solimp, invweight


def _plane_sphere(m: RobotModel, kin: Kinematics, g1: int, g2: int):
    n = kin.geom_xmat[g1][:, 2]  # plane normal = local z axis
    center = kin.geom_xpos[g2]
    r = m.geom_size[g2, 0]
    dist = jnp.dot(n, center - kin.geom_xpos[g1]) - r
    pos = center - n * (r + 0.5 * dist)
    return dist, pos, _make_frame(n)


def _sphere_sphere(m: RobotModel, kin: Kinematics, g1: int, g2: int):
    c1, c2 = kin.geom_xpos[g1], kin.geom_xpos[g2]
    r1, r2 = m.geom_size[g1, 0], m.geom_size[g2, 0]
    delta = c2 - c1
    length = jnp.linalg.norm(delta)
    n = delta / jnp.maximum(length, 1e-12)
    dist = length - (r1 + r2)
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist, pos, _make_frame(n)


def _sphere_box(m: RobotModel, kin: Kinematics, g1: int, g2: int):
    """Sphere (geom1) vs box (geom2); normal points from sphere into box."""
    center = kin.geom_xpos[g1]
    r = m.geom_size[g1, 0]
    box_pos = kin.geom_xpos[g2]
    box_mat = kin.geom_xmat[g2]
    half = m.geom_size[g2]
    # sphere center in box frame
    p = box_mat.T @ (center - box_pos)
    clamped = jnp.clip(p, -half, half)
    inside = jnp.all(jnp.abs(p) < half)

    # outside: closest point on surface
    delta_out = p - clamped
    dist_out = jnp.linalg.norm(delta_out)
    n_out = -delta_out / jnp.maximum(dist_out, 1e-12)  # from sphere to box
    surf_out = clamped

    # inside: push out along the nearest face
    gaps = half - jnp.abs(p)
    k = jnp.argmin(gaps)
    sign = jnp.sign(p[k])
    sign = jnp.where(sign == 0, 1.0, sign)
    n_in = jnp.zeros(3, p.dtype).at[k].set(-sign)  # from sphere toward face
    dist_in = -gaps[k]
    surf_in = p.at[k].set(sign * half[k])

    dist_local = jnp.where(inside, dist_in, dist_out) - r
    n_local = jnp.where(inside, n_in, n_out)
    surf_local = jnp.where(inside, surf_in, clamped)

    n = box_mat @ n_local
    surface = box_pos + box_mat @ surf_local
    sphere_surface = center + n * r
    pos = 0.5 * (sphere_surface + surface)
    return dist_local, pos, _make_frame(n)


def _top_k_mask_concat(items, k):
    """Select top-k most-penetrating rows from stacked contact arrays."""
    dist = items[0]
    if dist.shape[0] <= k:
        return items
    _, idx = jax.lax.top_k(-dist, k)
    return tuple(x[idx] for x in items)


def collide(m: RobotModel, kin: Kinematics) -> Contacts:
    """Evaluate all candidate pairs, apply per-type and global top-k caps."""
    dtype = kin.geom_xpos.dtype
    groups = []
    for pairs, fn in (
        (m.pairs_plane_sphere, _plane_sphere),
        (m.pairs_sphere_sphere, _sphere_sphere),
        (m.pairs_sphere_box, _sphere_box),
    ):
        if not pairs:
            continue
        g1_arr = jnp.asarray([p[0] for p in pairs], jnp.int32)
        g2_arr = jnp.asarray([p[1] for p in pairs], jnp.int32)
        dist, pos, frame = jax.vmap(lambda a, b: fn(m, kin, a, b))(g1_arr, g2_arr)
        fri, sref, simp, iw = jax.vmap(lambda a, b: _combine(m, a, b))(
            g1_arr, g2_arr
        )
        geom_bodyid = jnp.asarray(m.geom_bodyid, jnp.int32)
        group = (
            dist,
            pos,
            frame,
            fri,
            sref,
            simp,
            iw,
            g1_arr,
            g2_arr,
            geom_bodyid[g1_arr],
            geom_bodyid[g2_arr],
        )
        # per-type pair cap (reference MJX max_geom_pairs semantics)
        groups.append(_top_k_mask_concat(group, m.max_geom_pairs))

    ncon = m.max_contact_points
    if not groups:
        return Contacts(
            dist=jnp.full((ncon,), _PAD_DIST, dtype),
            pos=jnp.zeros((ncon, 3), dtype),
            frame=jnp.tile(jnp.eye(3, dtype=dtype), (ncon, 1, 1)),
            friction=jnp.ones((ncon, 2), dtype),
            solref=jnp.tile(jnp.asarray([0.02, 1.0], dtype), (ncon, 1)),
            solimp=jnp.tile(
                jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype), (ncon, 1)
            ),
            invweight=jnp.zeros((ncon,), dtype),
            geom1=jnp.zeros((ncon,), jnp.int32),
            geom2=jnp.zeros((ncon,), jnp.int32),
            body1=jnp.zeros((ncon,), jnp.int32),
            body2=jnp.zeros((ncon,), jnp.int32),
        )

    merged = tuple(
        jnp.concatenate([g[i] for g in groups]) for i in range(len(groups[0]))
    )
    n_all = merged[0].shape[0]
    if n_all > ncon:
        merged = _top_k_mask_concat(merged, ncon)
    elif n_all < ncon:
        pad = ncon - n_all
        padded = []
        for i, x in enumerate(merged):
            if i == 0:  # dist
                fill = jnp.full((pad,), _PAD_DIST, x.dtype)
            elif x.dtype in (jnp.int32, jnp.int64):
                fill = jnp.zeros((pad,) + x.shape[1:], x.dtype)
            elif i == 2:  # frame
                fill = jnp.tile(jnp.eye(3, dtype=x.dtype), (pad, 1, 1))
            else:
                fill = jnp.ones((pad,) + x.shape[1:], x.dtype)
            padded.append(jnp.concatenate([x, fill]))
        merged = tuple(padded)

    return Contacts(
        dist=merged[0],
        pos=merged[1],
        frame=merged[2],
        friction=merged[3],
        solref=merged[4],
        solimp=merged[5],
        invweight=merged[6],
        geom1=merged[7],
        geom2=merged[8],
        body1=merged[9],
        body2=merged[10],
    )
