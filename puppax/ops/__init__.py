"""puppax.ops — low-level math and compute kernels.

Quaternion / spatial-vector math used by the physics engine and the env
layer. Conventions follow MuJoCo: quaternions are (w, x, y, z); spatial
vectors are 6-vectors with the angular part first ``[ang(3); lin(3)]``.
"""

from puppax.ops.math import (  # noqa: F401
    ad_dual,
    euler_to_quat,
    inert_mul,
    motion_cross,
    motion_cross_force,
    normalize,
    quat_integrate,
    quat_inv,
    quat_mul,
    quat_to_mat,
    rotate,
    rotate_inv,
    transform_inertia,
    transform_motion,
)
