"""Quaternion and spatial-vector algebra (MuJoCo conventions, batch-first).

All functions broadcast over leading batch dimensions and preserve input
dtype, so the same code runs fp64 under the CPU test oracle and fp32/bf16 on
TPU.
"""

from vnl_tpu.math.quaternion import (
    axis_angle_to_quat,
    bounded_quat_dist,
    mat_to_quat,
    normalize,
    quat_conj,
    quat_diff,
    quat_integrate,
    quat_inv,
    quat_mul,
    quat_rotate,
    quat_rotate_inv,
    quat_to_axis_angle,
    quat_to_mat,
    euler_to_quat,
)
from vnl_tpu.math.spatial import (
    motion_cross,
    force_cross,
    transform_motion,
    transform_force,
    inertia_at_point,
)
