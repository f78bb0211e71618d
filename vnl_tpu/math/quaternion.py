"""Quaternion algebra, MuJoCo (w, x, y, z) convention.

Provides the transform semantics the reference framework relies on
(cf. /root/reference/preprocessing/transformations.py:30-139 and
/root/reference/envs/rodent.py:450-470) re-implemented batch-first: every op
broadcasts over arbitrary leading dimensions so it can live inside
vmap/scan-compiled physics and feature pipelines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Guard used when extracting the rotation axis near the identity rotation.
_POLE_EPS = 1e-9


def normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalizes vectors along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u * v; (..., 4) x (..., 4) -> (..., 4)."""
    uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vw - ux * vx - uy * vy - uz * vz,
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse of a (possibly non-unit) quaternion."""
    return quat_conj(q) / jnp.sum(jnp.square(q), axis=-1, keepdims=True)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotates vector(s) v by unit quaternion(s) q: R(q) @ v."""
    # v' = v + 2 * qw * (qv x v) + 2 * qv x (qv x v)
    qw = q[..., :1]
    qv = q[..., 1:]
    c1 = jnp.cross(qv, v)
    return v + 2.0 * (qw * c1 + jnp.cross(qv, c1))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotates v by the inverse of unit quaternion q: R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix, shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w >= 0 branch-free Shepperd)."""
    # Branch-free: compute all four candidate quaternions scaled by 4w, 4x,
    # 4y, 4z respectively and pick the best-conditioned one.
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    qs = jnp.stack(
        [
            1.0 + tr,
            1.0 + m[..., 0, 0] - m[..., 1, 1] - m[..., 2, 2],
            1.0 - m[..., 0, 0] + m[..., 1, 1] - m[..., 2, 2],
            1.0 - m[..., 0, 0] - m[..., 1, 1] + m[..., 2, 2],
        ],
        axis=-1,
    )
    case = jnp.argmax(qs, axis=-1)

    def build(i):
        s2 = jnp.maximum(qs[..., i], 1e-12)
        s = jnp.sqrt(s2)  # = 2*|comp_i|
        if i == 0:
            q = jnp.stack(
                [s2, m[..., 2, 1] - m[..., 1, 2],
                 m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]],
                axis=-1,
            )
        elif i == 1:
            q = jnp.stack(
                [m[..., 2, 1] - m[..., 1, 2], s2,
                 m[..., 0, 1] + m[..., 1, 0], m[..., 0, 2] + m[..., 2, 0]],
                axis=-1,
            )
        elif i == 2:
            q = jnp.stack(
                [m[..., 0, 2] - m[..., 2, 0], m[..., 0, 1] + m[..., 1, 0],
                 s2, m[..., 1, 2] + m[..., 2, 1]],
                axis=-1,
            )
        else:
            q = jnp.stack(
                [m[..., 1, 0] - m[..., 0, 1], m[..., 0, 2] + m[..., 2, 0],
                 m[..., 1, 2] + m[..., 2, 1], s2],
                axis=-1,
            )
        return q / (2.0 * s[..., None])

    cands = jnp.stack([build(i) for i in range(4)], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # Canonicalize sign: w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0).astype(q.dtype)
    return normalize(q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis (..., 3) + angle (...) -> quaternion."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation vector axis*angle, shape (..., 3).

    Matches the pole-guarded behaviour of the reference transform lib
    (/root/reference/preprocessing/transformations.py:117-139): near identity
    the result smoothly approaches 2*qv.
    """
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    w = q[..., 0]
    angle = 2.0 * jnp.arctan2(sin_half, w)
    # Wrap to (-pi, pi] so small negative rotations stay small.
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    scale = jnp.where(sin_half > _POLE_EPS, angle / jnp.maximum(sin_half, _POLE_EPS), 2.0)
    return q[..., 1:] * scale[..., None]


def quat_diff(u: jax.Array, v: jax.Array) -> jax.Array:
    """Relative rotation u^-1 * v (local-frame difference)."""
    return quat_mul(quat_conj(u), v)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrates unit quaternion q by angular velocity omega over dt.

    omega is expressed in the same (local) frame MuJoCo uses for free/ball
    joint velocities; matches mju_quatIntegrate: q <- q * exp(0.5*omega*dt).
    """
    angle = jnp.linalg.norm(omega, axis=-1) * dt
    axis = normalize(omega)
    dq = axis_angle_to_quat(axis, angle)
    return normalize(quat_mul(q, dq))


def euler_to_quat(euler: jax.Array, seq: str = "xyz") -> jax.Array:
    """MJCF euler attribute -> quaternion.

    MuJoCo's compiler (eulerseq, default "xyz") composes rotations about the
    axes of the *moving* frame: q = q_x * q_y * q_z for "xyz".
    Angles are radians here; degree conversion happens in the parser.
    """
    basis = {"x": jnp.array([1.0, 0.0, 0.0]),
             "y": jnp.array([0.0, 1.0, 0.0]),
             "z": jnp.array([0.0, 0.0, 1.0])}
    q = None
    for i, ax in enumerate(seq):
        axis = basis[ax.lower()].astype(euler.dtype)
        angle = euler[..., i]
        qi = axis_angle_to_quat(jnp.broadcast_to(axis, euler[..., :3].shape), angle)
        if ax.islower():  # intrinsic: post-multiply
            q = qi if q is None else quat_mul(q, qi)
        else:  # extrinsic: pre-multiply
            q = qi if q is None else quat_mul(qi, q)
    return normalize(q)


def bounded_quat_dist(source: jax.Array, target: jax.Array) -> jax.Array:
    """Quaternion distance bounded to [0, pi/2], shape (..., 1).

    Semantics of /root/reference/envs/rodent.py:450-470 (dm_control lineage):
    dist = 0.5*arccos(2*<s,t>^2 - 1).
    """
    source = normalize(source)
    target = normalize(target)
    dist = 2.0 * jnp.sum(source * target, axis=-1) ** 2 - 1.0
    dist = jnp.minimum(1.0, dist)
    return 0.5 * jnp.arccos(dist)[..., None]
