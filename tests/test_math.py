"""Quaternion/spatial math vs the MuJoCo C oracle (mju_* functions)."""

import mujoco
import numpy as np
import jax.numpy as jnp
import pytest

from vnl_tpu import math as vmath


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def f64_zeros_like(a):
    return np.zeros(np.shape(a), dtype=np.float64)


def test_quat_mul(rng):
    u, v = random_quats(rng), random_quats(rng)
    got = np.asarray(vmath.quat_mul(jnp.asarray(u), jnp.asarray(v)))
    want = f64_zeros_like(got)
    for i in range(len(u)):
        mujoco.mju_mulQuat(want[i], u[i], v[i])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_rotate(rng):
    q = random_quats(rng)
    v = rng.normal(size=(len(q), 3))
    got = np.asarray(vmath.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = f64_zeros_like(got)
    for i in range(len(q)):
        mujoco.mju_rotVecQuat(want[i], v[i], q[i])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_to_mat_roundtrip(rng):
    q = random_quats(rng)
    m = np.asarray(vmath.quat_to_mat(jnp.asarray(q)))
    want = np.zeros((len(q), 9), dtype=np.float64)
    for i in range(len(q)):
        mujoco.mju_quat2Mat(want[i], q[i])
    np.testing.assert_allclose(m.reshape(len(q), 9), want, atol=1e-6)

    q2 = np.asarray(vmath.mat_to_quat(jnp.asarray(m)))
    # Defined up to sign; our convention canonicalizes w >= 0.
    dot = np.abs(np.sum(q2 * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_axis_angle(rng):
    axis = rng.normal(size=(32, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng.uniform(-3.0, 3.0, size=(32,))
    got = np.asarray(vmath.axis_angle_to_quat(jnp.asarray(axis), jnp.asarray(angle)))
    want = np.zeros((32, 4), dtype=np.float64)
    for i in range(32):
        mujoco.mju_axisAngle2Quat(want[i], axis[i], angle[i])
    np.testing.assert_allclose(got, want, atol=1e-6)

    # Roundtrip through rotation-vector form.
    rv = np.asarray(vmath.quat_to_axis_angle(jnp.asarray(got)))
    np.testing.assert_allclose(rv, axis * angle[:, None], atol=1e-5)


def test_quat_integrate(rng):
    q = random_quats(rng, 32)
    w = rng.normal(size=(32, 3))
    dt = 0.013
    got = np.asarray(vmath.quat_integrate(jnp.asarray(q), jnp.asarray(w), dt))
    want = q.copy()
    for i in range(32):
        mujoco.mju_quatIntegrate(want[i], w[i], dt)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat_diff_identity(rng):
    q = random_quats(rng, 8)
    d = np.asarray(vmath.quat_diff(jnp.asarray(q), jnp.asarray(q)))
    np.testing.assert_allclose(d[:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(d[:, 1:], 0.0, atol=1e-6)


def test_bounded_quat_dist(rng):
    # identical quats -> 0; q vs -q -> 0 (double cover); orthogonal -> pi/2 bound
    q = random_quats(rng, 16)
    d0 = np.asarray(vmath.bounded_quat_dist(jnp.asarray(q), jnp.asarray(q)))
    np.testing.assert_allclose(d0, 0.0, atol=1e-3)
    dneg = np.asarray(vmath.bounded_quat_dist(jnp.asarray(q), jnp.asarray(-q)))
    np.testing.assert_allclose(dneg, 0.0, atol=1e-3)
    assert np.all(np.asarray(
        vmath.bounded_quat_dist(jnp.asarray(q), jnp.asarray(np.roll(q, 1, 0)))) <= np.pi / 2 + 1e-6)


def test_euler_to_quat_intrinsic_xyz(rng):
    e = rng.uniform(-1.5, 1.5, size=(16, 3))
    q = np.asarray(vmath.euler_to_quat(jnp.asarray(e), "xyz"))
    # intrinsic xyz == Rx @ Ry @ Rz
    def rot(axis, a):
        K = np.zeros((3, 3))
        i, j = {"x": (1, 2), "y": (2, 0), "z": (0, 1)}[axis]
        K[i, j], K[j, i] = -1.0, 1.0
        return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    for i in range(16):
        want = rot("x", e[i, 0]) @ rot("y", e[i, 1]) @ rot("z", e[i, 2])
        got = np.asarray(vmath.quat_to_mat(jnp.asarray(q[i])))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_spatial_inertia_against_pointmass():
    # Point mass m at com c about origin: ang block = m*(|c|^2 I - c c^T)
    m = jnp.asarray(2.0)
    com = jnp.asarray([0.3, -0.2, 0.5])
    I6 = np.asarray(vmath.inertia_at_point(
        m, jnp.zeros(3), jnp.eye(3), com, jnp.zeros(3)))
    c = np.asarray(com)
    want_aa = 2.0 * (np.dot(c, c) * np.eye(3) - np.outer(c, c))
    np.testing.assert_allclose(I6[:3, :3], want_aa, atol=1e-6)
    np.testing.assert_allclose(I6[3:, 3:], 2.0 * np.eye(3), atol=1e-6)
    # force = I * motion for pure linear acceleration: f = m*a, torque = c x m*a
    a = np.array([0.0, 0.0, -9.81])
    f = I6 @ np.concatenate([np.zeros(3), a])
    np.testing.assert_allclose(f[3:], 2.0 * a, atol=1e-6)
    np.testing.assert_allclose(f[:3], np.cross(c, 2.0 * a), atol=1e-6)
