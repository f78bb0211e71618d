"""Spatial (6D) vector algebra, Featherstone/MuJoCo conventions.

A spatial motion vector is ``[angular(3), linear(3)]``; a spatial force vector
is ``[torque(3), force(3)]``.  All bodies of a kinematic tree are expressed in
a world-aligned frame centered at a common origin (the subtree center of mass
of the tree root, as MuJoCo's ``mj_comPos`` does), which makes the composite
rigid-body and recursive Newton-Euler passes pure batched linear algebra.

All ops broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m (crm(v) @ m)."""
    vw, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    ang = jnp.cross(vw, mw)
    lin = jnp.cross(vw, ml) + jnp.cross(vl, mw)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f (crf(v) @ f)."""
    vw, vl = v[..., :3], v[..., 3:]
    fw, fl = f[..., :3], f[..., 3:]
    ang = jnp.cross(vw, fw) + jnp.cross(vl, fl)
    lin = jnp.cross(vw, fl)
    return jnp.concatenate([ang, lin], axis=-1)


def transform_motion(m: jax.Array, offset: jax.Array) -> jax.Array:
    """Moves the reference point of a motion vector by ``offset`` (new - old).

    [w, v]_new = [w, v_old - offset x w]  (world-aligned frames).
    """
    w, v = m[..., :3], m[..., 3:]
    return jnp.concatenate([w, v - jnp.cross(offset, w)], axis=-1)


def transform_force(f: jax.Array, offset: jax.Array) -> jax.Array:
    """Moves the reference point of a force vector by ``offset`` (new - old).

    [t, f]_new = [t_old - offset x f, f].
    """
    t, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([t - jnp.cross(offset, fl), fl], axis=-1)


def inertia_at_point(
    mass: jax.Array,
    inertia_diag: jax.Array,
    rot: jax.Array,
    com: jax.Array,
    point: jax.Array,
) -> jax.Array:
    """Builds the 6x6 spatial inertia of a body about ``point`` (world frame).

    Args:
      mass: (...,) body mass.
      inertia_diag: (..., 3) principal moments about the body com.
      rot: (..., 3, 3) rotation from the principal-inertia frame to world.
      com: (..., 3) body center of mass in world coordinates.
      point: (..., 3) origin about which to express the inertia.

    Returns:
      (..., 6, 6) spatial inertia in [angular, linear] ordering.
    """
    ic = rot @ (inertia_diag[..., :, None] * jnp.swapaxes(rot, -1, -2))
    c = com - point
    cx = skew(c)
    m = mass[..., None, None]
    eye = jnp.eye(3, dtype=ic.dtype)
    top_left = ic + m * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
