"""Jit-able egocentric camera: analytic ray-primitive depth/RGB under jax.

The reference walker declares a 64x64 egocentric camera observable
(/root/reference/walker.py:388-405) rendered by the MuJoCo C renderer —
host-side and unusable inside a compiled training step.  This module is the
TPU-native equivalent: a fixed ray grid is cast against the model's
primitive geoms (plane / sphere / capsule / ellipsoid / box) with closed-
form intersections, entirely in jnp — jit/vmap-compatible, so pixel
observations can feed a policy inside the rollout scan.

Static shapes throughout: every geom of a supported type is intersected by
every ray (ngeom ~1e2 x 4096 rays ~ 10 MFLOP/frame), the depth min-reduced
over geoms.  Output is a headlight-shaded grayscale-RGB image in [0, 1]
(the software renderer's visual conventions; vnl_tpu/render/software.py is
the host-side sibling).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics.model import Data, GeomType, Model

_BIG = 1e9


def _ray_sphere(o, d, c, r):
    """Rays (P,3) vs spheres (G,3),(G,) -> (P,G) t (inf on miss)."""
    oc = o[:, None, :] - c[None, :, :]
    b = jnp.einsum("pi,pgi->pg", d, oc)
    cterm = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = b * b - cterm
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    return jnp.where((disc >= 0.0) & (t > 1e-6), t, _BIG)


def _ray_plane(o, d, p0, n):
    """Rays vs planes (G,3),(G,3): t where d.n < 0 side hits."""
    denom = jnp.einsum("pi,gi->pg", d, n)
    t = jnp.einsum("gi,pgi->pg", n, p0[None, :, :] - o[:, None, :]) / (
        jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0))
    return jnp.where((jnp.abs(denom) > 1e-9) & (t > 1e-6), t, _BIG)


def _ray_capsule(o, d, pa, axis, half, r):
    """Rays vs capsules (segment pa +- half*axis, radius r) -> (P,G) t."""
    # infinite-cylinder quadratic in the axis-orthogonal complement
    oc = o[:, None, :] - pa[None, :, :]
    d_ax = jnp.einsum("pi,gi->pg", d, axis)
    oc_ax = jnp.einsum("pgi,gi->pg", oc, axis)
    dq = d[:, None, :] - d_ax[..., None] * axis[None, :, :]
    ocq = oc - oc_ax[..., None] * axis[None, :, :]
    a = jnp.sum(dq * dq, axis=-1)
    b = jnp.sum(dq * ocq, axis=-1)
    c = jnp.sum(ocq * ocq, axis=-1) - (r * r)[None, :]
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-b - sq) / jnp.where(a > 1e-12, a, 1.0)
    s = oc_ax + t_cyl * d_ax  # axial coordinate of the hit
    ok = (disc >= 0.0) & (a > 1e-12) & (t_cyl > 1e-6) & (
        jnp.abs(s) <= half[None, :])
    t_cyl = jnp.where(ok, t_cyl, _BIG)
    # end spheres
    e1 = pa + half[:, None] * axis
    e2 = pa - half[:, None] * axis
    t_s1 = _ray_sphere(o, d, e1, r)
    t_s2 = _ray_sphere(o, d, e2, r)
    return jnp.minimum(t_cyl, jnp.minimum(t_s1, t_s2))


def _ray_box(o, d, c, R, s):
    """Rays vs oriented boxes (center c, rotation R (G,3,3), half-size s)
    by the slab method in the box frame."""
    ol = jnp.einsum("gji,pgj->pgi", R, o[:, None, :] - c[None, :, :])
    dl = jnp.einsum("gji,pj->pgi", R, d)
    inv = 1.0 / jnp.where(jnp.abs(dl) > 1e-9, dl, 1e-9)
    t1 = (-s[None] - ol) * inv
    t2 = (s[None] - ol) * inv
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return jnp.where((tmax >= tmin) & (tmax > 1e-6) &
                     (tmin > 1e-6), tmin, _BIG)


def _ray_ellipsoid(o, d, c, R, s):
    """Rays vs ellipsoids: sphere intersection in the axis-scaled frame."""
    ol = jnp.einsum("gji,pgj->pgi", R, o[:, None, :] - c[None, :, :]) / s[None]
    dl = jnp.einsum("gji,pj->pgi", R, d) / s[None]
    a = jnp.sum(dl * dl, axis=-1)
    b = jnp.sum(dl * ol, axis=-1)
    cc = jnp.sum(ol * ol, axis=-1) - 1.0
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.where(a > 1e-12, a, 1.0)
    return jnp.where((disc >= 0.0) & (t > 1e-6), t, _BIG)


def make_egocentric_camera(m: Model, body_name: str = "skull",
                           width: int = 64, height: int = 64,
                           fovy: float = 90.0,
                           forward_offset: float = 0.02,
                           max_depth: float = 2.0) -> Callable[[Data], jax.Array]:
    """Builds camera(d: Data) -> (height, width, 3) float32 in [0, 1].

    The camera sits just ahead of ``body_name`` looking along the body
    x-axis with the body z-axis up (render/software.py::render_egocentric
    conventions).  Jit/vmap-compatible: use inside env observations as
    ``jax.vmap(cam)(data)``.
    """
    bid = m.body_names.index(body_name)
    gt = np.asarray(m.geom_type)
    focal = 0.5 * height / np.tan(np.deg2rad(fovy) / 2)
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    dirs_cam = np.stack([np.ones_like(xx, np.float32),          # fwd (x)
                         -(xx - width / 2) / focal,             # left (y)
                         -(yy - height / 2) / focal], axis=-1)  # up  (z)
    dirs_cam = (dirs_cam /
                np.linalg.norm(dirs_cam, axis=-1, keepdims=True)
                ).reshape(-1, 3).astype(np.float32)
    groups = {k: np.nonzero(gt == int(k))[0] for k in
              (GeomType.PLANE, GeomType.SPHERE, GeomType.CAPSULE,
               GeomType.BOX, GeomType.ELLIPSOID)}

    def camera(d: Data) -> jax.Array:
        Rb = d.xmat[bid]  # columns: body axes in world
        eye = d.xpos[bid] + forward_offset * Rb[:, 0]
        # world ray dirs: camera axes = body x (fwd), y (left), z (up)
        rays = dirs_cam @ Rb.T
        o = jnp.broadcast_to(eye, rays.shape)
        depth = jnp.full((rays.shape[0],), _BIG, rays.dtype)

        def upd(tg):
            return jnp.minimum(depth, jnp.min(tg, axis=-1))

        g = groups[GeomType.PLANE]
        if len(g):
            depth = upd(_ray_plane(o, rays, d.geom_xpos[g],
                                   d.geom_xmat[g][:, :, 2]))
        g = groups[GeomType.SPHERE]
        if len(g):
            depth = upd(_ray_sphere(o, rays, d.geom_xpos[g],
                                    m.geom_size[g, 0]))
        g = groups[GeomType.CAPSULE]
        if len(g):
            depth = upd(_ray_capsule(o, rays, d.geom_xpos[g],
                                     d.geom_xmat[g][:, :, 2],
                                     m.geom_size[g, 1], m.geom_size[g, 0]))
        g = groups[GeomType.BOX]
        if len(g):
            depth = upd(_ray_box(o, rays, d.geom_xpos[g], d.geom_xmat[g],
                                 m.geom_size[g]))
        g = groups[GeomType.ELLIPSOID]
        if len(g):
            depth = upd(_ray_ellipsoid(o, rays, d.geom_xpos[g],
                                       d.geom_xmat[g], m.geom_size[g]))

        hit = depth < _BIG
        # headlight shading: brightness falls off with depth
        shade = jnp.where(hit, 1.0 / (1.0 + depth / max_depth), 0.15)
        img = jnp.broadcast_to(shade[:, None], (shade.shape[0], 3))
        return img.reshape(height, width, 3).astype(jnp.float32)

    return camera
