"""Narrowphase collision: static candidate pairs -> padded contact points.

TPU-first design: the candidate pair list is fixed at compile time
(contype/conaffinity + explicit <pair> resolution, vnl_tpu/mjcf/compiler.py),
every candidate always produces its maximum number of contact points, and
activity is expressed through the distance sign — no dynamic shapes, no
boolean compaction, fully vmappable.  Pairs are grouped by geom-type pair at
trace time so each group is one vectorized kernel.

Supported: plane-{sphere,capsule,ellipsoid,box}, sphere-sphere,
sphere-capsule, capsule-capsule (covers the reference assets: ant/humanoid
feet & torso vs floor, rodent paw capsules/ellipsoids vs floor).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics.model import Data, GeomType, Model


def _plane_frame(xmat):
    """Contact frame rows from plane rotation: normal=z, tangents=x,y."""
    n = xmat[..., :, 2]
    t1 = xmat[..., :, 0]
    t2 = xmat[..., :, 1]
    return jnp.stack([n, t1, t2], axis=-2)


def _make_frame(n):
    """Orthonormal frame with given normal (rows: n, t1, t2)."""
    # pick a helper axis least aligned with n
    a = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape))
    t1 = jnp.cross(a, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2], axis=-2)


def _plane_sphere(ppos, pmat, c, r):
    n = pmat[..., :, 2]
    dist = jnp.einsum("...i,...i->...", n, c - ppos) - r
    pos = c - n * (r + 0.5 * dist)[..., None]
    return dist, pos


def pair_expansion(m: Model) -> np.ndarray:
    """Static (ncon_max,) map: contact point -> candidate pair index, in the
    exact order collide() emits contact points."""
    gt = m.geom_type
    t1 = gt[m.pair_geom1]
    t2 = gt[m.pair_geom2]
    out = []

    def group(mask):
        return np.nonzero(mask)[0].astype(np.int32)

    out.append(group((t1 == GeomType.PLANE) & (t2 == GeomType.SPHERE)))
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.CAPSULE))
    out += [idx, idx]
    out.append(group((t1 == GeomType.PLANE) & (t2 == GeomType.ELLIPSOID)))
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.BOX))
    out += [idx] * 4
    out.append(group((t1 == GeomType.SPHERE) & (t2 == GeomType.SPHERE)))
    out.append(group((t1 == GeomType.SPHERE) & (t2 == GeomType.CAPSULE)))
    out.append(group((t1 == GeomType.CAPSULE) & (t2 == GeomType.CAPSULE)))
    return np.concatenate([o for o in out]) if out else np.zeros(0, np.int32)


def collide(m: Model, d: Data) -> Tuple[jax.Array, jax.Array, jax.Array, np.ndarray]:
    """Computes all candidate contact points.

    Returns (dist (ncon,), pos (ncon,3), frame (ncon,3,3), con_pair (static
    numpy (ncon,) mapping contact -> candidate pair index)).
    """
    dtype = d.qpos.dtype
    ncon = m.ncon_max
    if ncon == 0:
        z = jnp.zeros((0,), dtype)
        return z, jnp.zeros((0, 3), dtype), jnp.zeros((0, 3, 3), dtype), \
            np.zeros(0, dtype=np.int32)

    gt = m.geom_type
    t1 = gt[m.pair_geom1]
    t2 = gt[m.pair_geom2]

    dists, poss, frames, pair_ids = [], [], [], []

    def group(mask):
        return np.nonzero(mask)[0].astype(np.int32)

    gx = d.geom_xpos
    gm = d.geom_xmat
    size = m.geom_size

    # ---- plane-sphere ----
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.SPHERE))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        dist, pos = _plane_sphere(gx[g1], gm[g1], gx[g2], size[g2][:, 0])
        dists.append(dist); poss.append(pos)
        frames.append(_plane_frame(gm[g1]))
        pair_ids.append(np.repeat(idx, 1))

    # ---- plane-capsule: 2 points at the endpoint spheres ----
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.CAPSULE))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        axis = gm[g2][..., :, 2]
        h = size[g2][:, 1:2]
        r = size[g2][:, 0]
        for sgn in (1.0, -1.0):
            c = gx[g2] + sgn * axis * h
            dist, pos = _plane_sphere(gx[g1], gm[g1], c, r)
            dists.append(dist); poss.append(pos)
            frames.append(_plane_frame(gm[g1]))
            pair_ids.append(idx)

    # ---- plane-ellipsoid: 1 support point ----
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.ELLIPSOID))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        n = gm[g1][..., :, 2]
        R = gm[g2]
        s = size[g2]
        nl = jnp.einsum("...ji,...j->...i", R, n)  # R^T n
        sn = s * nl
        denom = jnp.maximum(jnp.linalg.norm(sn, axis=-1), 1e-12)
        local = -(s * sn) / denom[..., None]
        p = gx[g2] + jnp.einsum("...ij,...j->...i", R, local)
        dist = jnp.einsum("...i,...i->...", n, p - gx[g1])
        pos = p - 0.5 * dist[..., None] * n
        dists.append(dist); poss.append(pos)
        frames.append(_plane_frame(gm[g1]))
        pair_ids.append(idx)

    # ---- plane-box: 4 deepest corners ----
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.BOX))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        n = gm[g1][..., :, 2]
        corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)], dtype=np.float64)
        corners = jnp.asarray(corners, dtype)  # (8, 3)
        pw = (gx[g2][:, None, :]
              + jnp.einsum("gij,cj,gj->gci", gm[g2], corners, size[g2]))
        cdist = jnp.einsum("gi,gci->gc", n, pw - gx[g1][:, None, :])
        _, top = jax.lax.top_k(-cdist, 4)  # 4 deepest corners
        tdist = jnp.take_along_axis(cdist, top, axis=1)  # (g, 4)
        tpos = jnp.take_along_axis(pw, top[..., None], axis=1)
        tpos = tpos - 0.5 * tdist[..., None] * n[:, None, :]
        for k in range(4):
            dists.append(tdist[:, k]); poss.append(tpos[:, k])
            frames.append(_plane_frame(gm[g1]))
            pair_ids.append(idx)

    # ---- sphere-sphere ----
    idx = group((t1 == GeomType.SPHERE) & (t2 == GeomType.SPHERE))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        delta = gx[g2] - gx[g1]
        dnorm = jnp.maximum(jnp.linalg.norm(delta, axis=-1), 1e-12)
        n = delta / dnorm[..., None]
        r1, r2 = size[g1][:, 0], size[g2][:, 0]
        dist = dnorm - (r1 + r2)
        pos = gx[g1] + n * (r1 + 0.5 * dist)[..., None]
        dists.append(dist); poss.append(pos)
        frames.append(_make_frame(n))
        pair_ids.append(idx)

    # ---- sphere-capsule / capsule-capsule: closest points on segments ----
    def segpoint(p, a0, a1):
        ab = a1 - a0
        t = jnp.einsum("...i,...i->...", p - a0, ab) / jnp.maximum(
            jnp.einsum("...i,...i->...", ab, ab), 1e-12)
        t = jnp.clip(t, 0.0, 1.0)
        return a0 + t[..., None] * ab

    idx = group((t1 == GeomType.SPHERE) & (t2 == GeomType.CAPSULE))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        ax = gm[g2][..., :, 2] * size[g2][:, 1:2]
        cp = segpoint(gx[g1], gx[g2] - ax, gx[g2] + ax)
        delta = cp - gx[g1]
        dnorm = jnp.maximum(jnp.linalg.norm(delta, axis=-1), 1e-12)
        n = delta / dnorm[..., None]
        r1, r2 = size[g1][:, 0], size[g2][:, 0]
        dist = dnorm - (r1 + r2)
        pos = gx[g1] + n * (r1 + 0.5 * dist)[..., None]
        dists.append(dist); poss.append(pos)
        frames.append(_make_frame(n))
        pair_ids.append(idx)

    idx = group((t1 == GeomType.CAPSULE) & (t2 == GeomType.CAPSULE))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        a_ax = gm[g1][..., :, 2] * size[g1][:, 1:2]
        b_ax = gm[g2][..., :, 2] * size[g2][:, 1:2]
        a0, a1 = gx[g1] - a_ax, gx[g1] + a_ax
        b0, b1 = gx[g2] - b_ax, gx[g2] + b_ax
        # iterative closest-point refinement (2 alternations suffice)
        pa = gx[g1]
        for _ in range(3):
            pb = segpoint(pa, b0, b1)
            pa = segpoint(pb, a0, a1)
        delta = pb - pa
        dnorm = jnp.maximum(jnp.linalg.norm(delta, axis=-1), 1e-12)
        n = delta / dnorm[..., None]
        r1, r2 = size[g1][:, 0], size[g2][:, 0]
        dist = dnorm - (r1 + r2)
        pos = pa + n * (r1 + 0.5 * dist)[..., None]
        dists.append(dist); poss.append(pos)
        frames.append(_make_frame(n))
        pair_ids.append(idx)

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    frame = jnp.concatenate(frames)
    con_pair = np.concatenate(pair_ids)
    assert dist.shape[0] == ncon, (dist.shape, ncon)
    return dist, pos, frame, con_pair
