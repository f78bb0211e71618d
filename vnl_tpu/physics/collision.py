"""Narrowphase collision: static candidate pairs -> padded contact points.

TPU-first design: the candidate pair list is fixed at compile time
(contype/conaffinity + explicit <pair> resolution, vnl_tpu/mjcf/compiler.py),
every candidate always produces its maximum number of contact points, and
activity is expressed through the distance sign — no dynamic shapes, no
boolean compaction, fully vmappable.  Pairs are grouped by geom-type pair at
trace time so each group is one vectorized kernel.

Supported: plane-{sphere,capsule,ellipsoid,cylinder,box}, sphere-sphere,
sphere-capsule, sphere-box, capsule-capsule, box-box (the reference assets
only exercise the plane/sphere/capsule/ellipsoid set: ant/humanoid feet &
torso vs floor, rodent paw capsules/ellipsoids vs floor; sphere-box and
box-box extend coverage to box-stacking scenes).

Box-box is SAT over the 15 candidate axes with a fixed 8-contact manifold:
25 penetration candidates (8+8 corners against the opposing support plane
along the SAT axis + 9 edge-edge closest points, active only when the SAT
minimum is that edge axis), keep the 8 deepest.  Static shapes throughout.
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


def _sphere_box(c, r, bp, bR, bs):
    """Sphere (center c, radius r) vs box (pos bp, rot bR, half-size bs).

    Returns (dist, pos, n) with n pointing sphere -> box surface."""
    local = jnp.einsum("...ji,...j->...i", bR, c - bp)       # box frame
    clamped = jnp.clip(local, -bs, bs)
    delta = local - clamped
    dn = jnp.linalg.norm(delta, axis=-1)
    outside = dn > 1e-9

    # outside: closest surface point is the clamp
    n_out = delta / jnp.maximum(dn, 1e-12)[..., None]
    dist_out = dn - r

    # inside: push out through the nearest face
    face_d = bs - jnp.abs(local)                              # (.., 3) >= 0
    k = jnp.argmin(face_d, axis=-1)
    eye = jnp.eye(3, dtype=c.dtype)
    ek = eye[k]                                               # (.., 3)
    sign = jnp.sign(jnp.take_along_axis(local, k[..., None], -1))[..., 0]
    n_in = -ek * sign[..., None]                              # into the box
    dist_in = -(jnp.min(face_d, axis=-1) + r)

    n_local = jnp.where(outside[..., None], n_out, n_in)
    dist = jnp.where(outside, dist_out, dist_in)
    # n points from sphere toward box => normal = -n_local in world coords
    n = -jnp.einsum("...ij,...j->...i", bR, n_local)
    surf = bp + jnp.einsum("...ij,...j->...i", bR, clamped)
    pos = surf + 0.5 * dist[..., None] * n
    return dist, pos, n


_CORNER_SIGNS = np.array([[sx, sy, sz] for sx in (-1, 1)
                          for sy in (-1, 1) for sz in (-1, 1)], np.float64)


def _box_box(pa, Ra, sa, pb, Rb, sb):
    """SAT box-box: returns (dist (..,8), pos (..,8,3), n (..,3))."""
    dtype = pa.dtype
    R = jnp.einsum("...ji,...jk->...ik", Ra, Rb)   # B axes in A frame
    t = jnp.einsum("...ji,...j->...i", Ra, pb - pa)
    absR = jnp.abs(R) + 1e-9

    # 15 axes in A frame: e_i, R[:,j], e_i x R[:,j]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)
    axes = [eye[..., :, i] for i in range(3)]
    axes += [R[..., :, j] for j in range(3)]
    for i in range(3):
        for j in range(3):
            axes.append(jnp.cross(eye[..., :, i], R[..., :, j]))
    axes = jnp.stack(axes, axis=-2)                # (.., 15, 3)
    anorm = jnp.maximum(jnp.linalg.norm(axes, axis=-1), 1e-12)
    axes = axes / anorm[..., None]

    # support radii: ra = sum_i sa_i |l . e_i|, rb = sum_j sb_j |l . R_j|
    ra = jnp.einsum("...ki,...i->...k", jnp.abs(axes), sa)
    proj = jnp.einsum("...ki,...ij->...kj", axes, R)   # l_k . R_j
    rb = jnp.einsum("...kj,...j->...k", jnp.abs(proj), sb)
    tl = jnp.einsum("...ki,...i->...k", axes, t)
    depth = ra + rb - jnp.abs(tl)                  # (.., 15)
    # degenerate cross axes (parallel edges): disable
    valid = jnp.concatenate(
        [jnp.ones(depth.shape[:-1] + (6,), dtype),
         (anorm[..., 6:] > 1e-6).astype(dtype)], axis=-1)
    depth = jnp.where(valid > 0, depth, jnp.inf)
    kmin = jnp.argmin(depth, axis=-1)
    l_min = jnp.take_along_axis(axes, kmin[..., None, None],
                                axis=-2)[..., 0, :]
    sgn = jnp.sign(jnp.take_along_axis(tl, kmin[..., None], -1))[..., 0]
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    nA = l_min * sgn[..., None]                    # A frame, points A -> B
    n = jnp.einsum("...ij,...j->...i", Ra, nA)     # world

    ra_n = jnp.einsum("...i,...i->...", jnp.abs(nA), sa)
    nB = jnp.einsum("...ji,...j->...i", R, nA)     # n in B frame
    rb_n = jnp.einsum("...i,...i->...", jnp.abs(nB), sb)

    signs = jnp.asarray(_CORNER_SIGNS, dtype)
    # corners of B (world): penetration beneath A's support plane along n
    cb = pb[..., None, :] + jnp.einsum("...ij,cj,...j->...ci", Rb, signs, sb)
    dist_b = (jnp.einsum("...i,...ci->...c", n, cb - pa[..., None, :])
              - ra_n[..., None])
    pos_b = cb - 0.5 * dist_b[..., None] * n[..., None, :]
    # corners of A: penetration beneath B's support plane along -n
    ca = pa[..., None, :] + jnp.einsum("...ij,cj,...j->...ci", Ra, signs, sa)
    dist_a = (-jnp.einsum("...i,...ci->...c", n, ca - pb[..., None, :])
              - rb_n[..., None])
    pos_a = ca + 0.5 * dist_a[..., None] * n[..., None, :]

    # edge-edge closest points for the 9 cross axes, active only when the
    # SAT minimum is that axis
    def seg_closest(p0, d0, h0, p1, d1, h1):
        # closest points of segments p0 +- h0 d0 and p1 +- h1 d1
        r = p1 - p0
        a = jnp.einsum("...i,...i->...", d0, d0)
        e = jnp.einsum("...i,...i->...", d1, d1)
        f = jnp.einsum("...i,...i->...", d1, r)
        c = jnp.einsum("...i,...i->...", d0, r)
        b = jnp.einsum("...i,...i->...", d0, d1)
        den = jnp.maximum(a * e - b * b, 1e-12)
        s = jnp.clip((b * f - c * e) / -den, -h0, h0)
        u = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), -h1, h1)
        s = jnp.clip((b * u + c) / jnp.maximum(a, 1e-12), -h0, h0)
        return p0 + s[..., None] * d0, p1 + u[..., None] * d1

    e_dists, e_poss = [], []
    for i in range(3):
        for j in range(3):
            k = 6 + 3 * i + j
            lk = axes[..., k, :] * sgn[..., None]  # approx A->B direction
            # supporting edge of A along +lk (fix axis i), of B along -lk
            off_a = jnp.where(
                jnp.arange(3) == i, 0.0,
                sa * jnp.sign(lk + 1e-12))
            off_b_local = jnp.where(
                jnp.arange(3) == j, 0.0,
                sb * -jnp.sign(nB + 1e-12))
            p0 = pa + jnp.einsum("...ij,...j->...i", Ra, off_a)
            d0 = Ra[..., :, i]
            p1 = pb + jnp.einsum("...ij,...j->...i", Rb, off_b_local)
            d1 = Rb[..., :, j]
            q0, q1 = seg_closest(p0, d0, sa[..., i], p1, d1, sb[..., j])
            active = kmin == k
            e_dists.append(jnp.where(active, -depth.min(axis=-1),
                                     jnp.full_like(sgn, 1e3)))
            e_poss.append(0.5 * (q0 + q1))
    dist_e = jnp.stack(e_dists, axis=-1)           # (.., 9)
    pos_e = jnp.stack(e_poss, axis=-2)             # (.., 9, 3)

    dist_all = jnp.concatenate([dist_b, dist_a, dist_e], axis=-1)
    pos_all = jnp.concatenate([pos_b, pos_a, pos_e], axis=-2)
    neg, top = jax.lax.top_k(-dist_all, 8)
    dist8 = -neg
    pos8 = jnp.take_along_axis(pos_all, top[..., None], axis=-2)
    return dist8, pos8, n


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
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.CYLINDER))
    out += [idx] * 4
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.BOX))
    out += [idx] * 4
    out.append(group((t1 == GeomType.SPHERE) & (t2 == GeomType.SPHERE)))
    out.append(group((t1 == GeomType.SPHERE) & (t2 == GeomType.CAPSULE)))
    out.append(group((t1 == GeomType.CAPSULE) & (t2 == GeomType.CAPSULE)))
    out.append(group((t1 == GeomType.SPHERE) & (t2 == GeomType.BOX)))
    idx = group((t1 == GeomType.BOX) & (t2 == GeomType.BOX))
    out += [idx] * 8
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

    # ---- plane-cylinder: 4 rim candidates ----
    # Both caps' rim support points along the steepest in-disk descent
    # direction (the side contact line's endpoints when lying flat), plus
    # the lower cap's rim at that direction rotated +-120 deg (a stable
    # tripod when standing on a cap; those points surface above the plane
    # and deactivate in every other attitude).
    idx = group((t1 == GeomType.PLANE) & (t2 == GeomType.CYLINDER))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        n = gm[g1][..., :, 2]
        axis = gm[g2][..., :, 2]
        r = size[g2][:, 0]
        h = size[g2][:, 1]
        cosa = jnp.einsum("...i,...i->...", n, axis)
        u_raw = cosa[..., None] * axis - n  # downhill, projected into disk
        sina = jnp.linalg.norm(u_raw, axis=-1)
        # standing on a cap: the downhill direction degenerates; any radial
        # direction serves (the tripod provides the support polygon)
        u = jnp.where(sina[..., None] > 1e-6,
                      u_raw / jnp.maximum(sina, 1e-12)[..., None],
                      gm[g2][..., :, 0])
        v = jnp.cross(axis, u)
        u120 = -0.5 * u + 0.8660254 * v
        u240 = -0.5 * u - 0.8660254 * v
        s_low = -jnp.sign(cosa + 1e-12)[..., None] * jnp.ones_like(u)
        ones = jnp.ones_like(u)

        def _rim(cap_sign, dirv):
            p = (gx[g2] + cap_sign * h[..., None] * axis
                 + r[..., None] * dirv)
            dist = jnp.einsum("...i,...i->...", n, p - gx[g1])
            return dist, p - 0.5 * dist[..., None] * n

        for cap, dirv in ((ones, u), (-ones, u), (s_low, u120),
                          (s_low, u240)):
            dist, pos = _rim(cap, dirv)
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

    # ---- sphere-box ----
    idx = group((t1 == GeomType.SPHERE) & (t2 == GeomType.BOX))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        dist, pos, n = _sphere_box(gx[g1], size[g1][:, 0], gx[g2],
                                   gm[g2], size[g2])
        dists.append(dist); poss.append(pos)
        frames.append(_make_frame(n))
        pair_ids.append(idx)

    # ---- box-box: SAT manifold, 8 points ----
    idx = group((t1 == GeomType.BOX) & (t2 == GeomType.BOX))
    if len(idx):
        g1, g2 = m.pair_geom1[idx], m.pair_geom2[idx]
        dist8, pos8, n = _box_box(gx[g1], gm[g1], size[g1],
                                  gx[g2], gm[g2], size[g2])
        for k in range(8):
            dists.append(dist8[:, k]); poss.append(pos8[:, k])
            frames.append(_make_frame(n))
            pair_ids.append(idx)

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    frame = jnp.concatenate(frames)
    con_pair = np.concatenate(pair_ids)
    assert dist.shape[0] == ncon, (dist.shape, ncon)
    return dist, pos, frame, con_pair
