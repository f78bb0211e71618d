"""First-party software ray-caster for eval videos.

Per-pixel ray casting with a real z-buffer over the compiled Model's geoms:
spheres, capsules, cylinders, BOXES and ellipsoids intersect analytically
in their local frames (no bounding-sphere substitutes), the ground plane
renders as a checkerboard, and translucent overlay instances blend against
the opaque depth buffer.  Intended for offline eval overlay videos (agent
vs. reference ghost), not for training observations — runs on host numpy
at a few frames/sec, which matches the reference's osmesa renderer role
(train.py:274-331).

Each geom only evaluates the pixels inside its projected bounding circle
(geom_rbound), so frames cost ~sum of on-screen geom areas, not
ngeom x H x W.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from vnl_tpu.physics.model import GeomType, JointType, Model

_LIGHT = np.array([-0.35, 0.4, 0.85])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


# -- pure-numpy forward kinematics -------------------------------------------
# The renderer runs on a WORKER THREAD of the training process; a jitted FK
# there dispatches tiny programs to the TPU where they queue behind (and can
# destabilize) multi-minute training programs — and with JAX_PLATFORMS
# pinned to the TPU backend there is no CPU jax device to hide on.  Host
# numpy FK over ~65 bodies is microseconds and keeps rendering completely
# off the accelerator.


def _np_qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([aw * bw - ax * bx - ay * by - az * bz,
                     aw * bx + ax * bw + ay * bz - az * by,
                     aw * by - ax * bz + ay * bw + az * bx,
                     aw * bz + ax * by - ay * bx + az * bw])


def _np_qrot(q, v):
    w = q[0]
    u = q[1:]
    t = np.cross(u, v)
    return v + 2.0 * (w * t + np.cross(u, t))


def _np_q2mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _np_norm(q):
    return q / max(np.linalg.norm(q), 1e-12)


def numpy_fk(m: Model, qpos: np.ndarray):
    """Host FK: qpos -> (xpos (nb,3), xquat (nb,4), geom_xpos, geom_xmat).

    Same semantics as physics.kinematics (mj_kinematics): parent offset,
    then the body's joints applied in its local frame (hinge/slide deltas
    are relative to qpos0)."""
    qpos = np.asarray(qpos, np.float64)
    qpos0 = np.asarray(m.qpos0, np.float64)
    body_pos = np.asarray(m.body_pos, np.float64)
    body_quat = np.asarray(m.body_quat, np.float64)
    jnt_pos = np.asarray(m.jnt_pos, np.float64)
    jnt_axis = np.asarray(m.jnt_axis, np.float64)
    nb = m.nbody
    xpos = np.zeros((nb, 3))
    xquat = np.zeros((nb, 4))
    xquat[0, 0] = 1.0
    for b in range(1, nb):
        p = int(m.body_parentid[b])
        pos = xpos[p] + _np_qrot(xquat[p], body_pos[b])
        quat = _np_qmul(xquat[p], body_quat[b])
        adr, num = int(m.body_jntadr[b]), int(m.body_jntnum[b])
        for j in range(adr, adr + num):
            jt = int(m.jnt_type[j])
            qa = int(m.jnt_qposadr[j])
            if jt == int(JointType.FREE):
                pos = qpos[qa:qa + 3].copy()
                quat = _np_norm(qpos[qa + 3:qa + 7])
            elif jt == int(JointType.BALL):
                q_loc = _np_norm(qpos[qa:qa + 4])
                pos = pos + _np_qrot(quat,
                                     jnt_pos[j] - _np_qrot(q_loc, jnt_pos[j]))
                quat = _np_qmul(quat, q_loc)
            elif jt == int(JointType.SLIDE):
                pos = pos + _np_qrot(quat, jnt_axis[j]
                                     * (qpos[qa] - qpos0[qa]))
            else:  # HINGE
                half = 0.5 * (qpos[qa] - qpos0[qa])
                q_loc = np.concatenate([[np.cos(half)],
                                        np.sin(half) * jnt_axis[j]])
                pos = pos + _np_qrot(quat,
                                     jnt_pos[j] - _np_qrot(q_loc, jnt_pos[j]))
                quat = _np_qmul(quat, q_loc)
        xpos[b] = pos
        xquat[b] = _np_norm(quat)

    ng = m.ngeom
    geom_pos = np.asarray(m.geom_pos, np.float64)
    geom_quat = np.asarray(m.geom_quat, np.float64)
    gxpos = np.zeros((ng, 3))
    gxmat = np.zeros((ng, 3, 3))
    for g in range(ng):
        b = int(m.geom_bodyid[g])
        gxpos[g] = xpos[b] + _np_qrot(xquat[b], geom_pos[g])
        gxmat[g] = _np_q2mat(_np_qmul(xquat[b], geom_quat[g]))
    return xpos, xquat, gxpos, gxmat


def _look_at(eye, target, up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    n = np.linalg.norm(r)
    if n < 1e-9:  # looking straight up/down: pick any horizontal right
        r = np.array([1.0, 0.0, 0.0])
    else:
        r = r / n
    u = np.cross(r, f)
    R = np.stack([r, u, f])  # rows: right, up, forward
    return R, eye


# -- analytic ray/geom intersections ----------------------------------------
# All take ray origins O (N,3) and unit directions D (N,3) in the GEOM LOCAL
# frame and return (t, normal_local) with t=inf on miss.  Only t >= tmin
# counts (rays start at the camera).

_TMIN = 1e-4
_INF = np.inf


def _quadratic(a, b, c):
    """Smallest root >= _TMIN of a t^2 + 2 b t + c = 0, else inf."""
    disc = b * b - a * c
    ok = disc >= 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    t0 = (-b - sq) / a
    t1 = (-b + sq) / a
    t = np.where(t0 >= _TMIN, t0, t1)
    return np.where(ok & (t >= _TMIN), t, _INF)


def _finite(t):
    """t with misses (inf) zeroed, for normal evaluation only — inf * 0 in
    an unused lane would raise RuntimeWarnings and poison `@` products."""
    return np.where(np.isfinite(t), t, 0.0)


def _ray_sphere(O, D, radius):
    b = np.einsum("ij,ij->i", D, O)
    c = np.einsum("ij,ij->i", O, O) - radius * radius
    t = _quadratic(1.0, b, c)
    n = O + _finite(t)[:, None] * D
    return t, n


def _ray_ellipsoid(O, D, size):
    s = np.asarray(size)
    Os, Ds = O / s, D / s
    a = np.einsum("ij,ij->i", Ds, Ds)
    b = np.einsum("ij,ij->i", Ds, Os)
    c = np.einsum("ij,ij->i", Os, Os) - 1.0
    t = _quadratic(np.maximum(a, 1e-12), b, c)
    hit = O + _finite(t)[:, None] * D
    n = hit / (s * s)  # gradient of the implicit surface
    return t, n


def _ray_capped_cylinder(O, D, radius, half, spherical_caps):
    """Cylinder of given radius along local z in [-half, half]; caps are
    hemispheres (capsule) or flat discs (cylinder)."""
    # side surface
    a = D[:, 0] ** 2 + D[:, 1] ** 2
    b = D[:, 0] * O[:, 0] + D[:, 1] * O[:, 1]
    c = O[:, 0] ** 2 + O[:, 1] ** 2 - radius * radius
    t_side = _quadratic(np.maximum(a, 1e-12), b, c)
    z = O[:, 2] + _finite(t_side) * D[:, 2]
    t_side = np.where(np.abs(z) <= half, t_side, _INF)
    n_side = O + _finite(t_side)[:, None] * D
    n_side = n_side * np.array([1.0, 1.0, 0.0])

    t, n = t_side, n_side
    if spherical_caps:
        for sz in (-half, half):
            cap = np.array([0.0, 0.0, sz])
            tc, nc = _ray_sphere(O - cap, D, radius)
            closer = tc < t
            t = np.where(closer, tc, t)
            n = np.where(closer[:, None], nc, n)
    else:
        dz = D[:, 2]
        safe = np.where(np.abs(dz) > 1e-12, dz, 1.0)
        for sz in (-half, half):
            tc = (sz - O[:, 2]) / safe
            px = O[:, 0] + tc * D[:, 0]
            py = O[:, 1] + tc * D[:, 1]
            ok = ((np.abs(dz) > 1e-12) & (tc >= _TMIN)
                  & (px * px + py * py <= radius * radius))
            tc = np.where(ok, tc, _INF)
            closer = tc < t
            t = np.where(closer, tc, t)
            nc = np.broadcast_to(
                np.array([0.0, 0.0, np.sign(sz)]), n.shape)
            n = np.where(closer[:, None], nc, n)
    return t, n


def _ray_box(O, D, size):
    """Slab method; normal is the axis of the entry face."""
    s = np.asarray(size)
    safe = np.where(np.abs(D) > 1e-12, D, 1e-12)
    t1 = (-s - O) / safe
    t2 = (s - O) / safe
    tlo = np.minimum(t1, t2)
    thi = np.maximum(t1, t2)
    t_near = tlo.max(axis=1)
    t_far = thi.min(axis=1)
    axis = tlo.argmax(axis=1)
    hit = (t_near <= t_far) & (t_far >= _TMIN)
    # camera inside the box renders the exit face
    t = np.where(t_near >= _TMIN, t_near, t_far)
    t = np.where(hit, t, _INF)
    n = np.zeros_like(O)
    rows = np.arange(O.shape[0])
    n[rows, axis] = -np.sign(D[rows, axis])
    return t, n


def _intersect_geom(O, D, gtype, size):
    if gtype == int(GeomType.SPHERE):
        return _ray_sphere(O, D, float(size[0]))
    if gtype == int(GeomType.CAPSULE):
        return _ray_capped_cylinder(O, D, float(size[0]), float(size[1]),
                                    spherical_caps=True)
    if gtype == int(GeomType.CYLINDER):
        return _ray_capped_cylinder(O, D, float(size[0]), float(size[1]),
                                    spherical_caps=False)
    if gtype == int(GeomType.ELLIPSOID):
        return _ray_ellipsoid(O, D, size)
    if gtype == int(GeomType.BOX):
        return _ray_box(O, D, size)
    return np.full(O.shape[0], _INF), np.zeros_like(O)


class SoftwareRenderer:
    def __init__(self, model: Model, width: int = 320, height: int = 240,
                 fovy: float = 45.0, skin=None):
        """skin: optional render.skin.Skin — when set, instances render the
        skinned mesh (z-buffered triangles) instead of collision geoms,
        matching the reference's MuJoCo-C skinned-rat videos
        (/root/reference/train.py:310-328, assets/rodent.xml <skin>)."""
        self.m = model
        self.w, self.h = width, height
        self.focal = 0.5 * height / np.tan(np.deg2rad(fovy) / 2)
        if skin == "auto":
            skin = None
            path = getattr(model, "skin_file", None)
            if path:
                try:
                    from vnl_tpu.render.skin import load_skn
                    skin = load_skn(path)
                except (OSError, ValueError):
                    skin = None  # missing/corrupt asset: fall back to geoms
        self.skin = skin
        if skin is not None:
            from vnl_tpu.render.skin import bone_body_ids
            self._skin_bones = bone_body_ids(skin, model.body_names)

    def geom_poses(self, qpos: np.ndarray):
        _, _, gxpos, gxmat = numpy_fk(self.m, np.asarray(qpos))
        return gxpos, gxmat

    # -- rays ---------------------------------------------------------------
    def _rays(self, R):
        yy, xx = np.mgrid[: self.h, : self.w]
        dirs_cam = np.stack([
            (xx - self.w / 2) / self.focal,
            -(yy - self.h / 2) / self.focal,
            np.ones_like(xx, np.float64)], axis=-1)
        dirs = dirs_cam @ R  # camera rows -> world
        return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    def _geom_pixel_window(self, R, eye, center, rbound):
        """Pixel-rect covering the geom's projected bounding sphere, or
        None when fully off-screen/behind the camera."""
        pc = R @ (center - eye)
        z = pc[2]
        if z + rbound <= 1e-3:
            return None
        z = max(z, 1e-3)
        u = self.w / 2 + self.focal * pc[0] / z
        v = self.h / 2 - self.focal * pc[1] / z
        pr = self.focal * rbound / z + 2.0
        x0, x1 = int(max(0, u - pr)), int(min(self.w, u + pr + 1))
        y0, y1 = int(max(0, v - pr)), int(min(self.h, v + pr + 1))
        if x0 >= x1 or y0 >= y1:
            return None
        return x0, x1, y0, y1

    # -- passes ---------------------------------------------------------------
    def _cast_instance(self, dirs, eye, gx, gm, into_t, into_n, into_g):
        """Nearest geom hit per pixel for one model instance, written into
        (into_t, into_n, into_g) in place."""
        m = self.m
        R, _ = self._Reye
        for g in range(m.ngeom):
            gt = int(m.geom_type[g])
            if gt == int(GeomType.PLANE):
                continue
            size = np.asarray(m.geom_size)[g]
            rbound = float(np.asarray(m.geom_rbound)[g])
            win = self._geom_pixel_window(R, eye, gx[g], rbound)
            if win is None:
                continue
            x0, x1, y0, y1 = win
            D = dirs[y0:y1, x0:x1].reshape(-1, 3)
            Rg = gm[g]
            Dl = D @ Rg  # world->local (columns of Rg are local axes)
            Ol = np.broadcast_to((eye - gx[g]) @ Rg, Dl.shape)
            t, n_local = _intersect_geom(Ol, Dl, gt, size)
            sub_t = into_t[y0:y1, x0:x1].reshape(-1)
            closer = t < sub_t
            if not closer.any():
                continue
            n_world = n_local @ Rg.T
            tt = np.where(closer, t, sub_t)
            into_t[y0:y1, x0:x1] = tt.reshape(y1 - y0, x1 - x0)
            sub_n = into_n[y0:y1, x0:x1].reshape(-1, 3)
            sub_n = np.where(closer[:, None], n_world, sub_n)
            into_n[y0:y1, x0:x1] = sub_n.reshape(y1 - y0, x1 - x0, 3)
            sub_g = into_g[y0:y1, x0:x1].reshape(-1)
            into_g[y0:y1, x0:x1] = np.where(closer, g, sub_g).reshape(
                y1 - y0, x1 - x0)

    def _raster_skin(self, eye, R, xpos, xquat, into_t, into_n):
        """Rasterizes the posed skin mesh with a z-buffer (flat shading).

        Produces the same per-pixel (t, normal) buffers as _cast_instance,
        so the shading/blending passes are shared.  t is Euclidean
        distance from the eye (commensurate with the ray-caster's t);
        per-pixel t interpolates barycentrically — skin triangles are a
        few pixels, so screen-space interpolation is below the z-buffer's
        resolution anyway."""
        from vnl_tpu.render.skin import skin_vertices
        verts = skin_vertices(self.skin, self._skin_bones, xpos, xquat)
        cam = (verts - eye) @ R.T                   # rows: right, up, fwd
        z = np.maximum(cam[:, 2], 1e-3)
        u = self.w / 2 + self.focal * cam[:, 0] / z
        v = self.h / 2 - self.focal * cam[:, 1] / z
        tv = np.linalg.norm(verts - eye, axis=1)
        valid = cam[:, 2] > 1e-3

        faces = self.skin.faces
        ok = valid[faces].all(axis=1)
        p0, p1, p2 = (verts[faces[:, k]] for k in range(3))
        fn = np.cross(p1 - p0, p2 - p0)
        # orient every face normal toward the camera (winding-agnostic)
        toward = np.einsum("fj,fj->f", fn, (p0 + p1 + p2) / 3 - eye)
        fn = np.where(toward[:, None] > 0, -fn, fn)

        for fi in np.nonzero(ok)[0]:
            i0, i1, i2 = faces[fi]
            x0f, x1f, x2f = u[i0], u[i1], u[i2]
            y0f, y1f, y2f = v[i0], v[i1], v[i2]
            xa = max(int(min(x0f, x1f, x2f)), 0)
            xb = min(int(max(x0f, x1f, x2f)) + 2, self.w)
            ya = max(int(min(y0f, y1f, y2f)), 0)
            yb = min(int(max(y0f, y1f, y2f)) + 2, self.h)
            if xa >= xb or ya >= yb:
                continue
            denom = ((y1f - y2f) * (x0f - x2f)
                     + (x2f - x1f) * (y0f - y2f))
            if abs(denom) < 1e-9:
                continue
            py, px = np.mgrid[ya:yb, xa:xb]
            px = px + 0.5
            py = py + 0.5
            l0 = ((y1f - y2f) * (px - x2f)
                  + (x2f - x1f) * (py - y2f)) / denom
            l1 = ((y2f - y0f) * (px - x2f)
                  + (x0f - x2f) * (py - y2f)) / denom
            l2 = 1.0 - l0 - l1
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            if not inside.any():
                continue
            t_pix = l0 * tv[i0] + l1 * tv[i1] + l2 * tv[i2]
            sub_t = into_t[ya:yb, xa:xb]
            closer = inside & (t_pix < sub_t)
            if not closer.any():
                continue
            into_t[ya:yb, xa:xb] = np.where(closer, t_pix, sub_t)
            sub_n = into_n[ya:yb, xa:xb]
            into_n[ya:yb, xa:xb] = np.where(closer[..., None], fn[fi],
                                            sub_n)

    @staticmethod
    def _shade(normals, base_color):
        n = normals / np.maximum(
            np.linalg.norm(normals, axis=-1, keepdims=True), 1e-9)
        lam = np.clip(n @ _LIGHT, 0.0, 1.0)
        shade = 0.45 + 0.55 * lam
        return shade[..., None] * np.asarray(base_color) * 255.0

    def render(self, qpos_list: Sequence[np.ndarray],
               camera_pos: Optional[np.ndarray] = None,
               camera_target: Optional[np.ndarray] = None,
               colors: Optional[Sequence[Tuple[float, float, float]]] = None,
               alphas: Optional[Sequence[float]] = None) -> np.ndarray:
        """Renders one frame with one or more model instances overlaid.

        qpos_list: list of qpos arrays; instance 0 is opaque (the agent),
        later instances render translucent (reference ghost overlay).
        Returns (H, W, 3) uint8.
        """
        m = self.m
        root0 = np.asarray(qpos_list[0][:3])
        if camera_target is None:
            camera_target = root0
        if camera_pos is None:
            scale = max(0.3, float(np.max(np.abs(m.geom_rbound)) * 10))
            camera_pos = root0 + np.array([scale, -scale, 0.6 * scale])
        R, eye = _look_at(camera_pos, camera_target)
        self._Reye = (R, eye)
        dirs = self._rays(R)

        # background + checkerboard ground into the z-buffer
        img = np.full((self.h, self.w, 3), 255, np.float32)
        depth = np.full((self.h, self.w), _INF)
        self._draw_ground(img, depth, dirs, eye)

        default_colors = [(0.85, 0.45, 0.25), (0.4, 0.6, 0.9),
                          (0.5, 0.8, 0.5)]
        poses = [numpy_fk(m, np.asarray(q)) for q in qpos_list]
        inst_alpha = [(alphas[i] if alphas else (1.0 if i == 0 else 0.45))
                      for i in range(len(qpos_list))]
        inst_color = [np.array(colors[i] if colors else
                               default_colors[i % 3])
                      for i in range(len(qpos_list))]

        def instance_buffers(fk):
            xpos, xquat, gx, gm = fk
            t = np.full((self.h, self.w), _INF)
            n = np.zeros((self.h, self.w, 3))
            if self.skin is not None:
                self._raster_skin(eye, R, xpos, xquat, t, n)
            else:
                gid = np.zeros((self.h, self.w), np.int32)
                self._cast_instance(dirs, eye, gx, gm, t, n, gid)
            return t, n

        # opaque pass (all instances with alpha >= 1) -> depth buffer
        for i, fk in enumerate(poses):
            if inst_alpha[i] < 1.0:
                continue
            t, n = instance_buffers(fk)
            closer = t < depth
            depth = np.where(closer, t, depth)
            shaded = self._shade(n, inst_color[i])
            img[closer] = shaded[closer]

        # translucent passes blend against the opaque depth buffer
        for i, fk in enumerate(poses):
            a = inst_alpha[i]
            if a >= 1.0:
                continue
            t, n = instance_buffers(fk)
            vis = t < depth
            shaded = self._shade(n, inst_color[i])
            img[vis] = (1 - a) * img[vis] + a * shaded[vis]

        return np.clip(img, 0, 255).astype(np.uint8)

    def _draw_ground(self, img, depth, dirs, eye, cell: float = 0.1):
        """Checkerboard ground plane z=0 by per-pixel ray casting.  px/py
        are only evaluated at finite t (an inf*0 at the horizon produced
        NaN RuntimeWarnings and latent NaN pixels in round 3)."""
        dz = dirs[..., 2]
        downward = dz < -1e-6
        t = np.where(downward, -eye[2] / np.where(downward, dz, -1.0), _INF)
        hit = downward & (t >= _TMIN)
        ts = np.where(hit, t, 0.0)  # finite placeholder where unused
        px = eye[0] + ts * dirs[..., 0]
        py = eye[1] + ts * dirs[..., 1]
        checker = ((np.floor(px / cell) + np.floor(py / cell)) % 2
                   ).astype(np.float64)
        # fade the pattern out with distance: one ground cell shrinks below
        # a pixel near the horizon and the raw checker aliases into moiré
        fade = 1.0 / (1.0 + (ts / (80.0 * cell)) ** 2)
        shade_val = 235.0 - (235.0 - 210.0) * checker * fade
        base = np.repeat(shade_val[..., None], 3, axis=-1)
        img[hit] = base[hit]
        depth[hit] = t[hit]


def render_egocentric(model: Model, qpos: np.ndarray,
                      body_name: str = "skull", width: int = 64,
                      height: int = 64, forward_offset: float = 0.3,
                      renderer: Optional[SoftwareRenderer] = None
                      ) -> np.ndarray:
    """64x64 egocentric view from a head/skull body (walker.py:388-405
    observable).  Host-side (offline analysis / visualization, like the
    reference's dm_control camera — not a training observation)."""
    r = renderer or SoftwareRenderer(model, width, height, fovy=90.0)
    xpos, xquat, _, _ = numpy_fk(model, np.asarray(qpos))
    bid = model.body_names.index(body_name)
    pos = xpos[bid]
    fwd = _np_q2mat(xquat[bid])[:, 0]  # body x-axis
    return r.render([np.asarray(qpos)], camera_pos=pos + 0.02 * fwd,
                    camera_target=pos + forward_offset * fwd)


def render_trajectory(model: Model, qpos_traj: np.ndarray, width=320,
                      height=240, **kwargs) -> np.ndarray:
    """(T, nq) -> (T, H, W, 3) uint8 frames."""
    r = SoftwareRenderer(model, width, height)
    return np.stack([r.render([q], **kwargs) for q in np.asarray(qpos_traj)])


def render_overlay_video(model: Model, qpos_rollout: np.ndarray,
                         qpos_ref: np.ndarray, out_path: str,
                         fps: int = 50, width=320, height=240,
                         skin="auto") -> str:
    """Agent vs reference ghost overlay video (reference train.py:274-331).

    Instead of a <replicate> pair MJCF + two-model qpos stacking, the same
    model is rendered twice per frame (agent opaque, reference translucent).
    skin: optional render.skin.Skin (or a path to a .skn file) — renders
    the skinned mesh like the reference's MuJoCo-C videos."""
    import imageio
    if isinstance(skin, str) and skin != "auto":
        from vnl_tpu.render.skin import load_skn
        skin = load_skn(skin)
    r = SoftwareRenderer(model, width, height, skin=skin)
    frames = [r.render([qa, qr]) for qa, qr in
              zip(np.asarray(qpos_rollout), np.asarray(qpos_ref))]
    try:
        imageio.mimsave(out_path, frames, fps=fps)
    except (ValueError, ImportError):
        # no ffmpeg backend in this environment: degrade to GIF
        out_path = out_path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(out_path, frames, duration=1.0 / fps)
    return out_path
