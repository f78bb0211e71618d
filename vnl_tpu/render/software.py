"""First-party software rasterizer for eval videos.

Minimal painter's-algorithm renderer over the compiled Model's geoms:
spheres/capsules/ellipsoids/boxes project to depth-sorted primitives; the
ground plane renders as a checkerboard.  Intended for offline eval overlay
videos (agent vs. reference ghost), not for training observations — runs on
host numpy at a few frames/sec, which matches the reference's osmesa
renderer role (train.py:274-331).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vnl_tpu import physics
from vnl_tpu.physics.model import GeomType, Model


def _look_at(eye, target, up=(0.0, 0.0, 1.0)):
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    f = target - eye
    f = f / np.linalg.norm(f)
    r = np.cross(f, np.asarray(up, np.float64))
    r /= np.linalg.norm(r)
    u = np.cross(r, f)
    R = np.stack([r, u, f])  # rows: right, up, forward
    return R, eye


class SoftwareRenderer:
    def __init__(self, model: Model, width: int = 320, height: int = 240,
                 fovy: float = 45.0):
        self.m = model
        self.w, self.h = width, height
        self.focal = 0.5 * height / np.tan(np.deg2rad(fovy) / 2)
        self._fk = jax.jit(lambda q: physics.kinematics(
            model, physics.make_data(model, qpos=q)))

    def geom_poses(self, qpos: np.ndarray):
        d = self._fk(jnp.asarray(qpos))
        return np.asarray(d.geom_xpos), np.asarray(d.geom_xmat)

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

        img = np.full((self.h, self.w, 3), 255, np.float32)
        depth = np.full((self.h, self.w), np.inf, np.float32)
        self._draw_ground(img, depth, R, eye)

        default_colors = [(0.85, 0.45, 0.25), (0.4, 0.6, 0.9),
                          (0.5, 0.8, 0.5)]
        prims = []
        for inst, qpos in enumerate(qpos_list):
            gx, gm = self.geom_poses(np.asarray(qpos))
            color = np.array((colors[inst] if colors else
                              default_colors[inst % 3]))
            alpha = (alphas[inst] if alphas else (1.0 if inst == 0 else 0.45))
            for g in range(m.ngeom):
                gt = int(m.geom_type[g])
                if gt == int(GeomType.PLANE):
                    continue
                size = np.asarray(m.geom_size)[g]
                pos = gx[g]
                if gt == int(GeomType.SPHERE):
                    prims.append(("sphere", pos, size[0], color, alpha))
                elif gt in (int(GeomType.CAPSULE), int(GeomType.CYLINDER)):
                    axis = gm[g][:, 2] * size[1]
                    prims.append(("capsule", (pos - axis, pos + axis),
                                  size[0], color, alpha))
                elif gt == int(GeomType.ELLIPSOID):
                    prims.append(("sphere", pos, float(np.mean(size)), color,
                                  alpha))
                elif gt == int(GeomType.BOX):
                    prims.append(("sphere", pos, float(np.linalg.norm(size)),
                                  color, alpha))

        # painter's order: far to near
        def cam_depth(p):
            return float(R[2] @ (np.asarray(p) - eye))

        def key(prim):
            kind, p, *_ = prim
            c = p if kind == "sphere" else 0.5 * (p[0] + p[1])
            return -cam_depth(c)

        for kind, p, r, color, alpha in sorted(prims, key=key):
            if kind == "sphere":
                self._draw_sphere(img, R, eye, p, r, color, alpha)
            else:
                self._draw_capsule(img, R, eye, p[0], p[1], r, color, alpha)
        return np.clip(img, 0, 255).astype(np.uint8)

    # -- primitive rasterization ------------------------------------------
    def _project(self, R, eye, pts):
        pc = (np.atleast_2d(pts) - eye) @ R.T  # (N, 3): x right, y up, z fwd
        z = np.maximum(pc[:, 2], 1e-4)
        u = self.w / 2 + self.focal * pc[:, 0] / z
        v = self.h / 2 - self.focal * pc[:, 1] / z
        return u, v, z

    def _shade(self, img, mask, color, alpha, shade=1.0):
        c = np.clip(np.asarray(color) * shade, 0, 1) * 255
        img[mask] = (1 - alpha) * img[mask] + alpha * c

    def _draw_sphere(self, img, R, eye, center, radius, color, alpha):
        u, v, z = self._project(R, eye, center)
        if z[0] <= 1e-3:
            return
        pr = self.focal * radius / z[0]
        yy, xx = np.ogrid[: self.h, : self.w]
        d2 = (xx - u[0]) ** 2 + (yy - v[0]) ** 2
        mask = d2 <= pr ** 2
        if mask.any():
            shade = 0.55 + 0.45 * np.clip(1 - np.sqrt(
                np.maximum(d2[mask], 0)) / max(pr, 1e-6), 0, 1)
            c = np.asarray(color) * 255
            img[mask] = ((1 - alpha) * img[mask]
                         + alpha * shade[:, None] * c[None, :])

    def _draw_capsule(self, img, R, eye, a, b, radius, color, alpha):
        ua, va, za = self._project(R, eye, a)
        ub, vb, zb = self._project(R, eye, b)
        if za[0] <= 1e-3 and zb[0] <= 1e-3:
            return
        zmid = 0.5 * (za[0] + zb[0])
        pr = self.focal * radius / max(zmid, 1e-4)
        yy, xx = np.ogrid[: self.h, : self.w]
        # distance from pixel to 2d segment
        ax, ay, bx, by = ua[0], va[0], ub[0], vb[0]
        abx, aby = bx - ax, by - ay
        denom = abx * abx + aby * aby + 1e-9
        t = np.clip(((xx - ax) * abx + (yy - ay) * aby) / denom, 0, 1)
        dx = xx - (ax + t * abx)
        dy = yy - (ay + t * aby)
        mask = dx * dx + dy * dy <= pr ** 2
        self._shade(img, mask, color, alpha, shade=0.8)

    def _draw_ground(self, img, depth, R, eye, cell: float = 0.1):
        """Checkerboard ground plane z=0 by per-pixel ray casting."""
        yy, xx = np.mgrid[: self.h, : self.w]
        dirs_cam = np.stack([
            (xx - self.w / 2) / self.focal,
            -(yy - self.h / 2) / self.focal,
            np.ones_like(xx, np.float64)], axis=-1)
        dirs = dirs_cam @ R  # world
        dz = dirs[..., 2]
        t = np.where(dz < -1e-6, -eye[2] / np.where(dz < -1e-6, dz, -1.0),
                     np.inf)
        hit = np.isfinite(t)
        px = eye[0] + t * dirs[..., 0]
        py = eye[1] + t * dirs[..., 1]
        checker = ((np.floor(px / cell) + np.floor(py / cell)) % 2).astype(bool)
        base = np.where(checker[..., None], 210.0, 235.0)
        img[hit] = np.broadcast_to(base, img.shape)[hit]


def render_egocentric(model: Model, qpos: np.ndarray,
                      body_name: str = "skull", width: int = 64,
                      height: int = 64, forward_offset: float = 0.3,
                      renderer: Optional[SoftwareRenderer] = None
                      ) -> np.ndarray:
    """64x64 egocentric view from a head/skull body (walker.py:388-405
    observable).  Host-side (offline analysis / visualization, like the
    reference's dm_control camera — not a training observation)."""
    r = renderer or SoftwareRenderer(model, width, height, fovy=90.0)
    d = r._fk(np.asarray(qpos))
    bid = model.body_names.index(body_name)
    pos = np.asarray(d.xpos)[bid]
    fwd = np.asarray(d.xmat)[bid][:, 0]  # body x-axis
    return r.render([np.asarray(qpos)], camera_pos=pos + 0.02 * fwd,
                    camera_target=pos + forward_offset * fwd)


def render_trajectory(model: Model, qpos_traj: np.ndarray, width=320,
                      height=240, **kwargs) -> np.ndarray:
    """(T, nq) -> (T, H, W, 3) uint8 frames."""
    r = SoftwareRenderer(model, width, height)
    return np.stack([r.render([q], **kwargs) for q in np.asarray(qpos_traj)])


def render_overlay_video(model: Model, qpos_rollout: np.ndarray,
                         qpos_ref: np.ndarray, out_path: str,
                         fps: int = 50, width=320, height=240) -> str:
    """Agent vs reference ghost overlay video (reference train.py:274-331).

    Instead of a <replicate> pair MJCF + two-model qpos stacking, the same
    model is rendered twice per frame (agent opaque, reference translucent).
    """
    import imageio
    r = SoftwareRenderer(model, width, height)
    frames = [r.render([qa, qr]) for qa, qr in
              zip(np.asarray(qpos_rollout), np.asarray(qpos_ref))]
    try:
        imageio.mimsave(out_path, frames, fps=fps)
    except (ValueError, ImportError):
        # no ffmpeg backend in this environment: degrade to GIF
        out_path = out_path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(out_path, frames, duration=1.0 / fps)
    return out_path
