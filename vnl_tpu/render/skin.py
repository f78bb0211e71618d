"""MuJoCo binary skin (.skn) parsing + pose-driven vertex skinning.

The reference ships the rat's deformable hide as
``assets/rodent_walker_skin.skn`` (referenced from
/root/reference/assets/rodent.xml ``<skin file=.../>``) and its eval
videos render it through MuJoCo C (/root/reference/train.py:310-328).
This module gives the first-party software renderer the same capability:

- :func:`load_skn` parses MuJoCo's documented binary skin layout
  (header ``int32 nvertex/ntexcoord/nface/nbone``, float vertex/texcoord
  tables, int32 faces, then per-bone records: 40-byte body name, bind pos
  (3f), bind quat (4f), vertex count, vertex ids, vertex weights);
- :func:`skin_vertices` poses the mesh: each vertex is a weight-blended
  sum over its bones of ``xpos_b + R(xquat_b) @ R(bindquat_b)^T @
  (v - bindpos_b)`` — exactly MuJoCo's runtime skin update semantics.

Everything is host numpy: skinning 6,880 vertices over 65 bones is a few
matrix products per frame, far off the training hot path (the renderer
runs on the eval worker thread, render/software.py).
"""

from __future__ import annotations

import struct
from typing import List, NamedTuple

import numpy as np


class Skin(NamedTuple):
    verts: np.ndarray        # (V, 3) float32 bind-pose vertex positions
    faces: np.ndarray        # (F, 3) int32 triangle vertex ids
    bone_bodies: List[str]   # (nbone,) MJCF body name per bone
    bindpos: np.ndarray      # (nbone, 3)
    bindquat: np.ndarray     # (nbone, 4) (w, x, y, z), normalized
    weights: np.ndarray      # (V, nbone) dense, rows normalized to sum 1
    # precomputed: vertex coordinates in each bone's bind frame, weighted
    local: np.ndarray        # (nbone, V, 3)  R(bindquat)^T @ (v - bindpos)


def _q2mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def load_skn(path: str, scale: float = 1.0) -> Skin:
    """Parses a MuJoCo binary .skn file.

    scale: uniform rescale applied to vertices and bone bind positions —
    pass the model's compile-time rescale factor (mjcf.load_model
    rescale=(0.9, 0.9) for the rodent) so the hide matches the rescaled
    skeleton.  (dm_control's rescale_subtree leaves binary skin assets
    untouched, so the reference renders a 1.0-scale hide on the 0.9
    skeleton; scale=1.0 reproduces that, 0.9 is geometrically right.)"""
    raw = open(path, "rb").read()
    nvert, ntex, nface, nbone = struct.unpack("<4i", raw[:16])
    off = 16
    verts = np.frombuffer(raw, "<f4", nvert * 3, off).reshape(nvert, 3)
    off += nvert * 12
    off += ntex * 8  # texcoords unused (flat shading)
    faces = np.frombuffer(raw, "<i4", nface * 3, off).reshape(nface, 3)
    off += nface * 12

    bone_bodies: List[str] = []
    bindpos = np.zeros((nbone, 3), np.float64)
    bindquat = np.zeros((nbone, 4), np.float64)
    weights = np.zeros((nvert, nbone), np.float64)
    for b in range(nbone):
        name = raw[off:off + 40].split(b"\0")[0].decode()
        off += 40
        bindpos[b] = struct.unpack("<3f", raw[off:off + 12])
        off += 12
        bindquat[b] = struct.unpack("<4f", raw[off:off + 16])
        off += 16
        (vn,) = struct.unpack("<i", raw[off:off + 4])
        off += 4
        vid = np.frombuffer(raw, "<i4", vn, off)
        off += vn * 4
        wgt = np.frombuffer(raw, "<f4", vn, off)
        off += vn * 4
        bone_bodies.append(name)
        weights[vid, b] += wgt

    bindquat /= np.maximum(
        np.linalg.norm(bindquat, axis=1, keepdims=True), 1e-12)
    if scale != 1.0:
        verts = (verts * np.float32(scale)).astype(np.float32)
        bindpos = bindpos * scale
    wsum = weights.sum(axis=1, keepdims=True)
    weights = weights / np.maximum(wsum, 1e-12)

    v64 = verts.astype(np.float64)
    local = np.stack([(v64 - bindpos[b]) @ _q2mat(bindquat[b])
                      for b in range(nbone)])  # row-vec form of R^T @ x
    return Skin(verts=verts, faces=np.ascontiguousarray(faces),
                bone_bodies=bone_bodies, bindpos=bindpos,
                bindquat=bindquat, weights=weights, local=local)


def bone_body_ids(skin: Skin, body_names) -> np.ndarray:
    """Maps each bone to its body id in a compiled Model (raises if a bone
    names a body the model doesn't have)."""
    names = list(body_names)
    return np.array([names.index(n) for n in skin.bone_bodies], np.int32)


def skin_vertices(skin: Skin, bone_ids: np.ndarray, xpos: np.ndarray,
                  xquat: np.ndarray) -> np.ndarray:
    """Poses the skin: world-space vertices (V, 3) from body FK results.

    v_world = sum_b w[v,b] * (xpos[bone_b] + R(xquat[bone_b]) @ local[b,v])
    """
    nbone = len(skin.bone_bodies)
    out = np.zeros((skin.verts.shape[0], 3))
    for b in range(nbone):
        w = skin.weights[:, b]
        sel = w > 0.0
        if not sel.any():
            continue
        bid = int(bone_ids[b])
        R = _q2mat(xquat[bid])
        world = skin.local[b][sel] @ R.T + xpos[bid]
        out[sel] += w[sel, None] * world
    return out
