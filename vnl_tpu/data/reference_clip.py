"""Reference trajectory containers.

``ReferenceClip`` mirrors the reference's 8-field pytree
(/root/reference/preprocessing/mjx_preprocess.py:21-40) so tracking envs can
slice per-frame features under jit.  ``ClipLibrary`` finishes what the
reference's ClipCollection scaffolding (mocap_preprocess.py:343-376) and the
empty RodentMultiClipTracking stub started: a stacked, device-resident,
clip-id-indexable library for multi-clip training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReferenceClip:
    """Per-frame mocap features for one clip (leading axis = frames)."""

    # qpos split
    position: jax.Array = None        # (T, 3) root position
    quaternion: jax.Array = None      # (T, 4) root orientation
    joints: jax.Array = None          # (T, nq-7) joint angles
    # FK products
    body_positions: jax.Array = None  # (T, nbody*, 3)
    body_quaternions: jax.Array = None  # (T, nbody*, 4)
    # finite-difference velocities
    velocity: jax.Array = None        # (T, 3)
    joints_velocity: jax.Array = None  # (T, nq-7)
    angular_velocity: jax.Array = None  # (T, 3)
    # optional legacy-pipeline features (13-field ReferenceClip,
    # /root/reference/mocap_preprocess.py:326-340)
    center_of_mass: jax.Array = None  # (T, 3)
    end_effectors: jax.Array = None   # (T, n_eff, 3)
    appendages: jax.Array = None      # (T, n_app, 3)
    markers: jax.Array = None
    scaling: jax.Array = None

    @property
    def num_frames(self) -> int:
        return self.position.shape[0]

    def slice(self, start, length: int) -> "ReferenceClip":
        """Dynamic window slice along the frame axis (jit-safe); leaves not
        indexed by frame (e.g. scaling metadata) pass through unchanged."""
        T = self.position.shape[0]

        def f(x):
            if x is None or x.ndim < 1 or x.shape[0] != T:
                return x
            return jax.lax.dynamic_slice_in_dim(x, start, length, axis=0)
        return jax.tree_util.tree_map(f, self)


@struct.dataclass
class ClipLibrary:
    """Stacked clips with id-indexed gather, device-resident.

    All arrays have leading axes (num_clips, T, ...).  Under jit, an env
    selects its clip with a dynamic gather on clip_id, so thousands of
    vmapped envs can each track a different clip from one shared library
    tensor (kept in HBM; shardable over a mesh axis for very large
    libraries).
    """

    clips: ReferenceClip              # stacked, (C, T, ...)
    weights: jax.Array = None         # (C,) sampling weights

    @property
    def num_clips(self) -> int:
        return self.clips.position.shape[0]

    @property
    def clip_length(self) -> int:
        return self.clips.position.shape[1]

    def get(self, clip_id) -> ReferenceClip:
        """Gathers one clip by (traced) id."""
        return jax.tree_util.tree_map(
            lambda x: None if x is None else x[clip_id], self.clips)

    def sample_id(self, rng) -> jax.Array:
        if self.weights is None:
            return jax.random.randint(rng, (), 0, self.num_clips)
        return jax.random.categorical(rng, jnp.log(self.weights))

    @classmethod
    def from_clips(cls, clips: Sequence[ReferenceClip],
                   weights: Optional[jax.Array] = None) -> "ClipLibrary":
        stacked = jax.tree_util.tree_map(
            lambda *xs: None if xs[0] is None else jnp.stack(xs), *clips)
        return cls(clips=stacked, weights=weights)
