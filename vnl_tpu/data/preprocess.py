"""STAC qpos -> ReferenceClip preprocessing, fully on-device.

Re-implements /root/reference/preprocessing/mjx_preprocess.py:43-193 on the
first-party engine: a jit FK scan over frames extracts per-frame body poses,
and finite differences (quaternion differences for the root) produce
velocities.  Unlike the reference (host loop over frames for the gyro at
mjx_preprocess.py:186-191), everything here is batched/scan-compiled.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu import physics
from vnl_tpu.data.io import load_stac_qpos
from vnl_tpu.data.reference_clip import ReferenceClip
from vnl_tpu.physics.model import Model


# legacy-pipeline feature body sets (/root/reference/walker.py:183-190,152)
END_EFFECTOR_BODIES = ("lower_arm_R", "lower_arm_L", "foot_R", "foot_L")
HEAD_BODY = "skull"


def extract_features(m: Model, mocap_qpos: jax.Array,
                     legacy_features: bool = False,
                     root_body: int = 1) -> ReferenceClip:
    """FK over frames -> positions/quaternions pytree (velocities not set).

    legacy_features: also compute the 13-field legacy features
    (/root/reference/mocap_preprocess.py:169-209): subtree center of mass,
    end-effector and appendage positions egocentric to the root body
    (dm_control ``end_effectors_pos``/``appendages_pos`` semantics:
    (xpos - xpos_root) @ xmat_root)."""
    d0 = physics.make_data(m, dtype=mocap_qpos.dtype)
    dtype = mocap_qpos.dtype
    legacy_features = legacy_features and all(
        b in m.body_names for b in END_EFFECTOR_BODIES + (HEAD_BODY,))
    if legacy_features:
        bmap = {n: i for i, n in enumerate(m.body_names)}
        app_ids = jnp.asarray([bmap[b] for b in END_EFFECTOR_BODIES]
                              + [bmap[HEAD_BODY]])
        mass = jnp.asarray(m.body_mass, dtype)

    def f(d, qpos):
        d = d.replace(qpos=qpos, qvel=jnp.zeros(m.nv, qpos.dtype))
        d = physics.kinematics(m, d)
        extras = ()
        if legacy_features:
            com = (mass @ d.xipos) / jnp.sum(mass)
            rel = (d.xpos[app_ids] - d.xpos[root_body]) @ d.xmat[root_body]
            extras = (com, rel)
        return d, (qpos[:3], qpos[3:7], qpos[7:], d.xpos, d.xquat) + extras

    _, outs = jax.lax.scan(f, d0, mocap_qpos)
    position, quaternion, joints, xpos, xquat = outs[:5]
    clip = ReferenceClip(
        position=position, quaternion=quaternion, joints=joints,
        body_positions=xpos, body_quaternions=xquat)
    if legacy_features:
        com, rel = outs[5:]
        clip = clip.replace(center_of_mass=com,
                            end_effectors=rel[:, :4],
                            appendages=rel)
    return clip


def compute_velocity_from_kinematics(qpos_trajectory: jax.Array,
                                     dt: float) -> jax.Array:
    """(T+1, nq) qpos -> (T, nv) velocities; root gyro in local frame
    (mjx_preprocess.py:170-193 semantics, vectorized)."""
    q = qpos_trajectory
    qvel_translation = (q[1:, :3] - q[:-1, :3]) / dt
    diff = vmath.quat_diff(q[:-1, 3:7], q[1:, 3:7])
    diff = vmath.normalize(diff)
    qvel_gyro = vmath.quat_to_axis_angle(diff) / dt
    qvel_joints = (q[1:, 7:] - q[:-1, 7:]) / dt
    return jnp.concatenate([qvel_translation, qvel_gyro, qvel_joints], axis=1)


def make_static_clip(model: Model, qpos: Optional[jax.Array] = None,
                     clip_length: int = 250,
                     dtype=jnp.float32) -> ReferenceClip:
    """Holds one pose for clip_length frames (with com + zero velocities).

    Covers the reference's synthetic clips (ant_traj_still,
    humanoid_traj_stand) used to bring up tracking envs without mocap data.
    """
    if qpos is None:
        qpos = model.qpos0
    qpos = jnp.asarray(qpos, dtype)
    d = physics.make_data(model, qpos=qpos, dtype=dtype)
    d = physics.kinematics(model, d)
    com = (jnp.sum(model.body_mass[:, None] * d.xipos, axis=0)
           / jnp.sum(model.body_mass))
    T = clip_length
    tile = lambda x: jnp.tile(x[None], (T,) + (1,) * x.ndim)
    return ReferenceClip(
        position=tile(qpos[:3]), quaternion=tile(qpos[3:7]),
        joints=tile(qpos[7:]),
        body_positions=tile(d.xpos), body_quaternions=tile(d.xquat),
        velocity=jnp.zeros((T, 3), dtype),
        joints_velocity=jnp.zeros((T, model.nq - 7), dtype),
        angular_velocity=jnp.zeros((T, 3), dtype),
        center_of_mass=tile(com))


def process_clip(stac_path: Optional[str] = None,
                 model: Optional[Model] = None,
                 mocap_qpos: Optional[np.ndarray] = None,
                 mjcf_path: str = "/root/reference/assets/rodent.xml",
                 scale_factor: float = 0.9,
                 start_step: int = 0,
                 clip_length: int = 250,
                 max_qvel: float = 20.0,
                 dt: float = 0.02) -> ReferenceClip:
    """Processes a STAC qpos window into a ReferenceClip
    (process_clip, mjx_preprocess.py:43-107)."""
    if model is None:
        from vnl_tpu import mjcf as mjcf_mod
        model = mjcf_mod.load_model(
            mjcf_path, rescale=(scale_factor, scale_factor),
            torque_actuators=True)
    if mocap_qpos is None:
        mocap_qpos = load_stac_qpos(stac_path)
    q = jnp.asarray(mocap_qpos)[start_step:start_step + clip_length]

    clip = extract_features(model, q)

    # pad last frame so velocities have length T
    q_pad = jnp.concatenate([q, q[-1:, :]], axis=0)
    qvel = compute_velocity_from_kinematics(q_pad, dt)
    joints_vel = jnp.clip(qvel[:, 6:], -max_qvel, max_qvel)
    return clip.replace(
        velocity=qvel[:, :3],
        angular_velocity=qvel[:, 3:6],
        joints_velocity=joints_vel,
    )
