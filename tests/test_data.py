"""Data layer: clip loading, preprocessing FK, multi-clip library."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnl_tpu import mjcf
from vnl_tpu.data import (ClipLibrary, ReferenceClip, load_clip,
                          process_clip)
from vnl_tpu.data.preprocess import compute_velocity_from_kinematics

CLIP = "/root/reference/clips/transform_snips_groom.p"


def test_load_legacy_clip():
    c = load_clip(CLIP)
    assert c.position.shape == (250, 3)
    assert c.joints.shape == (250, 67)
    assert c.body_positions.shape == (250, 18, 3)
    assert np.isfinite(np.asarray(c.velocity)).all()


def test_velocity_from_kinematics_matches_reference_semantics(rng):
    """Constant angular velocity roundtrip through quaternion integration."""
    from vnl_tpu import math as vmath
    dt = 0.02
    omega = jnp.asarray([0.4, -0.3, 1.1])
    T = 20
    qs = [jnp.asarray([1.0, 0, 0, 0])]
    for _ in range(T):
        qs.append(vmath.quat_integrate(qs[-1], omega, dt))
    quat = jnp.stack(qs)
    pos = jnp.cumsum(jnp.ones((T + 1, 3)) * 0.01, axis=0)
    joints = jnp.zeros((T + 1, 4))
    qpos = jnp.concatenate([pos, quat, joints], axis=1)
    qvel = compute_velocity_from_kinematics(qpos, dt)
    np.testing.assert_allclose(np.asarray(qvel[:, 3:6]),
                               np.tile(np.asarray(omega), (T, 1)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(qvel[:, :3]), 0.01 / dt, atol=1e-4)


def test_process_clip_fk_matches_loaded_clip():
    """Re-deriving features from the clip's own qpos via our FK should
    reproduce the shipped body positions (legacy pipeline used dm_control
    FK on the same rescaled model)."""
    c = load_clip(CLIP)
    qpos = np.concatenate([np.asarray(c.position), np.asarray(c.quaternion),
                           np.asarray(c.joints)], axis=1)
    model = mjcf.load_model("/root/reference/assets/rodent.xml",
                            rescale=(0.9, 0.9), torque_actuators=True)
    out = process_clip(model=model, mocap_qpos=qpos[:16], clip_length=16)
    # compare walker-body positions (clip body axis = 18 filtered bodies)
    import re
    names = [b for b in model.body_names[1:]
             if not re.match(r"(vertebra|hand|toe)", b)]
    idx = np.array([model.body_names.index(n) for n in names])
    got = np.asarray(out.body_positions)[:, idx]
    want = np.asarray(c.body_positions)[:16]
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_clip_library_gather():
    c = load_clip(CLIP)
    c2 = jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x) + 1.0, c)
    lib = ClipLibrary.from_clips([c, c2])
    assert lib.num_clips == 2
    g0 = lib.get(jnp.asarray(0))
    g1 = lib.get(jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(g1.position),
                               np.asarray(g0.position) + 1.0, atol=1e-5)
    # gather works under jit with traced ids
    f = jax.jit(lambda i: lib.get(i).position[0])
    assert np.isfinite(np.asarray(f(jnp.asarray(1)))).all()


def test_clip_window_slice():
    c = load_clip(CLIP)
    c = jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.asarray(x), c)
    w = c.slice(jnp.asarray(10), 5)
    assert w.position.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(w.position),
                               np.asarray(c.position[10:15]), atol=0)


def test_legacy_features_match_shipped_clip():
    """com / end_effectors / appendages recomputed from the shipped clip's
    own qpos must match the stored dm_control-derived values
    (/root/reference/mocap_preprocess.py:169-209)."""
    from vnl_tpu.data.pipeline import process_recording
    c = load_clip(CLIP)
    qpos = np.concatenate([np.asarray(c.position), np.asarray(c.quaternion),
                           np.asarray(c.joints)], axis=1)
    model = mjcf.load_model("/root/reference/assets/rodent.xml",
                            rescale=(0.9, 0.9), torque_actuators=True)
    lib = process_recording(model, qpos[:32], clip_length=32,
                            legacy_features=True)
    out = jax.tree_util.tree_map(
        lambda x: None if x is None else x[0], lib.clips)
    assert out.center_of_mass is not None
    assert out.end_effectors.shape == (32, 4, 3)
    assert out.appendages.shape == (32, 5, 3)
    np.testing.assert_allclose(np.asarray(out.center_of_mass),
                               np.asarray(c.center_of_mass)[:32], atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.end_effectors),
                               np.asarray(c.end_effectors)[:32], atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.appendages),
                               np.asarray(c.appendages)[:32], atol=3e-3)


def test_z_offset_floor_alignment():
    """adjust_z_offset shifts qpos z / com / body z by the feet heuristic
    (mocap_preprocess.py:222-233) and leaves velocities unchanged."""
    from vnl_tpu.data.pipeline import process_recording
    c = load_clip(CLIP)
    qpos = np.concatenate([np.asarray(c.position), np.asarray(c.quaternion),
                           np.asarray(c.joints)], axis=1)[:16]
    qpos[:, 2] += 0.05  # float the clip; alignment should pull it back down
    model = mjcf.load_model("/root/reference/assets/rodent.xml",
                            rescale=(0.9, 0.9), torque_actuators=True)
    raw = process_recording(model, qpos, clip_length=16)
    adj = process_recording(model, qpos, clip_length=16, adjust_z_offset=1.0)
    z_shift = np.asarray(raw.clips.position[0, :, 2]
                         - adj.clips.position[0, :, 2])
    # feet were lifted ~0.05 above the floor: offset recovers roughly that
    assert np.allclose(z_shift, z_shift[0], atol=1e-6)
    assert 0.02 < z_shift[0] < 0.08
    np.testing.assert_allclose(np.asarray(adj.clips.velocity),
                               np.asarray(raw.clips.velocity), atol=1e-5)
