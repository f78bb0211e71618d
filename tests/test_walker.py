"""Rat walker metadata (reference walker.py equivalents)."""

import numpy as np
import pytest

from vnl_tpu import mjcf
from vnl_tpu.envs.walker import RAT_MOCAP_JOINTS, RatWalker


@pytest.fixture(scope="module")
def walker():
    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    return RatWalker(m)


def test_mocap_joint_order_complete(walker):
    order = walker.mocap_joint_order
    assert len(order) == 67
    assert order == tuple(j for j in RAT_MOCAP_JOINTS)


def test_tracking_bodies_filter(walker):
    bodies = walker.mocap_tracking_bodies
    assert len(bodies) == 18
    assert not any(b.startswith(("vertebra", "hand", "toe")) for b in bodies)


def test_pose_to_actuation_affine_map(walker):
    """u = (2q - (lo+hi)) / (hi-lo) (reference walker.py:295-312):
    midpoint pose -> 0, upper-limit pose -> +1, lower-limit -> -1."""
    m = walker.model
    order = walker.joint_actuator_order
    assert len(order) == m.nu
    trnid = np.asarray(m.actuator_trnid).reshape(-1)
    rng = np.asarray(m.jnt_range)[trnid]

    pose_mid = np.zeros(len(walker.mocap_joint_order))
    pose_mid[order] = 0.5 * (rng[:, 0] + rng[:, 1])
    np.testing.assert_allclose(walker.pose_to_actuation(pose_mid),
                               0.0, atol=1e-6)
    pose_hi = np.zeros_like(pose_mid)
    pose_hi[order] = rng[:, 1]
    np.testing.assert_allclose(walker.pose_to_actuation(pose_hi),
                               1.0, atol=1e-6)
    pose_lo = np.zeros_like(pose_mid)
    pose_lo[order] = rng[:, 0]
    np.testing.assert_allclose(walker.pose_to_actuation(pose_lo),
                               -1.0, atol=1e-6)
