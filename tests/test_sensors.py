"""Sensor evaluation vs the MuJoCo oracle (rodent sensor block)."""

import importlib

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from vnl_tpu import mjcf, physics


@pytest.fixture(autouse=True, scope="module")
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup():
    mj = mujoco.MjModel.from_xml_path("/root/reference/assets/rodent.xml")
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        dtype=jnp.float64,
                        overrides={"iterations": 50, "ls_iterations": 25})
    return mj, m


def _state(mj, seed, sink=0.01):
    rng = np.random.default_rng(seed)
    qpos = mj.qpos0.copy()
    qpos[2] -= sink
    lo, hi = mj.jnt_range[1:, 0], mj.jnt_range[1:, 1]
    qpos[7:] = 0.5 * (lo + hi) + (hi - lo) * rng.uniform(-0.2, 0.2,
                                                         size=len(lo))
    qvel = rng.normal(size=mj.nv) * 0.3
    return qpos, qvel


def test_sensor_layout(setup):
    mj, m = setup
    assert m.nsensor == mj.nsensor
    assert m.nsensordata == mj.nsensordata
    np.testing.assert_array_equal(m.sensor_adr, mj.sensor_adr)
    np.testing.assert_array_equal(m.sensor_dim, mj.sensor_dim)


def test_velocity_sensors_exact(setup):
    """gyro / velocimeter / subtreelinvel match the oracle exactly."""
    mj, m = setup
    d_mj = mujoco.MjData(mj)
    qpos, qvel = _state(mj, 3)
    d_mj.qpos[:] = qpos
    d_mj.qvel[:] = qvel
    mujoco.mj_forward(mj, d_mj)
    d = physics.make_data(m, qpos=qpos, qvel=qvel, dtype=jnp.float64)
    d = jax.jit(lambda d: physics.forward(m, d, compute_sensors=True))(d)
    sd = np.asarray(d.sensordata)
    names = [mj.sensor(i).name for i in range(mj.nsensor)]
    for i, n in enumerate(names):
        adr, dim = mj.sensor_adr[i], mj.sensor_dim[i]
        if n in ("gyro", "velocimeter", "torso"):
            np.testing.assert_allclose(sd[adr:adr + dim],
                                       d_mj.sensordata[adr:adr + dim],
                                       atol=1e-8, err_msg=n)
        elif n == "accelerometer":
            # depends on constrained qacc: solver-tolerance comparison
            scale = max(1.0, np.abs(d_mj.sensordata[adr:adr + dim]).max())
            assert np.abs(sd[adr:adr + dim]
                          - d_mj.sensordata[adr:adr + dim]).max() / scale < 0.05


def test_touch_sensors(setup):
    """Touch activates on the same site set as the oracle, with forces
    within solver tolerance."""
    mj, m = setup
    d_mj = mujoco.MjData(mj)
    qpos, qvel = _state(mj, 3)
    d_mj.qpos[:] = qpos
    d_mj.qvel[:] = qvel
    mujoco.mj_forward(mj, d_mj)
    d = physics.make_data(m, qpos=qpos, qvel=qvel, dtype=jnp.float64)
    d = jax.jit(lambda d: physics.forward(m, d, compute_sensors=True))(d)
    sd = np.asarray(d.sensordata)
    for i in range(mj.nsensor):
        if mj.sensor_type[i] != mujoco.mjtSensor.mjSENS_TOUCH:
            continue
        adr = mj.sensor_adr[i]
        mine, orc = sd[adr], d_mj.sensordata[adr]
        assert (mine > 0.1) == (orc > 0.1), mj.sensor(i).name
        if orc > 0.1:
            assert abs(mine - orc) / orc < 0.25, (mj.sensor(i).name, mine, orc)


def test_pair_expansion_matches_collide(setup):
    mj, m = setup
    cmod = importlib.import_module("vnl_tpu.physics.collision")
    d = physics.make_data(m, dtype=jnp.float64)
    d = physics.kinematics(m, d)
    _, _, _, con_pair = cmod.collide(m, d)
    np.testing.assert_array_equal(con_pair, cmod.pair_expansion(m))
