"""Property test: randomized MJCF models vs the MuJoCo oracle.

Generates random kinematic trees (hinge/slide/ball joints, sphere/capsule/
box geoms, optional free root) and checks smooth dynamics parity — coverage
for joint/geom combinations the reference assets don't exercise (ball and
slide joints especially).
"""

import io

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


def random_mjcf(rng, seed):
    body_count = rng.integers(3, 7)
    out = io.StringIO()
    out.write('<mujoco model="prop">\n'
              '  <compiler angle="radian"/>\n'
              '  <option timestep="0.002"/>\n'
              '  <worldbody>\n')
    depth = 0
    free_root = bool(rng.integers(0, 2))
    for b in range(body_count):
        pos = rng.uniform(-0.2, 0.2, 3)
        pos[2] = abs(pos[2]) + 0.05
        out.write(f'<body name="b{b}" pos="{pos[0]} {pos[1]} {pos[2]}">\n')
        if b == 0 and free_root:
            out.write('<freejoint/>\n')
        else:
            jt = rng.choice(["hinge", "slide", "ball", "hinge"])
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            if jt == "ball":
                out.write(f'<joint name="j{b}" type="ball" damping="0.1"/>\n')
            else:
                out.write(
                    f'<joint name="j{b}" type="{jt}" '
                    f'axis="{axis[0]} {axis[1]} {axis[2]}" damping="0.05" '
                    f'armature="0.01" stiffness="0.2"/>\n')
        gt = rng.choice(["sphere", "capsule", "box"])
        size = rng.uniform(0.03, 0.08, 3)
        if gt == "sphere":
            out.write(f'<geom type="sphere" size="{size[0]}" '
                      'contype="0" conaffinity="0"/>\n')
        elif gt == "capsule":
            out.write(f'<geom type="capsule" size="{size[0]} {size[1]}" '
                      'contype="0" conaffinity="0"/>\n')
        else:
            out.write(f'<geom type="box" size="{size[0]} {size[1]} {size[2]}"'
                      ' contype="0" conaffinity="0"/>\n')
        depth += 1
        if rng.uniform() < 0.4 and depth > 1:  # close this branch
            out.write('</body>\n' * 1)
            depth -= 1
    out.write('</body>\n' * depth)
    out.write('</worldbody>\n</mujoco>')
    return out.getvalue()


@pytest.mark.parametrize("seed", range(8))
def test_random_tree_smooth_dynamics(seed):
    rng = np.random.default_rng(seed)
    xml = random_mjcf(rng, seed)
    mj = mujoco.MjModel.from_xml_string(xml)
    m = mjcf.load_model(xml, dtype=jnp.float64)
    assert (m.nq, m.nv) == (mj.nq, mj.nv)

    d_mj = mujoco.MjData(mj)
    qpos = mj.qpos0.copy()
    # random perturbation respecting quaternion blocks
    for j in range(mj.njnt):
        adr = mj.jnt_qposadr[j]
        t = mj.jnt_type[j]
        if t == mujoco.mjtJoint.mjJNT_FREE:
            qpos[adr:adr + 3] += rng.normal(size=3) * 0.1
            q = rng.normal(size=4)
            qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
        elif t == mujoco.mjtJoint.mjJNT_BALL:
            q = rng.normal(size=4)
            qpos[adr:adr + 4] = q / np.linalg.norm(q)
        else:
            qpos[adr] += rng.normal() * 0.3
    qvel = rng.normal(size=mj.nv) * 0.4
    d_mj.qpos[:] = qpos
    d_mj.qvel[:] = qvel
    mujoco.mj_forward(mj, d_mj)

    d = physics.make_data(m, qpos=qpos, qvel=qvel, dtype=jnp.float64)
    d = jax.jit(lambda d: physics.forward(m, d))(d)

    np.testing.assert_allclose(np.asarray(d.xpos), d_mj.xpos, atol=1e-9)
    M_mj = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d_mj, M_mj)
    np.testing.assert_allclose(np.asarray(d.qM), M_mj, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.qfrc_bias), d_mj.qfrc_bias,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(d.qfrc_passive),
                               d_mj.qfrc_passive, atol=1e-8)
    scale = max(1.0, np.abs(d_mj.qacc_smooth).max())
    np.testing.assert_allclose(np.asarray(d.qacc_smooth) / scale,
                               d_mj.qacc_smooth / scale, atol=1e-6)

    # a few integration steps track the oracle
    d2 = physics.make_data(m, qpos=qpos, qvel=qvel, dtype=jnp.float64)
    step = jax.jit(lambda d: physics.step(m, d))
    for _ in range(20):
        mujoco.mj_step(mj, d_mj)
        d2 = step(d2)
    np.testing.assert_allclose(np.asarray(d2.qpos), d_mj.qpos, atol=2e-4)
