"""MJCF compiler vs the mujoco.MjModel oracle on the reference assets."""

import mujoco
import numpy as np
import jax.numpy as jnp
import pytest

from vnl_tpu import mjcf

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module", params=["ant", "humanoid", "rodent"])
def pair(request):
    name = request.param
    mj = mujoco.MjModel.from_xml_path(f"{ASSETS}/{name}.xml")
    m = mjcf.load_model(f"{ASSETS}/{name}.xml")
    return name, mj, m


def test_sizes(pair):
    name, mj, m = pair
    assert (m.nq, m.nv, m.nu, m.na) == (mj.nq, mj.nv, mj.nu, mj.na)
    assert (m.nbody, m.njnt, m.ngeom) == (mj.nbody, mj.njnt, mj.ngeom)
    assert m.nkey == mj.nkey


def test_tree_and_joints(pair):
    name, mj, m = pair
    np.testing.assert_array_equal(m.body_parentid, mj.body_parentid)
    np.testing.assert_array_equal(m.jnt_type, mj.jnt_type)
    np.testing.assert_array_equal(m.jnt_qposadr, mj.jnt_qposadr)
    np.testing.assert_array_equal(m.jnt_dofadr, mj.jnt_dofadr)
    np.testing.assert_array_equal(m.jnt_limited, mj.jnt_limited.astype(bool))
    np.testing.assert_allclose(np.asarray(m.jnt_range), mj.jnt_range, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.jnt_axis), mj.jnt_axis, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.jnt_stiffness), mj.jnt_stiffness,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.qpos0), mj.qpos0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.qpos_spring), mj.qpos_spring,
                               atol=1e-6)


def test_dofs(pair):
    name, mj, m = pair
    np.testing.assert_allclose(np.asarray(m.dof_armature), mj.dof_armature,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.dof_damping), mj.dof_damping,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.dof_invweight0), mj.dof_invweight0,
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.body_invweight0),
                               mj.body_invweight0[:, 0], rtol=2e-3, atol=1e-6)


def test_inertia(pair):
    name, mj, m = pair
    np.testing.assert_allclose(np.asarray(m.body_mass), mj.body_mass,
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_ipos), mj.body_ipos,
                               atol=1e-6)
    # principal moment ordering is not canonical in MuJoCo; compare the
    # reconstructed world-frame inertia tensors instead
    def tensors(inertia, iquat):
        ws, xs, ys, zs = iquat.T
        R = np.stack([
            1 - 2 * (ys**2 + zs**2), 2 * (xs*ys - ws*zs), 2 * (xs*zs + ws*ys),
            2 * (xs*ys + ws*zs), 1 - 2 * (xs**2 + zs**2), 2 * (ys*zs - ws*xs),
            2 * (xs*zs - ws*ys), 2 * (ys*zs + ws*xs), 1 - 2 * (xs**2 + ys**2),
        ], axis=-1).reshape(-1, 3, 3)
        return np.einsum("bij,bj,bkj->bik", R, inertia, R)
    t_mine = tensors(np.asarray(m.body_inertia), np.asarray(m.body_iquat))
    t_mj = tensors(mj.body_inertia, mj.body_iquat)
    np.testing.assert_allclose(t_mine, t_mj, rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.body_subtreemass),
                               mj.body_subtreemass, rtol=1e-5)


def test_geoms(pair):
    name, mj, m = pair
    np.testing.assert_array_equal(m.geom_type, mj.geom_type)
    np.testing.assert_array_equal(m.geom_bodyid, mj.geom_bodyid)
    np.testing.assert_allclose(np.asarray(m.geom_pos), mj.geom_pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_size), mj.geom_size,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_friction), mj.geom_friction,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_solref), mj.geom_solref,
                               atol=1e-6)
    # quats equal up to sign
    dq = np.abs(np.asarray(m.geom_quat))
    np.testing.assert_allclose(dq, np.abs(mj.geom_quat), atol=1e-6)


def test_actuators(pair):
    name, mj, m = pair
    np.testing.assert_array_equal(m.actuator_trnid, mj.actuator_trnid[:, 0])
    np.testing.assert_array_equal(m.actuator_dyntype, mj.actuator_dyntype)
    np.testing.assert_array_equal(m.actuator_biastype, mj.actuator_biastype)
    np.testing.assert_allclose(np.asarray(m.actuator_gear),
                               mj.actuator_gear[:, 0], atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.actuator_gainprm),
                               mj.actuator_gainprm[:, :3], atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.actuator_biasprm),
                               mj.actuator_biasprm[:, :3], atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.actuator_ctrlrange),
                               mj.actuator_ctrlrange, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(m.actuator_actadr),
                                  np.where(mj.actuator_actadr >= 0,
                                           mj.actuator_actadr, -1)
                                  if mj.na else np.full(mj.nu, -1))


def test_options(pair):
    name, mj, m = pair
    assert m.opt.timestep == mj.opt.timestep
    assert m.opt.solver == mj.opt.solver
    assert m.opt.cone == mj.opt.cone
    assert m.opt.iterations == mj.opt.iterations
    assert m.opt.impratio == mj.opt.impratio
    assert tuple(m.opt.gravity) == tuple(mj.opt.gravity)


def test_keyframes(pair):
    name, mj, m = pair
    if mj.nkey:
        np.testing.assert_allclose(np.asarray(m.key_qpos), mj.key_qpos,
                                   atol=1e-6)


def test_contact_pair_candidates(pair):
    """Every oracle contact (over random configs) is a candidate pair."""
    name, mj, m = pair
    cand = set(zip(m.pair_geom1.tolist(), m.pair_geom2.tolist()))
    d = mujoco.MjData(mj)
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = mj.qpos0.copy()
        if mj.jnt_type[0] == 0:  # free root: randomize pose
            q[:3] += rng.normal(size=3) * 0.3
            qq = rng.normal(size=4)
            q[3:7] = qq / np.linalg.norm(qq)
            lo, hi = mj.jnt_range[1:, 0], mj.jnt_range[1:, 1]
            q[7:] = rng.uniform(lo, hi)
        d.qpos[:] = q
        mujoco.mj_forward(mj, d)
        for g1, g2 in zip(d.contact.geom1, d.contact.geom2):
            key = (min(g1, g2), max(g1, g2))
            assert key in cand or (key[1], key[0]) in cand, (name, key)


def test_rodent_reference_pipeline():
    """Torque conversion + 0.9 rescale vs the dm_control oracle pipeline."""
    from dm_control import mjcf as dm_mjcf
    from dm_control.locomotion.walkers import rescale as dm_rescale

    root = dm_mjcf.from_path(f"{ASSETS}/rodent.xml")
    for actuator in root.find_all("actuator"):
        actuator.gainprm = [actuator.forcerange[1]]
        del actuator.biastype
        del actuator.biasprm
    dm_rescale.rescale_subtree(root, 0.9, 0.9)
    mj = dm_mjcf.Physics.from_mjcf_model(root).model.ptr

    m = mjcf.load_model(f"{ASSETS}/rodent.xml", rescale=(0.9, 0.9),
                        torque_actuators=True)
    np.testing.assert_allclose(np.asarray(m.body_mass), mj.body_mass,
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(m.body_pos), mj.body_pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.geom_size), mj.geom_size,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.qpos0), mj.qpos0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.actuator_gainprm),
                               mj.actuator_gainprm[:, :3], atol=1e-8)
    np.testing.assert_array_equal(m.actuator_biastype, mj.actuator_biastype)
    assert m.na == mj.na == m.nu  # filter activations preserved


@pytest.mark.parametrize("path", [
    "/root/reference/assets/rodent_pair.xml",
    "/root/reference/assets/humanoid_pair.xml",
])
def test_replicate_pair_models(path):
    """<replicate> expansion (parser._expand_replicates) vs the oracle:
    the two-instance overlay models compile with identical sizes, name-
    aligned body tables, replicated actuators/sensors, and FK parity."""
    import jax
    from vnl_tpu import physics

    mj = mujoco.MjModel.from_xml_path(path)
    m = mjcf.load_model(path, dtype=jnp.float64)
    assert (m.nbody, m.njnt, m.nu) == (mj.nbody, mj.njnt, mj.nu)
    order = [mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_BODY, i)
             for i in range(mj.nbody)]
    ours = {n: i for i, n in enumerate(m.body_names)}
    idx = [ours[n] for n in order]  # KeyError = name scheme mismatch
    np.testing.assert_allclose(np.asarray(m.body_pos)[idx], mj.body_pos,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(m.body_quat)[idx], mj.body_quat,
                               atol=1e-10)
    d_mj = mujoco.MjData(mj)
    mujoco.mj_forward(mj, d_mj)
    d = physics.make_data(m, dtype=jnp.float64)
    d = jax.jit(lambda x: physics.forward(m, x))(d)
    np.testing.assert_allclose(np.asarray(d.xpos)[idx], d_mj.xpos,
                               atol=1e-7)
