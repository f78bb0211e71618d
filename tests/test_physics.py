"""Physics engine vs the MuJoCo C oracle (mj_forward / mj_step).

Strategy (SURVEY.md §4): golden comparisons at randomized states for each
reference asset — FK, mass matrix, bias forces, smooth and constrained
accelerations — then short trajectory rollouts.  Oracle calls use fp64; our
engine runs fp64 here for tight tolerances (TPU runtime is fp32).
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from vnl_tpu import mjcf, physics


@pytest.fixture(autouse=True, scope="module")
def _x64():
    """fp64 for tight oracle comparisons, scoped to this module only (other
    test modules run fp32 like the TPU runtime)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

ASSETS = "/root/reference/assets"


def random_state(mj, rng, scale=0.3):
    qpos = mj.qpos0.copy()
    if mj.jnt_type[0] == 0:
        qpos[:3] += rng.normal(size=3) * 0.1
        q = rng.normal(size=4)
        qpos[3:7] = q / np.linalg.norm(q)
        lo = mj.jnt_range[1:, 0]
        hi = mj.jnt_range[1:, 1]
        mid = 0.5 * (lo + hi)
        qpos[7:] = mid + (hi - lo) * rng.uniform(-0.6, 0.6, size=len(lo))
    qvel = rng.normal(size=mj.nv) * scale
    return qpos, qvel


@pytest.fixture(scope="module", params=["ant", "humanoid", "rodent"])
def setup(request):
    name = request.param
    # compare at converged solver settings on both sides: the assets ship
    # truncated iteration counts (e.g. humanoid iterations=1) whose result
    # depends on warmstart details, not on solution correctness
    mj = mujoco.MjModel.from_xml_path(f"{ASSETS}/{name}.xml")
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model(f"{ASSETS}/{name}.xml", dtype=jnp.float64,
                        overrides={"iterations": 50, "ls_iterations": 25})
    fwd = jax.jit(lambda d: physics.forward(m, d))
    return name, mj, m, fwd


def test_forward_matches_oracle(setup):
    name, mj, m, fwd = setup
    rng = np.random.default_rng(3)
    d_mj = mujoco.MjData(mj)
    for trial in range(3):
        qpos, qvel = random_state(mj, rng)
        ctrl = rng.uniform(-1, 1, size=mj.nu)
        mujoco.mj_resetData(mj, d_mj)
        d_mj.qpos[:] = qpos
        d_mj.qvel[:] = qvel
        d_mj.ctrl[:] = ctrl
        if mj.na:
            act = rng.uniform(-0.5, 0.5, size=mj.na)
            d_mj.act[:] = act
        mujoco.mj_forward(mj, d_mj)

        d = physics.make_data(m, qpos=qpos, qvel=qvel, dtype=jnp.float64)
        d = d.replace(ctrl=jnp.asarray(ctrl))
        if mj.na:
            d = d.replace(act=jnp.asarray(act))
        d = fwd(d)

        np.testing.assert_allclose(np.asarray(d.xpos), d_mj.xpos, atol=1e-9)
        np.testing.assert_allclose(np.asarray(d.subtree_com),
                                   d_mj.subtree_com, atol=1e-9)
        M_mj = np.zeros((mj.nv, mj.nv))
        mujoco.mj_fullM(mj, d_mj, M_mj)
        np.testing.assert_allclose(np.asarray(d.qM), M_mj, atol=1e-9)
        np.testing.assert_allclose(np.asarray(d.qfrc_bias), d_mj.qfrc_bias,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(d.qfrc_passive),
                                   d_mj.qfrc_passive, atol=1e-8)
        np.testing.assert_allclose(np.asarray(d.qfrc_actuator),
                                   d_mj.qfrc_actuator, atol=1e-8)
        smooth_scale = max(1.0, np.abs(d_mj.qacc_smooth).max())
        np.testing.assert_allclose(np.asarray(d.qacc_smooth) / smooth_scale,
                                   d_mj.qacc_smooth / smooth_scale, atol=1e-5)
        # constrained acceleration: solvers differ in iteration details, so
        # compare with a scale-relative tolerance
        scale = max(1.0, np.abs(d_mj.qacc).max())
        err = np.abs(np.asarray(d.qacc) - d_mj.qacc).max() / scale
        assert err < 5e-3, (name, trial, err)


def test_act_dot_filter(setup):
    name, mj, m, fwd = setup
    if not mj.na:
        pytest.skip("no activation dynamics")
    rng = np.random.default_rng(5)
    d_mj = mujoco.MjData(mj)
    ctrl = rng.uniform(-1, 1, size=mj.nu)
    act = rng.uniform(-0.5, 0.5, size=mj.na)
    d_mj.ctrl[:] = ctrl
    d_mj.act[:] = act
    mujoco.mj_forward(mj, d_mj)
    d = physics.make_data(m, dtype=jnp.float64).replace(
        ctrl=jnp.asarray(ctrl), act=jnp.asarray(act))
    d = fwd(d)
    np.testing.assert_allclose(np.asarray(d.act_dot), d_mj.act_dot, atol=1e-9)


def test_trajectory_tracks_oracle(setup):
    """200-step rollout with fixed ctrl stays close to the oracle."""
    name, mj, m, fwd = setup
    rng = np.random.default_rng(7)
    ctrl = rng.uniform(-0.3, 0.3, size=mj.nu)
    d_mj = mujoco.MjData(mj)
    d_mj.ctrl[:] = ctrl
    d = physics.make_data(m, dtype=jnp.float64).replace(ctrl=jnp.asarray(ctrl))
    step = jax.jit(lambda d: physics.step(m, d))
    for _ in range(200):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    err = np.abs(np.asarray(d.qpos) - d_mj.qpos).max()
    # chaotic contact dynamics diverge; require same qualitative state
    assert err < 0.25, (name, err)
    assert not np.isnan(np.asarray(d.qpos)).any()


def test_vmap_batched_step(setup):
    """Engine must vmap over env batches and stay finite."""
    name, mj, m, fwd = setup
    if name != "ant":
        pytest.skip("vmap smoke test on ant only (speed)")
    rng = np.random.default_rng(11)
    B = 8
    base = physics.make_data(m, dtype=jnp.float64)
    qpos = jnp.asarray(np.tile(np.asarray(base.qpos), (B, 1)))
    qpos = qpos.at[:, :2].add(jnp.asarray(rng.normal(size=(B, 2)) * 0.1))
    batch = jax.vmap(lambda q: physics.make_data(m, qpos=q, dtype=jnp.float64))(qpos)
    step = jax.jit(jax.vmap(lambda d: physics.step(m, d)))
    for _ in range(10):
        batch = step(batch)
    assert batch.qpos.shape == (B, m.nq)
    assert bool(jnp.isfinite(batch.qpos).all())


def test_rk4_matches_oracle():
    """RK4 integrator (mj_RungeKutta tableau) vs the oracle on ant."""
    mj = mujoco.MjModel.from_xml_path(f"{ASSETS}/ant.xml")
    mj.opt.integrator = mujoco.mjtIntegrator.mjINT_RK4
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model(f"{ASSETS}/ant.xml", dtype=jnp.float64,
                        overrides={"integrator": "rk4", "iterations": 50,
                                   "ls_iterations": 25})
    rng = np.random.default_rng(5)
    ctrl = rng.uniform(-0.2, 0.2, size=mj.nu)
    d_mj = mujoco.MjData(mj)
    d_mj.ctrl[:] = ctrl
    d = physics.make_data(m, dtype=jnp.float64).replace(ctrl=jnp.asarray(ctrl))
    d = jax.jit(lambda x: physics.forward(m, x))(d)
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(50):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    err = np.abs(np.asarray(d.qpos) - d_mj.qpos).max()
    assert err < 0.05, err
    assert not np.isnan(np.asarray(d.qpos)).any()

    # RK4 at dt must be closer to a fine-Euler reference than Euler at dt
    # (order-of-accuracy sanity, contact-free pendulum swing)
    pend = """<mujoco><option timestep=\"0.01\" integrator=\"RK4\"/>
      <worldbody><body pos=\"0 0 1\">
        <joint name=\"hinge\" type=\"hinge\" axis=\"0 1 0\"/>
        <geom type=\"capsule\" fromto=\"0 0 0 0.5 0 0\" size=\"0.02\"
              density=\"1000\"/>
      </body></worldbody></mujoco>"""
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(pend)
        path = f.name
    m_rk = mjcf.load_model(path, dtype=jnp.float64)
    m_eu = mjcf.load_model(path, dtype=jnp.float64,
                           overrides={"integrator": "euler"})
    m_fine = mjcf.load_model(path, dtype=jnp.float64,
                             overrides={"integrator": "euler",
                                        "timestep": 0.0001})

    def run(mm, n):
        dd = physics.make_data(mm, dtype=jnp.float64)
        dd = dd.replace(qpos=dd.qpos.at[0].set(1.0))
        st = jax.jit(lambda x: physics.step(mm, x))
        for _ in range(n):
            dd = st(dd)
        return float(dd.qpos[0])

    q_fine = run(m_fine, 5000)
    q_rk = run(m_rk, 50)
    q_eu = run(m_eu, 50)
    assert abs(q_rk - q_fine) < abs(q_eu - q_fine)
    # the fine-Euler reference itself carries O(dt)=1e-4 error; RK4 at the
    # coarse dt matches the mujoco RK4 oracle to machine precision
    assert abs(q_rk - q_fine) < 2e-4


def _inline_model(xml):
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
    return f.name


_BOX_SCENE = """<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="base" type="box" size="1 1 0.1" pos="0 0 0.1"/>
    <body name="b" pos="{pos}" euler="{euler}">
      <freejoint/>
      <geom name="top" type="{gtype}" size="{size}" density="300"/>
    </body>
  </worldbody>
</mujoco>"""


@pytest.mark.parametrize("gtype,size,pos,euler,tol", [
    ("box", "0.1 0.12 0.08", "0 0 0.5", "0 0 0", 0.02),       # face rest
    ("box", "0.1 0.1 0.1", "0.05 0 0.6", "0 0 45", 0.03),     # rotated drop
    ("sphere", "0.09", "0 0 0.5", "0 0 0", 0.02),             # sphere-box
])
def test_box_pairs_track_oracle(gtype, size, pos, euler, tol):
    """Box-box (SAT manifold) and sphere-box vs the MuJoCo oracle:
    a free geom dropped onto a fixed box plate must settle at the same
    height with bounded penetration."""
    xml = _BOX_SCENE.format(gtype=gtype, size=size, pos=pos, euler=euler)
    path = _inline_model(xml)
    mj = mujoco.MjModel.from_xml_path(path)
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model(path, dtype=jnp.float64,
                        overrides={"iterations": 50, "ls_iterations": 25})
    d_mj = mujoco.MjData(mj)
    d = physics.make_data(m, dtype=jnp.float64)
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(200):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    # settled: matching height, low speed, no blow-up
    z_ours = float(d.qpos[2])
    z_mj = float(d_mj.qpos[2])
    assert abs(z_ours - z_mj) < tol, (z_ours, z_mj)
    assert float(jnp.abs(d.qvel).max()) < 0.5
    assert np.isfinite(np.asarray(d.qpos)).all()


@pytest.mark.parametrize("damping", [0.0, 0.3])
def test_implicit_integrator_matches_oracle(damping):
    """Full 'implicit' integrator (dense Coriolis qDeriv) vs mj_implicit:
    a 2-link swinging chain — Coriolis derivatives are the terms
    implicitfast drops, so this trajectory separates the two."""
    xml = f"""<mujoco><option timestep=\"0.01\" integrator=\"implicit\"/>
      <worldbody><body pos=\"0 0 1\">
        <joint name=\"j1\" type=\"hinge\" axis=\"0 1 0\" damping=\"{damping}\"/>
        <geom type=\"capsule\" fromto=\"0 0 0 0.4 0 0\" size=\"0.02\"
              density=\"1000\"/>
        <body pos=\"0.4 0 0\">
          <joint name=\"j2\" type=\"hinge\" axis=\"0 1 0\"
                 damping=\"{damping}\"/>
          <geom type=\"capsule\" fromto=\"0 0 0 0.3 0 0\" size=\"0.02\"
                density=\"1000\"/>
        </body>
      </body></worldbody></mujoco>"""
    path = _inline_model(xml)
    mj = mujoco.MjModel.from_xml_path(path)
    d_mj = mujoco.MjData(mj)
    d_mj.qpos[:] = [1.2, 0.4]
    m = mjcf.load_model(path, dtype=jnp.float64)
    d = physics.make_data(m, qpos=jnp.array([1.2, 0.4]), dtype=jnp.float64)
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(150):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    np.testing.assert_allclose(np.asarray(d.qpos), d_mj.qpos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d.qvel), d_mj.qvel, atol=1e-5)


_CYL_SCENE = """<mujoco>
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 .1" friction="0.8"/>
    <body name="b" pos="{pos}" euler="{euler}">
      <freejoint/>
      <geom name="cyl" type="cylinder" size="0.08 0.15" density="300"/>
    </body>
  </worldbody>
</mujoco>"""


@pytest.mark.parametrize("pos,euler,tol", [
    ("0 0 0.3", "90 0 0", 0.02),   # lying on its side: settles at z ~ r
    ("0 0 0.4", "0 0 0", 0.02),    # standing on a cap: z ~ half-length
    ("0 0 0.35", "75 0 0", 0.04),  # tilted drop: topples and settles
])
def test_plane_cylinder_tracks_oracle(pos, euler, tol):
    """Plane-cylinder narrowphase (4 rim candidates) vs the MuJoCo oracle:
    a free cylinder dropped on a plane must settle at the oracle's height
    in every attitude (side line contact, cap tripod, toppling)."""
    xml = _CYL_SCENE.format(pos=pos, euler=euler)
    path = _inline_model(xml)
    mj = mujoco.MjModel.from_xml_path(path)
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model(path, dtype=jnp.float64,
                        overrides={"iterations": 50, "ls_iterations": 25})
    d_mj = mujoco.MjData(mj)
    d = physics.make_data(m, dtype=jnp.float64)
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(400):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    z_ours = float(d.qpos[2])
    z_mj = float(d_mj.qpos[2])
    assert abs(z_ours - z_mj) < tol, (z_ours, z_mj)
    assert float(jnp.abs(d.qvel).max()) < 0.5
    assert np.isfinite(np.asarray(d.qpos)).all()


def test_box_box_edge_contact():
    """Crossed boxes (edge-edge SAT axis): box at 45 deg about x dropped on
    a thin ridge must come to rest on top, not fall through."""
    xml = """<mujoco>
      <option timestep=\"0.005\"/>
      <worldbody>
        <geom name=\"ridge\" type=\"box\" size=\"0.05 1 0.3\" pos=\"0 0 0.3\"/>
        <body name=\"b\" pos=\"0 0 1.0\" euler=\"45 0 90\">
          <freejoint/>
          <geom name=\"top\" type=\"box\" size=\"0.4 0.06 0.06\" density=\"300\"/>
        </body>
      </worldbody>
    </mujoco>"""
    path = _inline_model(xml)
    m = mjcf.load_model(path, dtype=jnp.float64,
                        overrides={"iterations": 50, "ls_iterations": 25})
    d = physics.make_data(m, dtype=jnp.float64)
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(300):
        d = step(d)
    # rests on the ridge (z ~ 0.6 + r-ish), did not tunnel through
    assert float(d.qpos[2]) > 0.55, float(d.qpos[2])
    assert np.isfinite(np.asarray(d.qpos)).all()


@pytest.mark.parametrize("impratio,solver", [
    (1.0, "cg"), (4.0, "cg"), (1.0, "newton"), (4.0, "newton")])
def test_elliptic_cone_matches_oracle(impratio, solver):
    """Elliptic friction cone (D^-1-metric cone projection force model,
    D_t = D_n * impratio) vs the oracle: constrained accelerations across
    stick / slide / spin states, then a sliding-to-rest trajectory.
    The newton variant exercises the elliptic-cone Hessian assembly
    (exact middle-zone second derivative, r3)."""
    xml = f"""<mujoco>
      <option cone=\"elliptic\" impratio=\"{impratio}\" timestep=\"0.005\"/>
      <worldbody>
        <geom name=\"floor\" type=\"plane\" size=\"5 5 .1\" friction=\"0.8\"/>
        <body pos=\"0 0 0.095\"><freejoint/>
          <geom type=\"sphere\" size=\"0.1\" density=\"1000\"
                friction=\"0.8\"/>
        </body>
      </worldbody>
    </mujoco>"""
    path = _inline_model(xml)
    mj = mujoco.MjModel.from_xml_path(path)
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    m = mjcf.load_model(path, dtype=jnp.float64,
                        overrides={"solver": solver, "iterations": 60,
                                   "ls_iterations": 30})
    fwd = jax.jit(lambda d: physics.forward(m, d))
    d_mj = mujoco.MjData(mj)
    for qvel0 in ([0, 0, 0, 0, 0, 0], [0.5, 0, 0, 0, 0, 0],
                  [3.0, -1.0, 0, 0, 0, 2.0], [0.05, 0.02, 0, 0, 0, 0]):
        mujoco.mj_resetData(mj, d_mj)
        d_mj.qvel[:] = qvel0
        mujoco.mj_forward(mj, d_mj)
        d = physics.make_data(m, dtype=jnp.float64).replace(
            qvel=jnp.asarray(qvel0, jnp.float64))
        d = fwd(d)
        scale = max(1.0, np.abs(d_mj.qacc).max())
        err = np.abs(np.asarray(d.qacc) - d_mj.qacc).max() / scale
        assert err < 5e-3, (qvel0, err, np.asarray(d.qacc), d_mj.qacc)

    # sliding sphere trajectory: slip decays into rolling exactly like
    # the oracle (spheres roll without rolling resistance at condim 3)
    mujoco.mj_resetData(mj, d_mj)
    d_mj.qvel[0] = 1.5
    d = physics.make_data(m, dtype=jnp.float64)
    d = d.replace(qvel=d.qvel.at[0].set(1.5))
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(150):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    np.testing.assert_allclose(np.asarray(d.qpos)[:3], d_mj.qpos[:3],
                               atol=0.02)
    np.testing.assert_allclose(np.asarray(d.qvel), d_mj.qvel, atol=0.05)
    # slip velocity at the contact point is gone (rolling: vx = r*wy)
    slip = float(d.qvel[0] - 0.1 * d.qvel[4])
    assert abs(slip) < 0.05, slip


def test_implicitfast_matches_oracle():
    """implicitfast on a damped model: with diagonal velocity derivatives
    (joint damping only) it equals the (M + h diag(B))^-1 update; compare
    a 100-step trajectory against mjINT_IMPLICITFAST."""
    mj = mujoco.MjModel.from_xml_path(f"{ASSETS}/ant.xml")
    mj.opt.integrator = mujoco.mjtIntegrator.mjINT_IMPLICITFAST
    mj.opt.iterations = 100
    mj.opt.ls_iterations = 50
    assert np.any(mj.dof_damping != 0), "test expects a damped model"
    m = mjcf.load_model(f"{ASSETS}/ant.xml", dtype=jnp.float64,
                        overrides={"integrator": "implicitfast",
                                   "iterations": 50, "ls_iterations": 25})
    rng = np.random.default_rng(9)
    ctrl = rng.uniform(-0.2, 0.2, size=mj.nu)
    d_mj = mujoco.MjData(mj)
    d_mj.ctrl[:] = ctrl
    d = physics.make_data(m, dtype=jnp.float64).replace(ctrl=jnp.asarray(ctrl))
    step = jax.jit(lambda x: physics.step(m, x))
    for _ in range(100):
        mujoco.mj_step(mj, d_mj)
        d = step(d)
    err = np.abs(np.asarray(d.qpos) - d_mj.qpos).max()
    assert err < 0.05, err
