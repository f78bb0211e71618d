"""Fused Pallas CG solver vs the XLA reference path.

Three layers of checks (CPU; the kernel runs in interpret mode):
1. the factored contact-Jacobian form (G ⊙ chain masks, no dense Jc)
   reproduces the dense EfcSystem products exactly;
2. the flat-signature reference CG solve matches the dense-path solver;
3. the Pallas kernel (interpret) matches the reference bit-for-tolerance,
   including through the full forward() integration path.

Solver semantics under test: /root/reference/envs/rodent.py:57-63 (CG,
fixed iterations, pyramidal cone).
"""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnl_tpu import mjcf, physics

smod = importlib.import_module("vnl_tpu.physics.solver")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
cmod = importlib.import_module("vnl_tpu.physics.collision")
pcg = importlib.import_module("vnl_tpu.ops.pallas_cg")

B = 4


@pytest.fixture(scope="module")
def setup():
    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True,
                        overrides={"solver": "cg", "iterations": 6,
                                   "ls_iterations": 6})
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    qpos = jnp.tile(m.qpos0[None], (B, 1))
    qpos = qpos.at[:, 2].add(-0.005)  # press into the floor: active contacts
    qpos = qpos.at[:, 7:].add(0.08 * jax.random.normal(k1, (B, m.nq - 7)))
    qvel = 0.5 * jax.random.normal(k2, (B, m.nv))
    d = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
    d = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
    return m, d


def _env(d, i):
    return jax.tree.map(lambda x: x[i], d)


def test_factored_jacobian_matches_dense(setup):
    m, d = setup
    d0 = _env(d, 0)
    dist, pos, frame, pair = cmod.collide(m, d0)
    efc_d = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                  materialize_jc=True)
    efc_f = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                  materialize_jc=False)
    assert efc_f.con_Jc is None and efc_d.con_Jc is not None
    np.testing.assert_allclose(efc_f.con_aref, efc_d.con_aref,
                               rtol=1e-5, atol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(3), (m.nv,))
    ld, cd = efc_d.jx(x)
    lf, cf = efc_f.jx(x)
    np.testing.assert_allclose(lf, ld, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cf, cd, rtol=1e-5, atol=1e-5)
    lim_f = jax.random.normal(jax.random.PRNGKey(4), (efc_d.nlimit,))
    con_f = jax.random.normal(jax.random.PRNGKey(5), (efc_d.ncon, 4))
    np.testing.assert_allclose(efc_f.jt_f(lim_f, con_f),
                               efc_d.jt_f(lim_f, con_f),
                               rtol=1e-4, atol=1e-5)


def _flat_args(m, d0):
    dist, pos, frame, pair = cmod.collide(m, d0)
    efc = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                materialize_jc=False)
    g36 = jnp.concatenate([
        efc.con_G2.transpose(1, 2, 0).reshape(18, efc.ncon),
        efc.con_G1.transpose(1, 2, 0).reshape(18, efc.ncon)], axis=0)
    args = (d0.qM, d0.qMinv, d0.qacc_smooth, efc.con_cdof, g36,
            efc.lim_sign, efc.lim_aref, efc.lim_D, efc.con_mu,
            efc.con_aref, efc.con_D)
    return efc, args


def test_reference_cg_matches_dense_solver(setup):
    m, d = setup
    d0 = _env(d, 0)
    dist, pos, frame, pair = cmod.collide(m, d0)
    efc_d = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                  materialize_jc=True)
    qacc_d, qfrc_d, conf_d = smod.solve(m, d0, efc_d, d0.qacc_smooth)

    efc, args = _flat_args(m, d0)
    ref = smod._make_cg_reference(m.nv, efc.ncon, efc.nlimit, 6, 6,
                                  np.asarray(efc.lim_dof),
                                  efc.con_chain1, efc.con_chain2)
    qacc_r, qfrc_r, conf_r = ref(*args)
    np.testing.assert_allclose(qacc_r, qacc_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(qfrc_r, qfrc_d, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(conf_r, conf_d, rtol=1e-3, atol=1e-3)


def test_pallas_kernel_matches_reference(setup):
    m, d = setup
    efc0, _ = _flat_args(m, _env(d, 0))
    per_env = [_flat_args(m, _env(d, i))[1] for i in range(B)]
    batched = tuple(jnp.stack([a[j] for a in per_env])
                    for j in range(len(per_env[0])))
    ref = smod._make_cg_reference(m.nv, efc0.ncon, efc0.nlimit, 6, 6,
                                  np.asarray(efc0.lim_dof),
                                  efc0.con_chain1, efc0.con_chain2)
    fused = pcg.make_cg_fused(m.nv, efc0.ncon, efc0.nlimit, 6, 6,
                              np.asarray(efc0.lim_dof), efc0.con_chain1,
                              efc0.con_chain2, ref, interpret=True)
    out_ref = jax.vmap(ref)(*batched)
    out_pal = jax.jit(jax.vmap(fused))(*batched)
    # qacc rtol 1e-3: the kernel maintains M(x-a) incrementally across CG
    # iterations (the XLA path recomputes it), a reordered-f32 difference
    for r, p, tol in zip(out_ref, out_pal, (1e-3, 1e-3, 1e-3)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=tol, atol=tol)


def test_contact_only_model_uses_fused_path(monkeypatch):
    """nlimit==0 models (free box on a plate, CG solver) must reach the
    fused kernel via an inert synthesized limit row, matching the dense
    solver (round-2 ADVICE: they silently took the slow XLA path)."""
    import tempfile
    xml = """<mujoco>
      <option timestep=\"0.005\" solver=\"CG\" iterations=\"8\"
              ls_iterations=\"8\"/>
      <worldbody>
        <geom name=\"base\" type=\"box\" size=\"1 1 0.1\" pos=\"0 0 0.1\"/>
        <body name=\"b\" pos=\"0 0 0.27\">
          <freejoint/>
          <geom name=\"top\" type=\"box\" size=\"0.1 0.12 0.08\"
                density=\"300\"/>
        </body>
      </worldbody>
    </mujoco>"""
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write(xml)
    m = mjcf.load_model(f.name)
    d0 = physics.make_data(m)
    d0 = physics.forward(m, d0)
    dist, pos, frame, pair = cmod.collide(m, d0)
    efc = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                materialize_jc=False)
    assert efc.nlimit == 0 and efc.ncon > 0 and efc.con_Jc is None
    monkeypatch.setenv("VNL_TPU_FUSED_CG", "1")
    assert pcg.enabled()
    qacc_f, qfrc_f, conf_f = smod.solve(m, d0, efc, d0.qacc_smooth)
    efc_d = nmod.make_constraints(m, d0, dist, pos, frame, pair,
                                  materialize_jc=True)
    qacc_d, qfrc_d, conf_d = smod.solve(m, d0, efc_d, d0.qacc_smooth)
    np.testing.assert_allclose(np.asarray(qacc_f), np.asarray(qacc_d),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(qfrc_f), np.asarray(qfrc_d),
                               rtol=1e-3, atol=1e-3)


def test_forward_fused_path_end_to_end(setup, monkeypatch):
    """forward() with the fused path forced on (interpret) ≈ default."""
    m, d = setup
    monkeypatch.setenv("VNL_TPU_FUSED_CG", "1")
    assert pcg.enabled()
    d1 = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
    monkeypatch.delenv("VNL_TPU_FUSED_CG")
    d2 = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
    np.testing.assert_allclose(np.asarray(d1.qacc), np.asarray(d2.qacc),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(d1.qfrc_constraint),
                               np.asarray(d2.qfrc_constraint),
                               rtol=5e-3, atol=5e-2)
