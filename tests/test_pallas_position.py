"""Fused position-stage megakernel vs the XLA pipeline (interpret mode)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnl_tpu import mjcf, physics

ppos = importlib.import_module("vnl_tpu.ops.pallas_position")
fmod = importlib.import_module("vnl_tpu.physics.forward")

B = 4


@pytest.fixture(scope="module", params=["rodent", "ant"])
def setup(request):
    name = request.param
    kw = (dict(rescale=(0.9, 0.9), torque_actuators=True)
          if name == "rodent" else {})
    m = mjcf.load_model(f"/root/reference/assets/{name}.xml", **kw)
    rng = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(rng)
    qpos = jnp.tile(m.qpos0[None], (B, 1))
    qpos = qpos.at[:, :3].add(0.05 * jax.random.normal(k1, (B, 3)))
    qpos = qpos.at[:, 7:].add(0.1 * jax.random.normal(k2, (B, m.nq - 7)))
    return m, qpos


def test_kernel_matches_reference(setup):
    m, qpos = setup
    ref = fmod._position_reference(m)[1]
    fused = ppos.make_position_fused(m, ref, interpret=True)
    out_ref = jax.vmap(ref)(qpos)
    out_pal = jax.jit(jax.vmap(fused))(qpos)
    names = ("xpos", "xquat", "xmat", "xipos", "xanchor", "xaxis",
             "geom_xpos", "geom_xmat", "subtree_com", "cinert", "cdof",
             "qM")
    assert len(out_pal) in (len(names) + 1, len(names) + 2)
    for n, r, p in zip(names, out_ref, out_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-5, atol=2e-5, err_msg=n)
    # fused in-kernel sweep inverses vs the reference Schur inverses: both
    # are fp32 inverses of an ill-conditioned matrix, so compare relative
    # to the inverse's own scale
    for n, r, p in zip(("qMinv", "qMhBinv"), out_ref[len(names):],
                       out_pal[len(names):]):
        r, p = np.asarray(r), np.asarray(p)
        scale = np.abs(r).max()
        np.testing.assert_allclose(p, r, rtol=5e-3, atol=1e-4 * scale,
                                   err_msg=n)
        # and they actually invert qM / (qM + h diag(B))
        qm = np.asarray(out_pal[11])
        A = qm if n == "qMinv" else qm + np.diag(
            np.asarray(m.opt.timestep * np.asarray(m.dof_damping)))
        eye = np.eye(qm.shape[-1])
        resid = np.einsum("bij,bjk->bik", A, p) - eye
        assert np.abs(resid).max() < 5e-3, (n, np.abs(resid).max())


def test_forward_fused_position_end_to_end(setup, monkeypatch):
    m, qpos = setup
    d = jax.vmap(lambda q: physics.make_data(m, qpos=q))(qpos)
    monkeypatch.setenv("VNL_TPU_FUSED_POSITION", "1")
    assert ppos.enabled()
    d1 = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
    monkeypatch.delenv("VNL_TPU_FUSED_POSITION")
    d2 = jax.jit(jax.vmap(lambda x: physics.forward(m, x)))(d)
    np.testing.assert_allclose(np.asarray(d1.qacc), np.asarray(d2.qacc),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(d1.qM), np.asarray(d2.qM),
                               rtol=1e-5, atol=1e-5)
