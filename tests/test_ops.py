"""TPU ops kernels."""

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.ops import inv_spd


def test_inv_spd_accuracy(rng):
    for n in (1, 2, 7, 14, 27, 73):
        A = rng.normal(size=(8, n, n))
        M = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(n)
        Mi = np.asarray(inv_spd(jnp.asarray(M, jnp.float32)))
        eye = Mi @ M
        err = np.abs(eye - np.eye(n)).max()
        assert err < 5e-3, (n, err)


def test_inv_spd_jit_vmap(rng):
    A = rng.normal(size=(16, 73, 73)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(73, dtype=np.float32)
    f = jax.jit(jax.vmap(inv_spd))
    Mi = np.asarray(f(jnp.asarray(M)))
    assert np.isfinite(Mi).all()
    np.testing.assert_allclose(Mi, np.linalg.inv(M), rtol=2e-2, atol=2e-3)


def test_inv_spd_mass_matrix_conditioning():
    """Realistic rodent mass matrix: inverse accurate enough for dynamics."""
    import mujoco
    from vnl_tpu import mjcf, physics
    m = mjcf.load_model("/root/reference/assets/rodent.xml",
                        rescale=(0.9, 0.9), torque_actuators=True)
    d = physics.make_data(m)
    d = jax.jit(lambda d: physics.forward(m, d))(d)
    qM = np.asarray(d.qM, np.float64)
    qMinv = np.asarray(d.qMinv, np.float64)
    resid = np.abs(qMinv @ qM - np.eye(m.nv)).max()
    assert resid < 5e-2, resid  # fp32 inverse of kappa~1e5 matrix
