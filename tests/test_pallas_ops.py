"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.ops.pallas_linalg import inv_spd_fused, inv_spd_lanes


def _spd_batch(rng, b, n):
    scale = rng.uniform(0.05, 2.0, (b, 1, n)).astype(np.float32)
    L = rng.normal(size=(b, n, n)).astype(np.float32) * scale
    a = L @ np.transpose(L, (0, 2, 1)) + 0.5 * np.eye(n, dtype=np.float32)
    return (a + np.transpose(a, (0, 2, 1))) / 2


def test_sweep_inverse_matches_numpy(rng):
    b, n = 12, 29  # odd n exercises sublane padding
    a = _spd_batch(rng, b, n)
    got = inv_spd_lanes(jnp.asarray(a), block=4, interpret=True)
    want = np.linalg.inv(a.astype(np.float64))
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float64) / scale, want / scale, atol=2e-5)


def test_inv_spd_fused_vmap_matches_unbatched(rng):
    # On CPU the vmap rule flattens to the Schur path; both routes must
    # agree with numpy (the TPU pallas route is covered by the test above).
    b, n = 6, 17
    a = _spd_batch(rng, b, n)
    got = jax.jit(jax.vmap(inv_spd_fused))(jnp.asarray(a))
    want = np.linalg.inv(a.astype(np.float64))
    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float64) / scale, want / scale, atol=2e-5)

    # stacked-pair form used by inertia.crb: (B, 2, n, n) under one vmap
    pair = jnp.stack([jnp.asarray(a), jnp.asarray(a) * 2.0], axis=1)
    got2 = jax.jit(jax.vmap(inv_spd_fused))(pair)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0], np.float64) / scale, want / scale, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got2[:, 1], np.float64) / scale, want / 2 / scale,
        atol=2e-5)
