"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.ops.pallas_linalg import inv_spd_fused, inv_spd_lanes
from vnl_tpu.ops.pallas_solver import fused_line_search


def _reference(qn, qd, jar, jp, D, n):
    alpha = jnp.zeros(())
    for _ in range(n):
        act = (jar + alpha * jp) < 0
        num = qn + jnp.sum(D * act * jar * jp)
        den = qd + jnp.sum(D * act * jp * jp)
        alpha = -num / jnp.maximum(den, 1e-12)
    return alpha


def test_fused_line_search_matches_reference(rng):
    R = 295  # rodent row count (not lane-aligned on purpose)
    B = 8
    jar = jnp.asarray(rng.normal(size=(B, R)), jnp.float32)
    jp = jnp.asarray(rng.normal(size=(B, R)), jnp.float32)
    D = jnp.asarray(rng.uniform(0, 5, size=(B, R)), jnp.float32)
    qn = jnp.asarray(rng.normal(size=B), jnp.float32)
    qd = jnp.asarray(np.abs(rng.normal(size=B)) + 1, jnp.float32)
    got = jax.vmap(lambda a, b, c, d, e: fused_line_search(
        a, b, c, d, e, 6, interpret=True))(qn, qd, jar, jp, D)
    want = jax.vmap(lambda a, b, c, d, e: _reference(a, b, c, d, e, 6))(
        qn, qd, jar, jp, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


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
