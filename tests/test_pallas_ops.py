"""Pallas kernel correctness (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

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
