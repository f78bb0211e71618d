"""Composite rigid body mass matrix and factorization.

TPU-first formulation: the CRB backward pass is a short level-synchronized
scatter-add over tree depths; the mass matrix assembles as one (nv,6)x(6,nv)
matmul masked by the static dof-ancestor table — MXU-friendly and free of
per-joint control flow.  Replaces MuJoCo's mj_crb + mj_factorM (sparse LDL)
with dense batched Cholesky, which XLA batches well at nv<=73.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics.model import Data, Model


def _levels(m: Model):
    depth = m.body_treeid
    return [np.nonzero(depth == d)[0].astype(np.int32)
            for d in range(1, int(depth.max()) + 1 if m.nbody > 1 else 1)]


def crb(m: Model, d: Data) -> Data:
    """Computes the dense joint-space mass matrix qM and its Cholesky qLD."""
    dtype = d.qpos.dtype
    # composite inertia: accumulate children into parents, deepest first
    crb_inert = d.cinert
    for level in reversed(_levels(m)):
        parent = jnp.asarray(m.body_parentid[level])
        crb_inert = crb_inert.at[parent].add(crb_inert[jnp.asarray(level)])

    # F[i] = crb[body(i)] @ cdof[i]
    crb_dof = crb_inert[jnp.asarray(m.dof_bodyid)]        # (nv, 6, 6)
    F = jnp.einsum("vij,vj->vi", crb_dof, d.cdof)          # (nv, 6)
    M_full = F @ d.cdof.T                                  # (nv, nv)
    mask = jnp.asarray(m.dof_ancestor_mask, dtype=dtype)   # lower tree-triangle
    Ml = M_full * mask
    qM = Ml + Ml.T - jnp.diag(jnp.diag(Ml))
    qM = qM + jnp.diag(m.dof_armature.astype(dtype))

    qLD = jax.scipy.linalg.cholesky(
        qM + jnp.eye(m.nv, dtype=dtype) * 0.0, lower=True)
    return d.replace(qM=qM, qLD=qLD)


def solve_m(d: Data, x: jax.Array) -> jax.Array:
    """Solves qM @ y = x using the cached Cholesky factor."""
    y = jax.scipy.linalg.solve_triangular(d.qLD, x, lower=True)
    return jax.scipy.linalg.solve_triangular(d.qLD.T, y, lower=False)
