"""Composite rigid body mass matrix and factorization.

TPU-first formulation: the CRB subtree sum is one static-mask matmul, and
the mass matrix assembles as one (nv,6)x(6,nv) matmul masked by the static
dof-ancestor table — MXU-friendly and free of per-joint control flow.
Replaces MuJoCo's mj_crb + mj_factorM (sparse LDL) with an all-matmul
Schur-complement inverse (ops/linalg.inv_spd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vnl_tpu.physics.model import Data, Model


def crb(m: Model, d: Data) -> Data:
    """Computes the dense joint-space mass matrix qM and its inverse.

    The inverse comes from the recursive Schur-complement kernel
    (vnl_tpu.ops.linalg.inv_spd): on TPU, XLA's cholesky/triangular_solve
    are sequential scalar loops (~10ms for 1024x73x73 batches), while the
    all-matmul inverse runs in <1ms and turns every downstream solve into a
    single MXU matmul.
    """
    dtype = d.qpos.dtype
    # composite inertia: subtree sum as one mask matmul
    sub_mask = jnp.asarray(m.body_subtree_mask, dtype)
    crb_inert = (sub_mask @ d.cinert.reshape(m.nbody, 36)).reshape(
        m.nbody, 6, 6)

    # F[i] = crb[body(i)] @ cdof[i]
    crb_dof = crb_inert[jnp.asarray(m.dof_bodyid)]        # (nv, 6, 6)
    F = jnp.einsum("vij,vj->vi", crb_dof, d.cdof)          # (nv, 6)
    M_full = F @ d.cdof.T                                  # (nv, nv)
    mask = jnp.asarray(m.dof_ancestor_mask, dtype=dtype)   # lower tree-triangle
    Ml = M_full * mask
    qM = Ml + Ml.T - jnp.diag(jnp.diag(Ml))
    qM = qM + jnp.diag(m.dof_armature.astype(dtype))

    from vnl_tpu.ops.linalg import inv_spd
    qMinv = inv_spd(qM)
    return d.replace(qM=qM, qMinv=qMinv)


def solve_m(d: Data, x: jax.Array) -> jax.Array:
    """Solves qM @ y = x via the cached inverse (one matmul)."""
    return d.qMinv @ x
