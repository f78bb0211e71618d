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
import numpy as np

from vnl_tpu.physics.model import Data, DisableBit, Model


def _needs_implicit_damping(m: Model) -> bool:
    """Static: does the integrator need (M + h·diag(B))⁻¹?

    Euler honors the eulerdamp disable flag; implicitfast always solves
    implicitly (that is its definition — see forward.step)."""
    from vnl_tpu.physics.model import IntegratorType
    try:
        damped = bool(np.any(np.asarray(m.dof_damping) != 0))
    except Exception:  # model passed as a traced argument: keep the solve
        damped = True
    if m.opt.integrator == int(IntegratorType.IMPLICITFAST):
        return damped
    return damped and not (m.opt.disableflags & DisableBit.EULERDAMP)


def assemble_qM(m: Model, d: Data) -> jax.Array:
    """Dense joint-space mass matrix from cinert/cdof (mj_crb)."""
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
    return qM + jnp.diag(m.dof_armature.astype(dtype))


def crb(m: Model, d: Data, refine_inverse: bool = False) -> Data:
    """Computes the dense joint-space mass matrix qM and its inverses.

    Both inverses the step needs — M⁻¹ (CG preconditioner / smooth
    acceleration) and (M + h·diag(B))⁻¹ (implicit joint damping in the
    Euler integrator; h·B is static model metadata so it is known here).
    On TPU, XLA's cholesky/triangular_solve are sequential scalar loops
    (~10ms for 1024x73x73 batches), so the exact path is the all-matmul
    Schur inverse (ops/linalg.inv_spd), and every downstream solve is a
    single MXU matmul.

    refine_inverse: the mass matrix depends only on qpos, which drifts
    ~dt·|qvel| between the 5 substeps of one control step, so inside
    pipeline_step only the FIRST substep factors exactly; later substeps
    pass refine_inverse=True and polish the carried inverses with two
    Newton–Schulz iterations (quadratic: residual r0 -> r0^4, measured at
    the fp32 floor) at a fraction of the Schur cost.
    """
    return invert_mass_matrix(m, d.replace(qM=assemble_qM(m, d)),
                              refine_inverse)


def invert_mass_matrix(m: Model, d: Data,
                       refine_inverse: bool = False) -> Data:
    """Fills qMinv / qMhBinv from d.qM (see crb docstring)."""
    dtype = d.qpos.dtype
    qM = d.qM
    from vnl_tpu.ops.linalg import refine_inv
    from vnl_tpu.ops.pallas_linalg import inv_spd_fused
    if _needs_implicit_damping(m):
        hB = m.opt.timestep * m.dof_damping.astype(dtype)
        MhB = qM + jnp.diag(hB)
        if refine_inverse:
            stacked_a = jnp.stack([qM, MhB])
            stacked_x = jnp.stack([d.qMinv, d.qMhBinv])
            inv = refine_inv(stacked_a, stacked_x)
            qMinv, qMhBinv = inv[0], inv[1]
        else:
            # Both factored exactly: h·diag(B) is NOT a small perturbation
            # of M here (implicit damping exists precisely because damping
            # dwarfs the small link inertias), so (M + h·B)⁻¹ cannot be
            # refined from M⁻¹ — only from its own previous value.  The
            # stacked call becomes ONE pallas sweep over 2B matrices under
            # vmap on TPU (ops/pallas_linalg.py).
            inv = inv_spd_fused(jnp.stack([qM, MhB]))
            qMinv, qMhBinv = inv[0], inv[1]
    else:
        qMinv = (refine_inv(qM, d.qMinv) if refine_inverse
                 else inv_spd_fused(qM))
        qMhBinv = qMinv
    return d.replace(qM=qM, qMinv=qMinv, qMhBinv=qMhBinv)


def solve_m(d: Data, x: jax.Array) -> jax.Array:
    """Solves qM @ y = x via the cached inverse (one matmul)."""
    return d.qMinv @ x
