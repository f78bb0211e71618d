"""Batched linear algebra shaped for the MXU.

XLA's LAPACK-style cholesky/triangular_solve lower to long sequential scalar
loops on TPU — catastrophic when the physics substep needs them 14x per
step over thousands of vmapped envs.  ``inv_spd`` replaces the factor+solve
pattern with a recursive Schur-complement inverse: O(log n) depth, all
matmuls, so every downstream solve becomes a single batched matmul
(M^-1 @ rhs) that rides the MXU.

For the mass matrices here (nv<=73, armature-regularized, condition number
~1e4) fp32 accuracy is ~1e-4 relative, verified against fp64 in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inv_spd(a: jax.Array) -> jax.Array:
    """Inverse of a symmetric positive-definite matrix, batched.

    a: (..., n, n) SPD.  Recursive 2x2 block Schur complement:
      [[A, B], [B^T, C]]^-1 with S = C - B^T A^-1 B:
        TL = A^-1 + (A^-1 B) S^-1 (A^-1 B)^T
        TR = -(A^-1 B) S^-1
        BR = S^-1
    Depth log2(n); each level only batched matmuls.
    """
    n = a.shape[-1]
    if n == 1:
        return 1.0 / a
    if n == 2:
        a00 = a[..., 0, 0]
        a01 = a[..., 0, 1]
        a11 = a[..., 1, 1]
        det = a00 * a11 - a01 * a01
        inv_det = 1.0 / det
        row0 = jnp.stack([a11 * inv_det, -a01 * inv_det], axis=-1)
        row1 = jnp.stack([-a01 * inv_det, a00 * inv_det], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    k = n // 2
    A = a[..., :k, :k]
    B = a[..., :k, k:]
    C = a[..., k:, k:]
    Ai = inv_spd(A)
    AiB = Ai @ B
    S = C - jnp.swapaxes(B, -1, -2) @ AiB
    Si = inv_spd(S)
    TR = -AiB @ Si
    TL = Ai - TR @ jnp.swapaxes(AiB, -1, -2)
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Si], axis=-1)
    out = jnp.concatenate([top, bot], axis=-2)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def refine_inv(a: jax.Array, x0: jax.Array, iters: int = 2) -> jax.Array:
    """Newton–Schulz refinement of an approximate inverse, batched.

    X <- X(2I - AX) converges quadratically: with a warm seed at relative
    residual r0 (e.g. the previous physics substep's inverse, r0 ~ 1e-2),
    two iterations reach the fp32 floor.  Each iteration is two batched
    matmuls — far cheaper than recomputing the Schur inverse — which lets
    the physics pipeline factor exactly once per control step and refine
    across substeps.
    """
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    x = x0
    for _ in range(iters):
        x = x @ (2.0 * eye - a @ x)
    return 0.5 * (x + jnp.swapaxes(x, -1, -2))


def refine_inv_general(a: jax.Array, x0: jax.Array,
                       iters: int = 6) -> jax.Array:
    """Newton–Schulz refinement for a GENERAL (possibly unsymmetric)
    inverse, batched.  Same X <- X(2I - AX) iteration as refine_inv but
    without the symmetrization step (which would corrupt unsymmetric
    inverses, e.g. the implicit integrator's (M - h*qDeriv) with Coriolis
    derivative terms).  Converges quadratically whenever ||I - A X0|| < 1;
    callers seed with a nearby SPD inverse (qMhBinv)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    x = x0
    for _ in range(iters):
        x = x @ (2.0 * eye - a @ x)
    return x


def inv_spd_ns(a: jax.Array, iters: int = 16, unroll: int = 4) -> jax.Array:
    """SPD inverse by Jacobi-scaled Newton–Schulz iteration, batched.

    The hot-path alternative to ``inv_spd``: the recursive Schur inverse
    emits ~360 HLO kernels per call (the dominant dispatch cost of a physics
    substep), while this is a fixed-length scan of two batched matmuls.

    Jacobi scaling Ã = D^-1/2 A D^-1/2 drops the mass-matrix condition
    number from ~4e5 to ~2e2; starting from X0 = I/||Ã||_inf, the iteration
    X <- X(2I - ÃX) converges quadratically once contraction starts
    (calibrated on rodent mass matrices: 14 iters reach the fp32 floor,
    ~5e-7 relative — better than the Schur path's ~1e-4).
    """
    n = a.shape[-1]
    dtype = a.dtype
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(diag)
    at = a * s[..., :, None] * s[..., None, :]
    # ||Ã||_2 <= ||Ã||_inf (symmetric): safe initial step length.
    norm = jnp.max(jnp.sum(jnp.abs(at), axis=-1), axis=-1)
    eye = jnp.eye(n, dtype=dtype)
    x0 = eye / norm[..., None, None]

    def body(x, _):
        return x @ (2.0 * eye - at @ x), None

    x, _ = jax.lax.scan(body, x0, None, length=iters,
                        unroll=min(unroll, iters))
    x = 0.5 * (x + jnp.swapaxes(x, -1, -2))
    return x * s[..., :, None] * s[..., None, :]
