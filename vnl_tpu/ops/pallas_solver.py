"""Pallas TPU kernels for the constraint-solver hot path.

The exact line search runs ls_iterations active-set refinements per solver
iteration — in pure JAX that is ~10 small HLO ops per refinement, ~360 tiny
kernels per physics substep at ~5us launch overhead each.  The fused kernel
runs the whole search in VMEM in one launch per env (vmap adds the batch
grid dimension).

Rows are padded to a lane multiple with D = 0, which contributes nothing to
either reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; import lazily so CPU tests can interpret
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _ls_kernel(n_iter: int, num_ref, den_ref, jar_ref, jp_ref, d_ref,
               alpha_ref):
    jar = jar_ref[:]
    jp = jp_ref[:]
    dv = d_ref[:]
    djj = dv * jar * jp
    dpp = dv * jp * jp
    num0 = num_ref[0, 0]
    den0 = den_ref[0, 0]

    def body(_, alpha):
        act = (jar + alpha * jp) < 0.0
        num = num0 + jnp.sum(jnp.where(act, djj, 0.0))
        den = den0 + jnp.sum(jnp.where(act, dpp, 0.0))
        return -num / jnp.maximum(den, 1e-12)

    alpha = jax.lax.fori_loop(0, n_iter, body, jnp.zeros((), jar.dtype))
    alpha_ref[0, 0] = alpha


def fused_line_search(quad_num0, quad_den0, jar, jp, D, n_iter: int,
                      interpret: bool = False):
    """Exact piecewise-quadratic line search, fused into one kernel.

    Args (per env; vmap over a leading batch axis maps to the grid):
      quad_num0, quad_den0: scalars p^T M (x - a), p^T M p.
      jar, jp, D: (R,) concatenated constraint rows (limits + facets),
        padded to a multiple of 128 with D = 0.
    Returns alpha scalar.
    """
    R = jar.shape[-1]
    pad = (-R) % 128
    if pad:
        z = jnp.zeros(jar.shape[:-1] + (pad,), jar.dtype)
        jar = jnp.concatenate([jar, z], -1)
        jp = jnp.concatenate([jp, z], -1)
        D = jnp.concatenate([D, z], -1)
    Rp = jar.shape[-1]

    kernel = functools.partial(_ls_kernel, n_iter)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jar.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)
                  if _HAS_PLTPU and not interpret else pl.BlockSpec()
                  for _ in range(2)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
            if _HAS_PLTPU and not interpret else pl.BlockSpec()
            for _ in range(3)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM)
                   if _HAS_PLTPU and not interpret else pl.BlockSpec()),
        interpret=interpret,
    )(quad_num0.reshape(1, 1), quad_den0.reshape(1, 1),
      jar.reshape(1, Rp), jp.reshape(1, Rp), D.reshape(1, Rp))
    return out[0, 0]
