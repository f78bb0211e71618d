"""Pallas TPU kernel: the whole CG contact solve in one launch.

The constraint solver is the engine's largest HBM consumer: per CG
iteration the XLA path re-reads the (nv, nv) mass matrix and the dense
(ncon, 3, nv) contact Jacobian several times, ~3.3 ms of a ~9 ms substep
at B=1024 (the substep is bandwidth-bound: 12 GB accessed for 2 GFLOP —
tools/ablate_step.py).  This kernel runs the full fixed-iteration CG loop
(line search included) over a 128-env lane block with every operand
resident in VMEM, so qM/qMinv are read from HBM exactly once per substep.

Layout: batch rides the 128-wide lane dimension ((..., L) arrays — the
convention established by ops/pallas_linalg.py), so all per-env vector
math is full-width VPU work and tree/one-hot contractions are small MXU
matmuls against static masks.

The contact Jacobian is never materialized.  With J = (chain2 ⊙ G2 −
chain1 ⊙ G1) · cdof kept factored (see physics/constraint.py), J @ x and
J^T f become   chain_side @ (cdof_k * x)   matmuls — (ncon, nv) static
0/1 masks against (nv, L) lane blocks — plus a handful of (ncon, L)
elementwise ops.  Solver semantics match physics/solver.py's CG branch
exactly (fixed iterations, exact piecewise-quadratic line search,
Polak–Ribière with restart clamp); cf. the reference solver options at
/root/reference/envs/rodent.py:57-63.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl

try:  # TPU-only module; CPU tests run the kernel with interpret=True
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK = 128  # envs per grid program (lane width)
_MIN_FUSED_BATCH = 128


def enabled() -> bool:
    """Fast path gate: TPU backend unless explicitly disabled."""
    v = os.environ.get("VNL_TPU_FUSED_CG")
    if v is not None:
        return v not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _matvec(m_ref, x, xs_ref):
    """(n, n, L) ref (symmetric matrix) @ (n, L) value -> (n, L).

    One broadcast multiply (n, n, L) * (n, 1, L) reduced over the MAJOR
    axis (valid by symmetry: sum_i M[i, j] x[i] = (M x)[j]): ~n*n*L VPU
    ops in straight-line code.  The middle-axis variant
    sum(M * x[None], axis=1) trips Mosaic ("Invalid relayout: ...
    replicated in destination") — sublane reductions leave a reduced
    layout its consumers can't take; major-axis reduction is plain
    register adds.  (The earlier fori_loop over pages was ~5x more
    cycles from loop overhead; a static unroll exploded compile time.)
    """
    del xs_ref  # kept in the signature: scratch slot still allocated
    return jnp.sum(m_ref[:] * x[:, None, :], axis=0)


def _cg_kernel(statics, qM_ref, qMinv_ref, x0_ref, cdof_ref, g_ref,
               lim_sign_ref, lim_aref_ref, lim_D_ref,
               con_mu_ref, con_aref_ref, con_D_ref,
               chain_ref, chaint_ref, elim_ref, elimt_ref,
               qacc_ref, qfrc_ref, conf_ref, xs_ref):
    nv, ncon, nlimit, iters, ls_iters = statics

    x0 = x0_ref[:]                    # (nv, L) qacc_smooth
    cdof = cdof_ref[:]                # (6, nv, L)
    lim_sign = lim_sign_ref[:]        # (nlimit, L)
    lim_aref = lim_aref_ref[:]
    lim_D = lim_D_ref[:]
    mu1 = con_mu_ref[0]               # (ncon, L)
    mu2 = con_mu_ref[1]
    con_aref = con_aref_ref[:]        # (4, ncon, L)
    con_D = con_D_ref[:]
    chain2 = chain_ref[0]             # (ncon, nv) static 0/1
    chain1 = chain_ref[1]
    chain2t = chaint_ref[0]           # (nv, ncon)
    chain1t = chaint_ref[1]
    elim = elim_ref[:]                # (nlimit, nv) one-hot
    elimt = elimt_ref[:]              # (nv, nlimit)

    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST  # full-f32 MXU passes: CG amplifies
    # the default bf16 multiply error across its 6 preconditioned iters

    def jx(p):
        """J @ p by block: (lim (nlimit, L), facets (4, ncon, L))."""
        lim = jnp.dot(elim, p, preferred_element_type=f32, precision=hi) * lim_sign
        s2 = []
        s1 = []
        for k in range(6):
            cp = cdof[k] * p
            s2.append(jnp.dot(chain2, cp, preferred_element_type=f32, precision=hi))
            s1.append(jnp.dot(chain1, cp, preferred_element_type=f32, precision=hi))
        base = []
        for f in range(3):
            acc = jnp.zeros((ncon, p.shape[-1]), f32)
            for k in range(6):
                acc = (acc + g_ref[f * 6 + k] * s2[k]
                       - g_ref[18 + f * 6 + k] * s1[k])
            base.append(acc)
        n, t1, t2 = base
        fx = jnp.stack([n + mu1 * t1, n - mu1 * t1,
                        n + mu2 * t2, n - mu2 * t2])
        return lim, fx

    def jt_f(lim_f, con_f):
        """J^T f from per-block forces -> (nv, L)."""
        fn = con_f[0] + con_f[1] + con_f[2] + con_f[3]
        ft1 = mu1 * (con_f[0] - con_f[1])
        ft2 = mu2 * (con_f[2] - con_f[3])
        fvec = (fn, ft1, ft2)
        out = jnp.dot(elimt, lim_sign * lim_f, preferred_element_type=f32, precision=hi)
        for k in range(6):
            t2 = jnp.zeros_like(fn)
            t1 = jnp.zeros_like(fn)
            for f in range(3):
                t2 = t2 + g_ref[f * 6 + k] * fvec[f]
                t1 = t1 + g_ref[18 + f * 6 + k] * fvec[f]
            u = (jnp.dot(chain2t, t2, preferred_element_type=f32, precision=hi)
                 - jnp.dot(chain1t, t1, preferred_element_type=f32, precision=hi))
            out = out + cdof[k] * u
        return out

    def forces(lim_jx, con_fx):
        lim_jar = lim_jx - lim_aref
        con_jar = con_fx - con_aref
        lim_f = -lim_D * (lim_jar < 0) * lim_jar
        con_f = -con_D * (con_jar < 0) * con_jar
        return lim_jar, con_jar, lim_f, con_f

    def rsum(a):
        """Reduce all leading dims -> (1, L)."""
        return jnp.sum(a.reshape((-1, a.shape[-1])), axis=0, keepdims=True)

    def line_search(p, Mx_a, Mp, lim_jar, con_jar, lim_jp, con_jp):
        quad_num0 = rsum(p * Mx_a)
        quad_den0 = rsum(p * Mp)
        alpha = jnp.zeros_like(quad_num0)
        for _ in range(ls_iters):
            lim_act = (lim_jar + alpha * lim_jp) < 0.0
            con_act = (con_jar + alpha * con_jp) < 0.0
            num = (quad_num0 + rsum(lim_D * lim_act * lim_jar * lim_jp)
                   + rsum(con_D * con_act * con_jar * con_jp))
            den = (quad_den0 + rsum(lim_D * lim_act * lim_jp * lim_jp)
                   + rsum(con_D * con_act * con_jp * con_jp))
            alpha = -num / jnp.maximum(den, 1e-12)
        return alpha

    # ---- CG over qacc; x starts at qacc_smooth so M(x - x0) starts at 0 ----
    x = x0
    Mx_a = jnp.zeros_like(x0)
    lim_jx, con_fx = jx(x)
    _, _, lim_f, con_f = forces(lim_jx, con_fx)
    g = Mx_a - jt_f(lim_f, con_f)
    Mg = _matvec(qMinv_ref, g, xs_ref)
    p = -Mg
    g_dot_Mg = rsum(g * Mg)

    for _ in range(iters):
        lim_jp, con_jp = jx(p)
        Mp = _matvec(qM_ref, p, xs_ref)
        alpha = line_search(p, Mx_a, Mp, lim_jx - lim_aref,
                            con_fx - con_aref, lim_jp, con_jp)
        x = x + alpha * p
        Mx_a = Mx_a + alpha * Mp
        lim_jx = lim_jx + alpha * lim_jp
        con_fx = con_fx + alpha * con_jp
        _, _, lim_f, con_f = forces(lim_jx, con_fx)
        g_new = Mx_a - jt_f(lim_f, con_f)
        Mg_new = _matvec(qMinv_ref, g_new, xs_ref)
        num = rsum(g_new * Mg_new) - rsum(g * Mg_new)
        beta = jnp.maximum(0.0, num / jnp.maximum(g_dot_Mg, 1e-12))
        p = -Mg_new + beta * p
        g = g_new
        Mg = Mg_new
        g_dot_Mg = rsum(g_new * Mg_new)

    _, _, lim_f, con_f = forces(lim_jx, con_fx)
    qacc_ref[:] = x
    qfrc_ref[:] = jt_f(lim_f, con_f)
    conf_ref[:] = con_f


_FUSED_CACHE: dict = {}


def make_cg_fused(nv: int, ncon: int, nlimit: int, iters: int,
                  ls_iters: int, lim_dof: np.ndarray, chain1: np.ndarray,
                  chain2: np.ndarray, reference_fn,
                  interpret: bool = False):
    """Builds the fused CG solve for one model's static structure.

    Per-env signature (vmap over the leading env axis to hit the kernel):
      (qM (nv,nv), qMinv (nv,nv), qacc_smooth (nv,), cdof (nv,6),
       g36 (36, ncon) [G2|G1 stacked, f-major], lim_sign/aref/D (nlimit,),
       con_mu (ncon,2), con_aref/D (ncon,4))
      -> (qacc (nv,), qfrc_constraint (nv,), con_f (ncon,4))

    reference_fn: per-env jnp implementation with the same signature —
    the unbatched/CPU fallback (and the ground truth the kernel is tested
    against).
    """
    key = (nv, ncon, nlimit, iters, ls_iters,
           lim_dof.tobytes(), chain1.tobytes(), chain2.tobytes(), interpret)
    hit = _FUSED_CACHE.get(key)
    if hit is not None:
        return hit

    elim_c = np.zeros((nlimit, nv), np.float32)
    elim_c[np.arange(nlimit), lim_dof] = 1.0
    chain_c = np.stack([chain2, chain1]).astype(np.float32)
    chaint_c = np.stack([chain2.T, chain1.T]).astype(np.float32)

    kernel = functools.partial(_cg_kernel,
                               (nv, ncon, nlimit, iters, ls_iters))

    def lanes_call(qM, qMinv, x0, cdof, g36, lim_sign, lim_aref, lim_D,
                   con_mu, con_aref, con_D):
        """All args lanes-last ((..., B)); B a multiple of _BLOCK."""
        b = qM.shape[-1]
        grid = (b // _BLOCK,)
        vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None

        def spec(*shape):
            return pl.BlockSpec(shape + (_BLOCK,),
                                (lambda i: (0,) * len(shape) + (i,)),
                                memory_space=vmem)

        def cspec(shape):
            return pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                memory_space=vmem)

        # double-buffered qM/qMinv blocks alone are ~12 MB; raise the
        # Mosaic scoped-VMEM cap above its conservative 16 MB default
        # (physical VMEM is far larger on v5e+)
        params = (pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
                  if (_HAS_PLTPU and not interpret) else None)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=params,
            out_shape=[jax.ShapeDtypeStruct((nv, b), jnp.float32),
                       jax.ShapeDtypeStruct((nv, b), jnp.float32),
                       jax.ShapeDtypeStruct((4, ncon, b), jnp.float32)],
            in_specs=[spec(nv, nv), spec(nv, nv), spec(nv), spec(6, nv),
                      spec(36, ncon), spec(nlimit), spec(nlimit),
                      spec(nlimit), spec(2, ncon), spec(4, ncon),
                      spec(4, ncon),
                      cspec((2, ncon, nv)), cspec((2, nv, ncon)),
                      cspec((nlimit, nv)), cspec((nv, nlimit))],
            out_specs=[spec(nv), spec(nv), spec(4, ncon)],
            scratch_shapes=[pltpu.VMEM((nv, 1, _BLOCK), jnp.float32)],
            interpret=interpret,
        )(qM, qMinv, x0, cdof, g36, lim_sign, lim_aref, lim_D,
          con_mu, con_aref, con_D,
          jnp.asarray(chain_c), jnp.asarray(chaint_c),
          jnp.asarray(elim_c), jnp.asarray(elim_c.T))
        return out

    @custom_batching.custom_vmap
    def cg_fused(qM, qMinv, x0, cdof, g36, lim_sign, lim_aref, lim_D,
                 con_mu, con_aref, con_D):
        return reference_fn(qM, qMinv, x0, cdof, g36, lim_sign, lim_aref,
                            lim_D, con_mu, con_aref, con_D)

    @cg_fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        # single-level vmap over envs; broadcast any unbatched operand
        # (con_mu comes from static model tables) to the env axis.
        flat = [a if bt else
                jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                for a, bt in zip(args, in_batched)]
        b = axis_size
        use_pallas = interpret or (
            _HAS_PLTPU and jax.default_backend() == "tpu"
            and b >= _MIN_FUSED_BATCH)
        if not use_pallas:
            out = jax.vmap(cg_fused)(*flat)
        else:
            pad = (-b) % _BLOCK
            # lanes-last layouts (matrices keep row-major leading dims)
            def to_lanes(a, perm):
                a = jnp.transpose(a, perm)
                if pad:
                    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
                return a

            qMl = to_lanes(flat[0], (1, 2, 0))
            qMinvl = to_lanes(flat[1], (1, 2, 0))
            x0l = to_lanes(flat[2], (1, 0))
            cdofl = to_lanes(flat[3], (2, 1, 0))      # (6, nv, B)
            g36l = to_lanes(flat[4], (1, 2, 0))       # (36, ncon, B)
            lsl = to_lanes(flat[5], (1, 0))
            lal = to_lanes(flat[6], (1, 0))
            ldl = to_lanes(flat[7], (1, 0))
            cmul = to_lanes(flat[8], (2, 1, 0))       # (2, ncon, B)
            carl = to_lanes(flat[9], (2, 1, 0))       # (4, ncon, B)
            cdl = to_lanes(flat[10], (2, 1, 0))
            qacc, qfrc, conf = lanes_call(
                qMl, qMinvl, x0l, cdofl, g36l, lsl, lal, ldl,
                cmul, carl, cdl)
            out = (jnp.transpose(qacc, (1, 0))[:b],
                   jnp.transpose(qfrc, (1, 0))[:b],
                   jnp.transpose(conf, (2, 1, 0))[:b])
        return tuple(out), (True, True, True)

    _FUSED_CACHE[key] = cg_fused
    return cg_fused
