"""Constraint solvers: primal CG and Newton over joint accelerations.

MuJoCo's convex soft-constraint problem in primal form:

  min_x  0.5 (x - a_smooth)^T M (x - a_smooth)
         + 0.5 sum_i D_i * [jar_i < 0] * jar_i^2,     jar = J x - aref

All reference-relevant rows (joint limits, pyramidal contact facets) are
one-sided inequalities, active when jar_i < 0.  The solution x is qacc and
the constraint force is f = -D * [jar<0] * jar, qfrc_constraint = J^T f.

TPU-first choices: fixed iteration counts (no data-dependent exits — the
epoch stays one straight-line XLA program); the factored EfcSystem keeps
J products as gathers + one (ncon,3,nv) einsum instead of a dense
(nefc, nv) matrix; M^-1 preconditioning (CG) and the Newton step are
single matmuls against cached Schur inverses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from vnl_tpu.physics.constraint import EfcSystem
from vnl_tpu.physics.model import Data, Model, SolverType


def _scan_unroll() -> int:
    """Solver-iteration scan unroll factor (env VNL_TPU_SOLVER_UNROLL).

    Full unroll is ~17% faster per step on TPU (fewer loop-carried
    barriers, +2 s compile); on CPU large unrolls have historically blown
    up XLA compile times, so the default stays 1 there.
    """
    import os
    v = os.environ.get("VNL_TPU_SOLVER_UNROLL")
    if v is not None:
        return int(v)
    try:
        return 16 if jax.default_backend() == "tpu" else 1
    except Exception:  # pragma: no cover
        return 1


def _elliptic_zones(efc: EfcSystem, con_jar):
    """Per-contact cone zones for jar = (N, t1, t2).

    The elliptic force is the D^-1-metric projection of -D*jar onto the
    friction cone {||f_t|| <= mu f_n} (identified against the MuJoCo C
    oracle across mu/impratio/slip sweeps, incl. D_t = D_n * impratio):
      top (separated, N >= mu T):            f = 0
      bottom (-D*jar inside the cone):       f = -D * jar
      middle (cone surface):  f_n = Dn Dt (mu T - N) / (Dt + mu^2 Dn),
                              f_t = -mu f_n t / T.
    Returns (N, t, T, mu, Dn, Dt, top, bottom, fn_mid)."""
    mu = efc.con_mu[:, 0]
    Dn = efc.con_D[:, 0]
    Dt = efc.con_D[:, 1]
    N = con_jar[:, 0]
    t = con_jar[:, 1:]
    T = jnp.sqrt(jnp.sum(t * t, axis=-1) + 1e-20)
    top = N >= mu * T
    # -D*jar in-cone: Dt*T <= -mu*Dn*N  (covers frictionless Dt=0, N<0)
    bottom = jnp.logical_and(jnp.logical_not(top), Dt * T <= -mu * Dn * N)
    c = Dn * Dt / (Dt + mu * mu * Dn + 1e-20)
    fn_mid = c * (mu * T - N)
    return N, t, T, mu, Dn, Dt, top, bottom, fn_mid, c


def _elliptic_force(efc: EfcSystem, con_jar):
    N, t, T, mu, Dn, Dt, top, bottom, fn_mid, _ = _elliptic_zones(efc,
                                                                  con_jar)
    fn = jnp.where(top, 0.0, jnp.where(bottom, -Dn * N, fn_mid))
    ft_bottom = -Dt[:, None] * t
    ft_mid = -(mu * fn_mid / T)[:, None] * t
    ft = jnp.where(top[:, None], 0.0,
                   jnp.where(bottom[:, None], ft_bottom, ft_mid))
    return jnp.concatenate([fn[:, None], ft], axis=-1)


def _forces(efc: EfcSystem, lim_jx, con_fx):
    """Constraint forces per block: active-set f = -D [jar<0] jar for
    limits and pyramidal facets; cone projection for elliptic contacts."""
    lim_jar = lim_jx - efc.lim_aref
    con_jar = con_fx - efc.con_aref
    lim_f = -efc.lim_D * (lim_jar < 0) * lim_jar
    if efc.elliptic and efc.ncon:
        con_f = _elliptic_force(efc, con_jar)
    else:
        con_f = -efc.con_D * (con_jar < 0) * con_jar
    return lim_jar, con_jar, lim_f, con_f


def _line_search_elliptic(ls_iters: int, efc: EfcSystem, p, Mx_minus_a,
                          Mp, lim_jar, con_jar, lim_jp, con_jp):
    """Frozen-zone Newton refinement of alpha for the elliptic-cone cost.

    Per iteration the cone zones and tangential direction are frozen at
    the current alpha, making the 1-D model quadratic (middle-zone cost
    0.5 c (mu T - N)^2 with T linearized along the ray); limits stay the
    exact active-set quadratic.  This reduces to the pyramidal search's
    fixed point when no contact is in the middle zone."""
    quad_num0 = jnp.dot(p, Mx_minus_a)
    quad_den0 = jnp.dot(p, Mp)
    jp_n = con_jp[:, 0]
    jp_t = con_jp[:, 1:]

    def dphi(alpha):
        """Exact phi'(alpha) — the 1-D cost is convex, so phi' is
        monotone and a bracket+bisect on it is globally safe (frozen-zone
        Newton can cycle between cone zones under strong anisotropy)."""
        ljar = lim_jar + alpha * lim_jp
        lim_act = ljar < 0.0
        con_f = _elliptic_force(efc, con_jar + alpha * con_jp)
        return (quad_num0 + alpha * quad_den0
                + jnp.sum(efc.lim_D * lim_act * ljar * lim_jp)
                - jnp.sum(con_f * con_jp))

    # expand the bracket [0, hi] until phi'(hi) >= 0
    def expand(_, hi):
        return jnp.where(dphi(hi) < 0.0, hi * 4.0, hi)

    hi = jax.lax.fori_loop(0, 12, expand, jnp.ones((), p.dtype))

    def bisect(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        neg = dphi(mid) < 0.0
        return jnp.where(neg, mid, lo), jnp.where(neg, hi, mid)

    lo, hi = jax.lax.fori_loop(0, max(ls_iters, 1) * 4, bisect,
                               (jnp.zeros((), p.dtype), hi))
    alpha = 0.5 * (lo + hi)
    return jnp.where(dphi(jnp.zeros((), p.dtype)) >= 0.0,
                     jnp.zeros((), p.dtype), alpha)


def _line_search(ls_iters: int, efc: EfcSystem, p, Mx_minus_a, Mp,
                 lim_jar, con_jar, lim_jp, con_jp):
    """Exact line search on the piecewise-quadratic cost along p
    (fori_loop body: active-set refinement at fixed trip count).

    (A per-env fused-line-search Pallas kernel existed through round 2 but
    measured slower than the XLA path at B=1024 and was removed; the whole
    CG solve is fused instead — ops/pallas_cg.py.)"""
    if efc.elliptic and efc.ncon:
        return _line_search_elliptic(ls_iters, efc, p, Mx_minus_a, Mp,
                                     lim_jar, con_jar, lim_jp, con_jp)
    quad_num0 = jnp.dot(p, Mx_minus_a)
    quad_den0 = jnp.dot(p, Mp)
    n_iter = max(ls_iters, 1)

    def body(_, alpha):
        lim_act = (lim_jar + alpha * lim_jp) < 0.0
        con_act = (con_jar + alpha * con_jp) < 0.0
        num = (quad_num0
               + jnp.sum(efc.lim_D * lim_act * lim_jar * lim_jp)
               + jnp.sum(efc.con_D * con_act * con_jar * con_jp))
        den = (quad_den0
               + jnp.sum(efc.lim_D * lim_act * lim_jp * lim_jp)
               + jnp.sum(efc.con_D * con_act * con_jp * con_jp))
        return -num / jnp.maximum(den, 1e-12)

    return jax.lax.fori_loop(0, n_iter, body, jnp.zeros((), p.dtype))


def _cg_loop(qM, qMinv, efc: EfcSystem, qacc_smooth, n_iter: int,
             ls_iters: int, unroll: int = 1):
    """Preconditioned Polak–Ribière CG on the primal problem.

    Shared by the XLA path and the fused-kernel reference/fallback; the
    Pallas kernel (ops/pallas_cg.py) mirrors these semantics exactly."""

    def grad_at(x, lim_jx, con_fx):
        _, _, lim_f, con_f = _forces(efc, lim_jx, con_fx)
        return qM @ (x - qacc_smooth) - efc.jt_f(lim_f, con_f)

    x = qacc_smooth
    lim_jx, con_fx = efc.jx(x)
    g = grad_at(x, lim_jx, con_fx)
    Mg = qMinv @ g
    p = -Mg
    g_dot_Mg = jnp.dot(g, Mg)

    def cg_iter(carry, _):
        x, lim_jx, con_fx, g, Mg, g_dot_Mg, p = carry
        lim_jp, con_jp = efc.jx(p)
        Mp = qM @ p
        Mx_a = qM @ (x - qacc_smooth)
        alpha = _line_search(ls_iters, efc, p, Mx_a, Mp,
                             lim_jx - efc.lim_aref,
                             con_fx - efc.con_aref, lim_jp, con_jp)
        x = x + alpha * p
        lim_jx = lim_jx + alpha * lim_jp
        con_fx = con_fx + alpha * con_jp
        g_new = grad_at(x, lim_jx, con_fx)
        Mg_new = qMinv @ g_new
        num = jnp.dot(g_new, Mg_new) - jnp.dot(g, Mg_new)
        beta = jnp.maximum(0.0, num / jnp.maximum(g_dot_Mg, 1e-12))
        p = -Mg_new + beta * p
        return (x, lim_jx, con_fx, g_new, Mg_new,
                jnp.dot(g_new, Mg_new), p), ()

    (x, lim_jx, con_fx, *_), _ = jax.lax.scan(
        cg_iter, (x, lim_jx, con_fx, g, Mg, g_dot_Mg, p), (),
        length=n_iter, unroll=min(unroll, n_iter))
    return x, lim_jx, con_fx


_CG_REF_CACHE: dict = {}


def _make_cg_reference(nv, ncon, nlimit, n_iter, ls_iters, lim_dof,
                       chain1, chain2):
    """Per-env flat-signature CG solve (the fused kernel's ground truth)."""
    key = (nv, ncon, nlimit, n_iter, ls_iters, lim_dof.tobytes(),
           chain1.tobytes(), chain2.tobytes())
    hit = _CG_REF_CACHE.get(key)
    if hit is not None:
        return hit
    import numpy as np
    onehot = np.zeros((nlimit, nv), np.float32)
    onehot[np.arange(nlimit), lim_dof] = 1.0

    def ref(qM, qMinv, x0, cdof, g36, lim_sign, lim_aref, lim_D,
            con_mu, con_aref, con_D):
        dtype = x0.dtype
        G2 = g36[:18].reshape(3, 6, ncon).transpose(2, 0, 1)
        G1 = g36[18:].reshape(3, 6, ncon).transpose(2, 0, 1)
        efc = EfcSystem(
            lim_dof=lim_dof, lim_onehot=jnp.asarray(onehot, dtype),
            lim_sign=lim_sign, lim_aref=lim_aref, lim_D=lim_D,
            lim_pos=jnp.zeros(nlimit, dtype),
            con_Jc=None, con_G1=G1, con_G2=G2,
            con_chain1=chain1, con_chain2=chain2, con_cdof=cdof,
            con_mu=con_mu, con_aref=con_aref, con_D=con_D,
            con_pos=jnp.zeros(ncon, dtype), nlimit=nlimit, ncon=ncon)
        x, lim_jx, con_fx = _cg_loop(qM, qMinv, efc, x0, n_iter, ls_iters)
        _, _, lim_f, con_f = _forces(efc, lim_jx, con_fx)
        return x, efc.jt_f(lim_f, con_f), con_f

    _CG_REF_CACHE[key] = ref
    return ref


def _solve_cg_fused(m: Model, d: Data, efc: EfcSystem, qacc_smooth,
                    n_iter: int):
    """Dispatch the whole CG solve to the one-launch Pallas kernel."""
    import numpy as np
    from vnl_tpu.ops.pallas_cg import make_cg_fused
    if efc.nlimit == 0:
        # contact-only models (box scenes, free bodies): the kernel wants
        # >=1 limit row, so synthesize one inert row (sign=0, D=0 — zero
        # jx and zero force/J^T contribution) rather than fall back to the
        # slower XLA factored path (round-2 ADVICE finding).
        dtype = qacc_smooth.dtype
        z = jnp.zeros(1, dtype)
        efc = efc._replace(
            lim_dof=np.zeros(1, np.int32),
            lim_onehot=jnp.zeros((1, m.nv), dtype),
            lim_sign=z, lim_aref=z, lim_D=z, lim_pos=z, nlimit=1)
    ls_iters = max(m.opt.ls_iterations, 1)
    lim_dof = np.asarray(efc.lim_dof)
    ref_fn = _make_cg_reference(m.nv, efc.ncon, efc.nlimit, n_iter,
                                ls_iters, lim_dof, efc.con_chain1,
                                efc.con_chain2)
    interpret = jax.default_backend() != "tpu"
    fused = make_cg_fused(m.nv, efc.ncon, efc.nlimit, n_iter, ls_iters,
                          lim_dof, efc.con_chain1, efc.con_chain2,
                          ref_fn, interpret=interpret)
    g36 = jnp.concatenate([
        efc.con_G2.transpose(1, 2, 0).reshape(18, efc.ncon),
        efc.con_G1.transpose(1, 2, 0).reshape(18, efc.ncon)], axis=0)
    return fused(d.qM, d.qMinv, qacc_smooth, efc.con_cdof, g36,
                 efc.lim_sign, efc.lim_aref, efc.lim_D, efc.con_mu,
                 efc.con_aref, efc.con_D)


def solve(m: Model, d: Data, efc: EfcSystem, qacc_smooth: jax.Array
          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Runs the configured solver.

    Returns (qacc, qfrc_constraint, contact_facet_forces (ncon, 4))."""
    dtype = qacc_smooth.dtype
    if efc.nefc == 0:
        return qacc_smooth, jnp.zeros(m.nv, dtype), jnp.zeros((0, 4), dtype)

    n_iter = max(m.opt.iterations, 1)
    if (m.opt.solver != int(SolverType.NEWTON) and efc.con_Jc is None
            and efc.ncon > 0):
        return _solve_cg_fused(m, d, efc, qacc_smooth, n_iter)

    def grad_at(x, lim_jx, con_fx):
        _, _, lim_f, con_f = _forces(efc, lim_jx, con_fx)
        g = d.qM @ (x - qacc_smooth) - efc.jt_f(lim_f, con_f)
        return g

    x = qacc_smooth
    lim_jx, con_fx = efc.jx(x)

    if m.opt.solver == int(SolverType.NEWTON):
        from vnl_tpu.ops.linalg import inv_spd

        def _elliptic_hess_blocks(con_jar):
            """Per-contact 3x3 Hessian of the elliptic-cone cost wrt
            jar = (N, t1, t2) (cf. _elliptic_zones):
              top:    0
              bottom: diag(Dn, Dt, Dt)                (plain quadratic)
              middle: c * [[1, -mu t^],[-mu t^, mu^2 t^ t^' +
                       mu (mu T - N)/T (I2 - t^ t^')]],  t^ = t/T
            — the exact second derivative of 0.5 c (mu T - N)^2, PSD in
            the middle zone (mu T - N > 0 there)."""
            N, t, T, mu, Dn, Dt, top, bottom, fn_mid, c = _elliptic_zones(
                efc, con_jar)
            that = t / T[:, None]
            tt = that[:, :, None] * that[:, None, :]        # (ncon, 2, 2)
            eye2 = jnp.eye(2, dtype=con_jar.dtype)
            mid_tt = ((mu * mu)[:, None, None] * tt
                      + (mu * (mu * T - N) / T)[:, None, None]
                      * (eye2 - tt))
            nt = -(mu[:, None] * that)                      # (ncon, 2)
            top_row = jnp.concatenate(
                [jnp.ones_like(N)[:, None], nt], axis=-1)   # (ncon, 3)
            bot_rows = jnp.concatenate([nt[:, :, None], mid_tt], axis=-1)
            Hb_mid = c[:, None, None] * jnp.concatenate(
                [top_row[:, None, :], bot_rows], axis=1)    # (ncon, 3, 3)
            Hb_bottom = (jnp.stack([Dn, Dt, Dt], axis=-1)[:, :, None]
                         * jnp.eye(3, dtype=con_jar.dtype))
            Hb = jnp.where(bottom[:, None, None], Hb_bottom, Hb_mid)
            return jnp.where(top[:, None, None], 0.0, Hb)

        def newton_iter(carry, _):
            x, lim_jx, con_fx = carry
            lim_jar = lim_jx - efc.lim_aref
            con_jar = con_fx - efc.con_aref
            g = grad_at(x, lim_jx, con_fx)
            # H = M + J^T H_cost J assembled from the factored blocks
            lim_w = efc.lim_D * (lim_jar < 0)
            H = d.qM + (efc.lim_onehot.T * lim_w) @ efc.lim_onehot
            if efc.ncon and efc.elliptic:
                W = _elliptic_hess_blocks(con_jar)
                H = H + jnp.einsum("cfv,cfg,cgw->vw", efc.con_Jc, W,
                                   efc.con_Jc)
            elif efc.ncon:
                con_w = efc.con_D * (con_jar < 0)      # (ncon, 4)
                mu1, mu2 = efc.con_mu[:, 0], efc.con_mu[:, 1]
                one = jnp.ones_like(mu1)
                zero = jnp.zeros_like(mu1)
                c = jnp.stack([
                    jnp.stack([one, mu1, zero], -1),
                    jnp.stack([one, -mu1, zero], -1),
                    jnp.stack([one, zero, mu2], -1),
                    jnp.stack([one, zero, -mu2], -1),
                ], axis=1)                              # (ncon, 4, 3)
                W = jnp.einsum("ck,ckf,ckg->cfg", con_w, c, c)
                H = H + jnp.einsum("cfv,cfg,cgw->vw", efc.con_Jc, W,
                                   efc.con_Jc)
            p = -(inv_spd(H) @ g)
            lim_jp, con_jp = efc.jx(p)
            Mp = d.qM @ p
            Mx_a = d.qM @ (x - qacc_smooth)
            alpha = _line_search(m.opt.ls_iterations, efc, p, Mx_a, Mp,
                                 lim_jar, con_jar, lim_jp, con_jp)
            return (x + alpha * p, lim_jx + alpha * lim_jp,
                    con_fx + alpha * con_jp), ()

        (x, lim_jx, con_fx), _ = jax.lax.scan(
            newton_iter, (x, lim_jx, con_fx), (), length=n_iter,
            unroll=min(_scan_unroll(), n_iter))
    else:  # CG (PGS falls back to CG)
        x, lim_jx, con_fx = _cg_loop(d.qM, d.qMinv, efc, qacc_smooth,
                                     n_iter, m.opt.ls_iterations,
                                     unroll=_scan_unroll())

    _, _, lim_f, con_f = _forces(efc, lim_jx, con_fx)
    qfrc_constraint = efc.jt_f(lim_f, con_f)
    return x, qfrc_constraint, con_f
