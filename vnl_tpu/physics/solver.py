"""Constraint solvers: primal CG and Newton over joint accelerations.

MuJoCo's convex soft-constraint problem in primal form:

  min_x  0.5 (x - a_smooth)^T M (x - a_smooth)
         + 0.5 sum_i D_i * [jar_i < 0] * jar_i^2,     jar = J x - aref

All reference-relevant rows (joint limits, pyramidal contact facets) are
one-sided inequalities, active when jar_i < 0.  The solution x is qacc and
the constraint force is f = -D * [jar<0] * jar, qfrc_constraint = J^T f.

TPU-first choices: fixed iteration counts (no data-dependent early exit, so
the epoch stays one straight-line XLA program), M-preconditioned
Polak-Ribiere CG (reusing the cached Cholesky of M), and an exact
piecewise-quadratic line search iterated ls_iterations times.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vnl_tpu.physics import inertia as _inertia
from vnl_tpu.physics.constraint import EfcSystem
from vnl_tpu.physics.model import Data, Model, SolverType


def _line_search(m: Model, x, p, a_smooth, Mx_minus_a, Mp, jar, Jp, D):
    """Exact line search on the piecewise-quadratic cost along p.

    For a fixed active set the cost is quadratic in alpha with minimizer
    alpha* = -(p^T M (x-a) + sum D act jar Jp) / (p^T M p + sum D act Jp^2);
    iterate active-set refinement ls_iterations times.
    """
    quad_num0 = jnp.dot(p, Mx_minus_a)
    quad_den0 = jnp.dot(p, Mp)
    alpha = jnp.zeros((), x.dtype)
    for _ in range(max(m.opt.ls_iterations, 1)):
        act = (jar + alpha * Jp) < 0.0
        num = quad_num0 + jnp.sum(D * act * jar * Jp)
        den = quad_den0 + jnp.sum(D * act * Jp * Jp)
        alpha = -num / jnp.maximum(den, 1e-12)
    return alpha


def solve(m: Model, d: Data, efc: EfcSystem, qacc_smooth: jax.Array):
    """Runs the configured solver; returns (qacc, qfrc_constraint, efc_force)."""
    dtype = qacc_smooth.dtype
    if efc.nefc == 0:
        return qacc_smooth, jnp.zeros(m.nv, dtype), jnp.zeros(0, dtype)

    J, aref, D = efc.J, efc.aref, efc.D

    def grad_at(x, jar):
        act = jar < 0.0
        force = -D * act * jar
        g = d.qM @ (x - qacc_smooth) - J.T @ force
        return g, force

    x = qacc_smooth
    jar = J @ x - aref

    if m.opt.solver == int(SolverType.NEWTON):
        for _ in range(max(m.opt.iterations, 1)):
            g, _ = grad_at(x, jar)
            act = (jar < 0.0).astype(dtype)
            H = d.qM + (J.T * (D * act)) @ J
            L = jax.scipy.linalg.cholesky(H, lower=True)
            y = jax.scipy.linalg.solve_triangular(L, -g, lower=True)
            p = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
            Jp = J @ p
            Mp = d.qM @ p
            Mx_a = d.qM @ (x - qacc_smooth)
            alpha = _line_search(m, x, p, qacc_smooth, Mx_a, Mp, jar, Jp, D)
            x = x + alpha * p
            jar = jar + alpha * Jp
    else:  # CG (PGS falls back to CG)
        g, _ = grad_at(x, jar)
        Mg = _inertia.solve_m(d, g)
        p = -Mg
        g_dot_Mg = jnp.dot(g, Mg)
        for _ in range(max(m.opt.iterations, 1)):
            Jp = J @ p
            Mp = d.qM @ p
            Mx_a = d.qM @ (x - qacc_smooth)
            alpha = _line_search(m, x, p, qacc_smooth, Mx_a, Mp, jar, Jp, D)
            x = x + alpha * p
            jar = jar + alpha * Jp
            g_new, _ = grad_at(x, jar)
            Mg_new = _inertia.solve_m(d, g_new)
            num = jnp.dot(g_new, Mg_new) - jnp.dot(g, Mg_new)
            beta = jnp.maximum(0.0, num / jnp.maximum(g_dot_Mg, 1e-12))
            p = -Mg_new + beta * p
            g, Mg, g_dot_Mg = g_new, Mg_new, jnp.dot(g_new, Mg_new)

    _, force = grad_at(x, jar)
    qfrc_constraint = J.T @ force
    return x, qfrc_constraint, force
