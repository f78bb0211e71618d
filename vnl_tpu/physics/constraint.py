"""Constraint assembly: joint limits + pyramidal contact rows.

Builds the static-shape efc system for MuJoCo's soft-constraint model:

  aref_i = -b * (J qvel)_i - k * imp_i * pos_i
  b = 2 / (dmax * timeconst),  k = 1 / (dmax^2 * timeconst^2 * dampratio^2)
  R_i = (1 - imp_i) / imp_i * diagApprox_i

TPU-first structure: the pyramidal facet Jacobian (4 rows per contact,
J = Jn +- mu*Jt) is never materialized.  Constraints are kept factored:

- limits: static one-hot dofs + traced side sign => J@x is a gather,
  J^T f is a (nv, nlimit) constant matmul;
- contacts: only the 3-row contact-frame Jacobian Jc (ncon, 3, nv) is
  built — as G @ cdof with G = [frame | r x frame] (one small matmul, no
  (ncon, nv, 3) cross-product intermediates) — and facet quantities are
  +-mu combinations of the 3 base products.

Every candidate row always exists; inactive rows get impedance ~0 =>
R ~ inf => ~zero force, keeping shapes static under jit.
diagApprox follows MuJoCo (validated vs oracle efc_R): limits use
dof_invweight0; pyramidal facets use (iw1+iw2) * 2 * (1 + mu_k^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics.model import (ConeType, Data, DisableBit, JointType,
                                   Model, SolverType)


class EfcSystem(NamedTuple):
    """Factored constraint system (static shapes; ncon = m.ncon_max).

    The contact Jacobian exists in two equivalent forms:
    - dense ``con_Jc`` (ncon, 3, nv) — built when ``materialize_jc``;
    - fully factored: per-side moment arms ``con_G1/2`` (ncon, 3, 6) plus
      STATIC chain masks ``con_chain1/2`` (ncon, nv numpy), with
      Jc = (chain2 ⊙ G2 − chain1 ⊙ G1) · cdof.  The factored form is what
      the fused TPU solver kernel consumes (ops/pallas_cg.py) — it turns
      J-products into static-mask matmuls and skips the (ncon, 3, nv)
      HBM intermediate entirely.
    """

    # joint limits
    lim_dof: np.ndarray      # (nlimit,) static dof indices
    lim_onehot: jax.Array    # (nlimit, nv) static one-hot rows
    lim_sign: jax.Array      # (nlimit,) +-1 side
    lim_aref: jax.Array      # (nlimit,)
    lim_D: jax.Array         # (nlimit,)
    lim_pos: jax.Array       # (nlimit,)
    # contacts (pyramidal condim 1/3)
    con_Jc: jax.Array        # (ncon, 3, nv) rows: normal, tan1, tan2 (or None)
    con_G1: jax.Array        # (ncon, 3, 6) side-1 [r x frame | frame] rows
    con_G2: jax.Array        # (ncon, 3, 6) side-2
    con_chain1: np.ndarray   # (ncon, nv) static 0/1 chain mask, side 1
    con_chain2: np.ndarray   # (ncon, nv) static
    con_cdof: jax.Array      # (nv, 6) cdof snapshot the factored form uses
    con_mu: jax.Array        # (ncon, 2) mu1, mu2
    con_aref: jax.Array      # (ncon, 4) per-facet reference acceleration
    con_D: jax.Array         # (ncon, 4) per-facet 1/R (0-masked rows)
    con_pos: jax.Array       # (ncon,)
    nlimit: int
    ncon: int
    cone: int = 0            # ConeType; pyramidal facets or elliptic rows

    @property
    def elliptic(self) -> bool:
        return self.cone == int(ConeType.ELLIPTIC)

    @property
    def ncon_rows(self) -> int:
        return 3 if self.elliptic else 4

    @property
    def nefc(self) -> int:
        return self.nlimit + self.ncon_rows * self.ncon

    def _base(self, x: jax.Array) -> jax.Array:
        """Contact-frame products (ncon, 3) = Jc @ x in either form."""
        if self.con_Jc is not None:
            return jnp.einsum("cfv,v->cf", self.con_Jc, x)
        cx = self.con_cdof * x[:, None]                 # (nv, 6)
        s2 = jnp.asarray(self.con_chain2, x.dtype) @ cx  # (ncon, 6)
        s1 = jnp.asarray(self.con_chain1, x.dtype) @ cx
        return (jnp.einsum("cfk,ck->cf", self.con_G2, s2)
                - jnp.einsum("cfk,ck->cf", self.con_G1, s1))

    # ---- factored J products ----
    def jx(self, x: jax.Array):
        """Returns (lim_jx (nlimit,), con_fx (ncon, ncon_rows)) = J @ x.

        Pyramidal: rows are the 4 facets n ± mu*t; elliptic: the raw
        contact-frame rows (n, t1, t2)."""
        lim = self.lim_sign * x[jnp.asarray(self.lim_dof)] \
            if self.nlimit else jnp.zeros(0, x.dtype)
        if self.ncon:
            base = self._base(x)
            if self.elliptic:
                fx = base
            else:
                n, t1, t2 = base[:, 0], base[:, 1], base[:, 2]
                mu1, mu2 = self.con_mu[:, 0], self.con_mu[:, 1]
                fx = jnp.stack([n + mu1 * t1, n - mu1 * t1,
                                n + mu2 * t2, n - mu2 * t2], axis=-1)
        else:
            fx = jnp.zeros((0, self.ncon_rows), x.dtype)
        return lim, fx

    def jt_f(self, lim_f: jax.Array, con_f: jax.Array) -> jax.Array:
        """J^T @ f from per-block forces."""
        nv = self.lim_onehot.shape[-1] if self.nlimit else self.con_cdof.shape[0]
        out = jnp.zeros(nv, lim_f.dtype if self.nlimit else con_f.dtype)
        if self.nlimit:
            out = out + self.lim_onehot.T @ (self.lim_sign * lim_f)
        if self.ncon:
            if self.elliptic:
                fvec = con_f                               # (ncon, 3)
            else:
                mu1, mu2 = self.con_mu[:, 0], self.con_mu[:, 1]
                fn = con_f.sum(axis=-1)
                ft1 = mu1 * (con_f[:, 0] - con_f[:, 1])
                ft2 = mu2 * (con_f[:, 2] - con_f[:, 3])
                fvec = jnp.stack([fn, ft1, ft2], axis=-1)  # (ncon, 3)
            if self.con_Jc is not None:
                out = out + jnp.einsum("cfv,cf->v", self.con_Jc, fvec)
            else:
                t2 = jnp.einsum("cfk,cf->ck", self.con_G2, fvec)
                t1 = jnp.einsum("cfk,cf->ck", self.con_G1, fvec)
                u = (jnp.asarray(self.con_chain2, fvec.dtype).T @ t2
                     - jnp.asarray(self.con_chain1, fvec.dtype).T @ t1)
                out = out + jnp.einsum("vk,vk->v", self.con_cdof, u)
        return out


def _impedance(solimp, r):
    """MuJoCo solimp sigmoid: impedance as a function of violation |r|."""
    d0, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                   solimp[..., 2], solimp[..., 3],
                                   solimp[..., 4])
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    pow_ = jnp.maximum(power, 1.0)
    mid = jnp.clip(mid, 1e-4, 1.0 - 1e-4)
    y_lo = (x / mid) ** pow_ * mid
    y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** pow_ * (1.0 - mid)
    y = jnp.where(x < mid, y_lo, y_hi)
    imp = d0 + y * (dmax - d0)
    return jnp.clip(imp, 1e-5, 1.0 - 1e-5)


def _kb(solref, solimp):
    """b = 2/(dmax*tc), k = 1/(dmax^2 tc^2 dr^2); negative solref is the
    direct (-stiffness, -damping) format (mj_makeImpedance)."""
    tc, dr = solref[..., 0], solref[..., 1]
    dmax = solimp[..., 1]
    b = 2.0 / jnp.maximum(dmax * tc, 1e-8)
    k = 1.0 / jnp.maximum((dmax * tc * dr) ** 2, 1e-12)
    direct = tc <= 0
    b = jnp.where(direct, -solref[..., 1], b)
    k = jnp.where(direct, -solref[..., 0], k)
    return k, b


def make_constraints(m: Model, d: Data, con_dist, con_pos, con_frame,
                     con_pair: np.ndarray,
                     materialize_jc: bool = None) -> EfcSystem:
    """materialize_jc: build the dense (ncon, 3, nv) con_Jc.  Default: only
    when the Newton solver needs it for its Hessian, or when the fused CG
    kernel is unavailable (the XLA CG path is then marginally faster dense).
    """
    dtype = d.qpos.dtype
    nv = m.nv
    if materialize_jc is None:
        from vnl_tpu.ops import pallas_cg
        materialize_jc = (m.opt.solver == int(SolverType.NEWTON)
                          or m.opt.cone == int(ConeType.ELLIPTIC)
                          or not pallas_cg.enabled())

    disable_limit = bool(m.opt.disableflags & DisableBit.LIMIT)
    disable_contact = bool(m.opt.disableflags & DisableBit.CONTACT)
    disable_cstr = bool(m.opt.disableflags & DisableBit.CONSTRAINT)

    # ---------------- joint limits ----------------
    lim_ids = np.nonzero(np.asarray(m.jnt_limited))[0]
    if disable_limit or disable_cstr:
        lim_ids = lim_ids[:0]
    nlimit = len(lim_ids)
    if nlimit:
        lim_dof = m.jnt_dofadr[lim_ids]
        qadr = jnp.asarray(m.jnt_qposadr[lim_ids])
        q = d.qpos[qadr]
        lo = m.jnt_range[jnp.asarray(lim_ids), 0]
        hi = m.jnt_range[jnp.asarray(lim_ids), 1]
        dist_lo = q - lo
        dist_hi = hi - q
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(dist_lo < dist_hi, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[jnp.asarray(lim_ids)]
        pos = dist - margin
        onehot = np.zeros((nlimit, nv))
        onehot[np.arange(nlimit), lim_dof] = 1.0
        solimp_l = m.jnt_solimp[jnp.asarray(lim_ids)]
        imp = jnp.where(pos < 0.0, _impedance(solimp_l, pos), 1e-7)
        k, b = _kb(m.jnt_solref[jnp.asarray(lim_ids)], solimp_l)
        vel = sign * d.qvel[jnp.asarray(lim_dof)]
        lim_aref = -b * vel - k * imp * pos
        R_lim = jnp.maximum((1.0 - imp) / imp
                            * jnp.maximum(m.dof_invweight0[jnp.asarray(lim_dof)],
                                          1e-12), 1e-10)
        lim = dict(lim_dof=lim_dof, lim_onehot=jnp.asarray(onehot, dtype),
                   lim_sign=sign, lim_aref=lim_aref, lim_D=1.0 / R_lim,
                   lim_pos=pos)
    else:
        lim = dict(lim_dof=np.zeros(0, np.int32),
                   lim_onehot=jnp.zeros((0, nv), dtype),
                   lim_sign=jnp.zeros(0, dtype), lim_aref=jnp.zeros(0, dtype),
                   lim_D=jnp.zeros(0, dtype), lim_pos=jnp.zeros(0, dtype))

    # ---------------- contacts ----------------
    ncon = m.ncon_max if not (disable_contact or disable_cstr) else 0
    if ncon:
        bd_mask = jnp.asarray(m.body_chain_dof_mask, dtype)
        g1 = m.pair_geom1[con_pair]
        g2 = m.pair_geom2[con_pair]
        b1 = m.geom_bodyid[g1]
        b2 = m.geom_bodyid[g2]
        root = m.body_rootid
        org1 = d.subtree_com[jnp.asarray(root[b1])]
        org2 = d.subtree_com[jnp.asarray(root[b2])]

        def side_G(org):
            # rows of G: [r x frame | frame]; Jc_side = (G @ cdof^T) ⊙ chain
            r = con_pos - org                         # (ncon, 3)
            F = con_frame                             # (ncon, 3, 3)
            rxF = jnp.cross(jnp.broadcast_to(r[:, None, :], F.shape), F)
            return jnp.concatenate([rxF, F], axis=-1)  # (ncon, 3, 6): [ang|lin]

        con_G1 = side_G(org1)
        con_G2 = side_G(org2)
        chain1 = np.asarray(m.body_chain_dof_mask)[b1].astype(np.float32)
        chain2 = np.asarray(m.body_chain_dof_mask)[b2].astype(np.float32)
        if materialize_jc:
            con_Jc = (jnp.einsum("cfk,vk->cfv", con_G2, d.cdof)
                      * bd_mask[jnp.asarray(b2)][:, None, :]
                      - jnp.einsum("cfk,vk->cfv", con_G1, d.cdof)
                      * bd_mask[jnp.asarray(b1)][:, None, :])
        else:
            con_Jc = None

        pair = jnp.asarray(con_pair)
        margin = m.pair_margin[pair]
        gap = m.pair_gap[pair]
        pos = con_dist - margin
        include = con_dist < (margin - gap)
        solimp_c = m.pair_solimp[pair]
        imp = jnp.where(include, _impedance(solimp_c, pos), 1e-7)
        k, b = _kb(m.pair_solref[pair], solimp_c)

        mu1 = m.pair_friction[pair, 0]
        mu2 = m.pair_friction[pair, 1]
        condim = m.pair_dim[con_pair]                  # static numpy
        pyramid = jnp.asarray(condim >= 3, dtype)
        elliptic = m.opt.cone == int(ConeType.ELLIPTIC)
        if elliptic:
            # frictional rows exist only for condim>=3; mu=0 pushes the
            # cone branches to the pure-normal unilateral case
            mu1 = mu1 * pyramid
            mu2 = mu2 * pyramid
        con_mu = jnp.stack([mu1, mu2], axis=-1)

        # contact-frame velocities
        if con_Jc is not None:
            base_vel = jnp.einsum("cfv,v->cf", con_Jc, d.qvel)
        else:
            cx = d.cdof * d.qvel[:, None]              # (nv, 6)
            base_vel = (jnp.einsum("cfk,ck->cf", con_G2,
                                   jnp.asarray(chain2, dtype) @ cx)
                        - jnp.einsum("cfk,ck->cf", con_G1,
                                     jnp.asarray(chain1, dtype) @ cx))
        nvl, t1v, t2v = base_vel[:, 0], base_vel[:, 1], base_vel[:, 2]

        iw_sum = (m.body_invweight0[jnp.asarray(b1)]
                  + m.body_invweight0[jnp.asarray(b2)])
        if elliptic:
            # rows (n, t1, t2); aref position term on the normal row only;
            # tangential impedance scaled by impratio (oracle-validated:
            # D = (Dn, Dn*impratio, Dn*impratio), see tests)
            con_aref = (-b[:, None] * base_vel
                        - (k * imp * pos)[:, None]
                        * jnp.array([1.0, 0.0, 0.0], dtype))
            R_n = jnp.maximum((1.0 - imp) / imp
                              * jnp.maximum(iw_sum, 1e-12), 1e-10)
            D_n = 1.0 / R_n
            D_t = D_n * float(m.opt.impratio) * pyramid
            con_D = jnp.stack([D_n, D_t, D_t], axis=-1)
        else:
            fvel = jnp.stack([nvl + mu1 * t1v, nvl - mu1 * t1v,
                              nvl + mu2 * t2v, nvl - mu2 * t2v], axis=-1)
            con_aref = -b[:, None] * fvel - (k * imp * pos)[:, None]

            mu_f = jnp.stack([mu1, mu1, mu2, mu2], axis=-1)
            diag = jnp.where(pyramid[:, None] > 0,
                             iw_sum[:, None] * 2.0 * (1.0 + mu_f * mu_f),
                             iw_sum[:, None])
            R_con = jnp.maximum(((1.0 - imp) / imp)[:, None]
                                * jnp.maximum(diag, 1e-12), 1e-10)
            con_D = 1.0 / R_con
            # frictionless contacts act through facet 0 only (mu=0 makes
            # all facets duplicates of the normal row => zero the extras)
            facet_on = jnp.concatenate(
                [jnp.ones((ncon, 1), dtype),
                 jnp.broadcast_to(pyramid[:, None], (ncon, 3))], axis=-1)
            con_D = con_D * facet_on
            con_aref = con_aref * facet_on
        con = dict(con_Jc=con_Jc, con_G1=con_G1, con_G2=con_G2,
                   con_chain1=chain1, con_chain2=chain2, con_cdof=d.cdof,
                   con_mu=con_mu, con_aref=con_aref,
                   con_D=con_D, con_pos=pos)
    else:
        nrows = 3 if m.opt.cone == int(ConeType.ELLIPTIC) else 4
        con = dict(con_Jc=jnp.zeros((0, 3, nv), dtype),
                   con_G1=jnp.zeros((0, 3, 6), dtype),
                   con_G2=jnp.zeros((0, 3, 6), dtype),
                   con_chain1=np.zeros((0, nv), np.float32),
                   con_chain2=np.zeros((0, nv), np.float32),
                   con_cdof=d.cdof,
                   con_mu=jnp.zeros((0, 2), dtype),
                   con_aref=jnp.zeros((0, nrows), dtype),
                   con_D=jnp.zeros((0, nrows), dtype),
                   con_pos=jnp.zeros(0, dtype))

    return EfcSystem(nlimit=nlimit, ncon=ncon, cone=int(m.opt.cone),
                     **lim, **con)
