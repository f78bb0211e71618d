"""Constraint assembly: joint limits + pyramidal contact rows.

Produces the static-shape efc system (J, aref, R, frictionless/pyramid row
structure) for MuJoCo's soft-constraint model:

  aref_i = -b * (J qvel)_i - k * imp_i * pos_i
  b = 2 / (dmax * timeconst),  k = imp / (dmax^2 * timeconst^2 * dampratio^2)
  R_i = (1 - imp_i) / imp_i * diag(J M^-1 J^T)_i

Design notes:
- every candidate row always exists; rows whose constraint is inactive
  (dist/pos beyond margin) get impedance ~0 => R ~ inf => ~zero force, which
  keeps shapes static under jit (MJX-style masking).
- R uses MuJoCo's diagApprox inverse weights (validated against the oracle's
  efc_R): limits use dof_invweight0, pyramidal contact facets use
  (body_invweight0[b1]+body_invweight0[b2]) * 2 * (1 + mu_k^2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics import inertia as _inertia
from vnl_tpu.physics.model import Data, DisableBit, JointType, Model


class EfcSystem(NamedTuple):
    J: jax.Array        # (nefc, nv)
    aref: jax.Array     # (nefc,)
    R: jax.Array        # (nefc,) diagonal regularizer
    D: jax.Array        # (nefc,) 1/R
    pos: jax.Array      # (nefc,) violation (<=0 active side)
    con_dist: jax.Array # (ncon,) contact distances (diagnostics)
    con_pos: jax.Array
    con_frame: jax.Array
    nefc: int


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
    """Stiffness/damping from solref: b = 2/(dmax*tc), k = 1/(dmax^2 tc^2 dr^2).

    aref = -b*vel - k*imp*pos (mj_makeImpedance semantics).  Negative solref
    is the direct (-stiffness, -damping) format.
    """
    tc, dr = solref[..., 0], solref[..., 1]
    dmax = solimp[..., 1]
    b = 2.0 / jnp.maximum(dmax * tc, 1e-8)
    k = 1.0 / jnp.maximum((dmax * tc * dr) ** 2, 1e-12)
    direct = tc <= 0
    b = jnp.where(direct, -solref[..., 1], b)
    k = jnp.where(direct, -solref[..., 0], k)
    return k, b


def _body_dof_mask(m: Model) -> np.ndarray:
    """(nbody, nv) static mask: dof v actuates body b (ancestor chain)."""
    mask = np.zeros((m.nbody, m.nv), dtype=np.float64)
    for b in range(1, m.nbody):
        bb = b
        while bb != 0:
            a0 = m.body_dofadr[bb]
            mask[b, a0:a0 + m.body_dofnum[bb]] = 1.0
            bb = m.body_parentid[bb]
    return mask


def make_constraints(m: Model, d: Data, con_dist, con_pos, con_frame,
                     con_pair: np.ndarray) -> EfcSystem:
    dtype = d.qpos.dtype
    nv = m.nv
    rows_J, rows_pos, rows_aref, rows_imp, rows_R = [], [], [], [], []

    disable_limit = bool(m.opt.disableflags & DisableBit.LIMIT)
    disable_contact = bool(m.opt.disableflags & DisableBit.CONTACT)
    disable_cstr = bool(m.opt.disableflags & DisableBit.CONSTRAINT)

    # ---------------- joint limits ----------------
    lim_ids = np.nonzero(np.asarray(m.jnt_limited))[0]
    if len(lim_ids) and not (disable_limit or disable_cstr):
        qadr = jnp.asarray(m.jnt_qposadr[lim_ids])
        dadr = jnp.asarray(m.jnt_dofadr[lim_ids])
        q = d.qpos[qadr]
        lo = m.jnt_range[jnp.asarray(lim_ids), 0]
        hi = m.jnt_range[jnp.asarray(lim_ids), 1]
        dist_lo = q - lo
        dist_hi = hi - q
        lower_closer = dist_lo < dist_hi
        dist = jnp.minimum(dist_lo, dist_hi)
        sign = jnp.where(lower_closer, 1.0, -1.0).astype(dtype)
        margin = m.jnt_margin[jnp.asarray(lim_ids)]
        pos = dist - margin
        J = jnp.zeros((len(lim_ids), nv), dtype)
        J = J.at[jnp.arange(len(lim_ids)), dadr].set(sign)
        active = pos < 0.0
        solimp_l = m.jnt_solimp[jnp.asarray(lim_ids)]
        imp = jnp.where(active, _impedance(solimp_l, pos), 1e-7)
        k, b = _kb(m.jnt_solref[jnp.asarray(lim_ids)], solimp_l)
        vel = sign * d.qvel[dadr]
        aref = -b * vel - k * imp * pos
        rows_J.append(J); rows_pos.append(pos)
        rows_aref.append(aref); rows_imp.append(imp)
        rows_R.append(m.dof_invweight0[dadr])

    # ---------------- contacts (pyramidal, condim 1 or 3) ----------------
    ncon = m.ncon_max
    if ncon and not (disable_contact or disable_cstr):
        bd_mask = jnp.asarray(_body_dof_mask(m), dtype)
        g1 = m.pair_geom1[con_pair]
        g2 = m.pair_geom2[con_pair]
        b1 = m.geom_bodyid[g1]
        b2 = m.geom_bodyid[g2]
        root = m.body_rootid
        org1 = d.subtree_com[jnp.asarray(root[b1])]
        org2 = d.subtree_com[jnp.asarray(root[b2])]

        def point_jac(org, body_ids):
            # (ncon, nv, 3): velocity of contact point on each body per dof
            rel = con_pos[:, None, :] - org[:, None, :]
            ang = d.cdof[None, :, :3]
            lin = d.cdof[None, :, 3:]
            jp = lin + jnp.cross(ang, jnp.broadcast_to(rel, (ncon, nv, 3)))
            return jp * bd_mask[jnp.asarray(body_ids)][..., None]

        jp_rel = point_jac(org2, b2) - point_jac(org1, b1)  # (ncon, nv, 3)
        # project on contact frame rows: (ncon, 3, nv)
        Jc = jnp.einsum("cfi,cvi->cfv", con_frame, jp_rel)

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
        Jn, Jt1, Jt2 = Jc[:, 0], Jc[:, 1], Jc[:, 2]
        condim = m.pair_dim[con_pair]  # static numpy
        pyramid = condim >= 3

        facets = [
            Jn + mu1[:, None] * Jt1,
            Jn - mu1[:, None] * Jt1,
            Jn + mu2[:, None] * Jt2,
            Jn - mu2[:, None] * Jt2,
        ]
        pyr_mask = jnp.asarray(pyramid, dtype)
        fless_mask = jnp.asarray(~pyramid, dtype)
        iw_sum = (m.body_invweight0[jnp.asarray(b1)]
                  + m.body_invweight0[jnp.asarray(b2)])
        facet_mu = [mu1, mu1, mu2, mu2]
        for fi, Jf in enumerate(facets):
            # frictionless contacts contribute only through facet 0 as Jn
            if fi == 0:
                Jrow = Jf * pyr_mask[:, None] + Jn * fless_mask[:, None]
                row_scale = jnp.ones(ncon, dtype)
            else:
                Jrow = Jf * pyr_mask[:, None]
                row_scale = pyr_mask
            vel = Jrow @ d.qvel
            aref = (-b * vel - k * imp * pos) * row_scale
            rows_J.append(Jrow)
            rows_pos.append(pos)
            rows_aref.append(aref)
            rows_imp.append(jnp.where(row_scale > 0, imp, 1e-7))
            mu_f = facet_mu[fi]
            diag_pyr = iw_sum * 2.0 * (1.0 + mu_f * mu_f)
            rows_R.append(jnp.where(pyr_mask > 0, diag_pyr, iw_sum))

    if not rows_J:
        z = jnp.zeros((0,), dtype)
        return EfcSystem(jnp.zeros((0, nv), dtype), z, z, z, z,
                         con_dist, con_pos, con_frame, 0)

    J = jnp.concatenate(rows_J)
    pos = jnp.concatenate(rows_pos)
    aref = jnp.concatenate(rows_aref)
    imp = jnp.concatenate(rows_imp)
    diag_approx = jnp.concatenate(rows_R)

    # R = (1-d)/d * diagApprox
    R = jnp.maximum((1.0 - imp) / imp * jnp.maximum(diag_approx, 1e-12),
                    1e-10)
    return EfcSystem(J=J, aref=aref, R=R, D=1.0 / R, pos=pos,
                     con_dist=con_dist, con_pos=con_pos, con_frame=con_frame,
                     nefc=int(J.shape[0]))
