"""Pallas TPU megakernel: the whole position stage in one launch.

Covers kinematics + com_pos + CRB mass-matrix assembly (physics/
kinematics.py, physics/inertia.py): from qpos to xpos/xquat/xmat/xipos,
joint anchors/axes, geom poses, subtree com, com-frame spatial inertias,
cdof and the dense qM — everything mj_kinematics/mj_comPos/mj_crb produce
(cf. mjx ``smooth.kinematics``/``smooth.crb``) without writing a single
intermediate to HBM.  Before this kernel the three stages were ~5.6 ms of
a 6.8 ms substep at B=1024, nearly all of it HBM round-trips between
~400 tiny XLA ops (tools/ablate_step.py).

Layout: batch rides the 128-lane minor dimension; every per-body /
per-joint / per-dof quantity is a separate (N, L) value ("component
arrays"), so quaternion algebra is plain VPU math and every tree gather
(pointer-doubling jumps, body->dof maps, subtree sums) is a static one-hot
or mask matmul on the MXU — the same formulation the XLA path uses
(physics/kinematics.py docstring), but fused.  Large static tables are
passed as kernel inputs (not embedded constants); small per-row tables
ride along as compile-time constants.

The kernel is exact f32 (HIGHEST matmul precision); its ground truth and
unbatched fallback is the XLA pipeline itself via custom_vmap.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

# Lane-block width: envs per kernel instance.  The kernel body is written
# in terms of L = qpos.shape[-1], so any multiple of 128 works; wider blocks
# amortize per-op issue overhead across more lanes at the cost of VMEM
# (the qM output block is (nv, nv, _BLOCK) — 2.7 MB at 128 for the rodent).
_BLOCK = int(os.environ.get("VNL_TPU_POSITION_BLOCK", "128"))
if _BLOCK <= 0 or _BLOCK % 128 != 0:
    raise ValueError(
        f"VNL_TPU_POSITION_BLOCK={_BLOCK} must be a positive multiple of "
        "128 (the TPU lane width; the kernel packs batch into lanes)")
_MIN_FUSED_BATCH = 128

# static tables passed as kernel inputs; pallas forbids captured array
# constants, so the small per-row tables are packed into grouped matrices
_BIG = ("jump_oh", "final_oh", "pre_oh", "e_scalar", "e_w", "sub_mask",
        "root_oh", "geom_oh", "dof_body_oh", "dof_jnt_oh", "jnt_body_oh",
        "mask_l", "mask_u")
_PACK = {
    "c_nj": ("jnt_axis", "jnt_pos", "m_hinge", "m_ball", "m_free",
             "m_slide", "qpos0_j"),
    "c_off": ("body_pos", "body_quat"),
    "c_nb": ("body_ipos", "body_iquat", "body_inertia", "mass",
             "sub_m_inv"),
    "c_geom": ("geom_pos", "geom_quat"),
    "c_nv": ("m_dof_freet", "m_dof_lrot", "m_dof_hinge", "m_dof_slide",
             "m_axis", "eye_rows", "armature", "hB"),
}


def _pack(st):
    """Packs small per-row tables into one matrix per group; returns
    (packed arrays dict, column map name -> (group, start))."""
    packed, colmap = {}, {}
    for group, names in _PACK.items():
        cols = []
        off = 0
        for n in names:
            a = np.asarray(st[n], np.float32)
            if a.ndim == 3:  # (k, N, 1) stacks -> k columns
                a = np.concatenate([a[i] for i in range(a.shape[0])], axis=1)
            colmap[n] = (group, off)
            cols.append(a)
            off += a.shape[1]
        packed[group] = np.concatenate(cols, axis=1)
    return packed, colmap


def enabled() -> bool:
    v = os.environ.get("VNL_TPU_FUSED_POSITION")
    if v is not None:
        return v not in ("0", "false", "")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# component-array quaternion algebra: quats are 4-tuples, vecs 3-tuples of
# (N, L) arrays
# ---------------------------------------------------------------------------

def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qrot(q, v):
    """Rotate v by quaternion q: v + 2 w (u x v) + 2 u x (u x v)."""
    w, x, y, z = q
    vx, vy, vz = v
    tx = y * vz - z * vy
    ty = z * vx - x * vz
    tz = x * vy - y * vx
    sx = y * tz - z * ty
    sy = z * tx - x * tz
    sz = x * ty - y * tx
    return (vx + 2.0 * (w * tx + sx),
            vy + 2.0 * (w * ty + sy),
            vz + 2.0 * (w * tz + sz))


def _qnormalize(q):
    w, x, y, z = q
    r = jax.lax.rsqrt(w * w + x * x + y * y + z * z + 1e-30)
    return (w * r, x * r, y * r, z * r)


def _q2mat(q):
    """Quaternion -> row-major 9-tuple of rotation-matrix components."""
    w, x, y, z = q
    return (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y))


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _statics(m):
    """All static (numpy) tables the kernel needs."""
    from vnl_tpu.physics.kinematics import _node_graph
    from vnl_tpu.physics.model import JointType

    nb, nj, nv, nq, ngeom = m.nbody, m.njnt, m.nv, m.nq, m.ngeom
    jumps, final_node, pre_node = _node_graph(m)
    Nn = len(jumps[0])

    def onehot(rows, idx, cols):
        out = np.zeros((rows, cols), np.float32)
        out[np.arange(rows), np.asarray(idx)] = 1.0
        return out

    jadr = np.asarray(m.jnt_qposadr)
    jt = np.asarray(m.jnt_type)
    e_scalar = onehot(nj, jadr, nq)
    e_w = np.stack([onehot(nj, np.clip(jadr + o, 0, nq - 1), nq)
                    for o in range(7)])

    def jmask(t):
        return (jt == int(t)).astype(np.float32)[:, None]

    dof_body = np.asarray(m.dof_bodyid)
    dof_jnt = np.asarray(m.dof_jntid)
    njnt_nv = {int(JointType.FREE): 6, int(JointType.BALL): 3,
               int(JointType.SLIDE): 1, int(JointType.HINGE): 1}
    dof_sub = np.zeros(nv, np.int32)
    for j in range(nj):
        n = njnt_nv[int(jt[j])]
        dof_sub[m.jnt_dofadr[j]:m.jnt_dofadr[j] + n] = np.arange(n)
    jt_dof = jt[dof_jnt]
    is_free_t = ((jt_dof == int(JointType.FREE)) & (dof_sub < 3))
    is_local_rot = ((jt_dof == int(JointType.BALL))
                    | ((jt_dof == int(JointType.FREE)) & (dof_sub >= 3)))
    axis_idx = np.where((jt_dof == int(JointType.FREE)) & (dof_sub >= 3),
                        dof_sub - 3, dof_sub).clip(0, 2)

    f32 = np.float32
    mass = np.asarray(m.body_mass, f32)
    sub_mask = np.asarray(m.body_subtree_mask, f32)
    sub_m = np.maximum(sub_mask @ mass, 1e-12)[:, None]
    mask_l = np.asarray(m.dof_ancestor_mask, f32)

    return dict(
        dims=(nb, nj, nv, nq, ngeom, Nn, len(jumps)),
        jump_oh=np.stack([onehot(Nn, j, Nn) for j in jumps]),
        final_oh=onehot(nb, final_node, Nn),
        pre_oh=onehot(nj, pre_node, Nn),
        e_scalar=e_scalar, e_w=e_w,
        qpos0_j=(e_scalar @ np.asarray(m.qpos0, f32))[:, None],
        jnt_axis=np.asarray(m.jnt_axis, f32),
        jnt_pos=np.asarray(m.jnt_pos, f32),
        m_hinge=jmask(JointType.HINGE), m_ball=jmask(JointType.BALL),
        m_free=jmask(JointType.FREE), m_slide=jmask(JointType.SLIDE),
        body_pos=np.asarray(m.body_pos, f32)[1:],
        body_quat=np.asarray(m.body_quat, f32)[1:],
        body_ipos=np.asarray(m.body_ipos, f32),
        body_iquat=np.asarray(m.body_iquat, f32),
        body_inertia=np.asarray(m.body_inertia, f32),
        mass=mass[:, None], sub_mask=sub_mask, sub_m_inv=1.0 / sub_m,
        root_oh=onehot(nb, np.asarray(m.body_rootid), nb),
        geom_oh=onehot(ngeom, np.asarray(m.geom_bodyid), nb),
        geom_pos=np.asarray(m.geom_pos, f32),
        geom_quat=np.asarray(m.geom_quat, f32),
        dof_body_oh=onehot(nv, dof_body, nb),
        dof_jnt_oh=onehot(nv, dof_jnt, nj),
        jnt_body_oh=onehot(nj, np.asarray(m.jnt_bodyid), nb),
        m_dof_freet=is_free_t.astype(f32)[:, None],
        m_dof_lrot=is_local_rot.astype(f32)[:, None],
        m_dof_hinge=(jt_dof == int(JointType.HINGE)).astype(f32)[:, None],
        m_dof_slide=(jt_dof == int(JointType.SLIDE)).astype(f32)[:, None],
        m_axis=np.stack([(axis_idx == a).astype(f32)[:, None]
                         for a in range(3)]),
        eye_rows=np.eye(3, dtype=f32)[axis_idx],
        mask_l=mask_l, mask_u=mask_l.T.copy(),
        armature=np.asarray(m.dof_armature, f32)[:, None],
        hB=np.asarray(m.opt.timestep * np.asarray(m.dof_damping),
                      f32)[:, None],
    )


def _position_kernel(st, colmap, damped, cap, qpos_ref, *refs):
    """Kernel body.  ``cap`` (perf-bisect only, via make_position_fused
    stage_cap) truncates the computation after stage ``cap`` and zero-fills
    the remaining outputs: 0 = FK through extraction, 1 = +geoms/subtree
    com, 2 = +cinert, 3 = +crb/cdof, 4 = +qM assembly, 5 = +qMinv sweep,
    6 = full (both sweeps).  Production always runs with cap=None (=6)."""
    nb, nj, nv, nq, ngeom, Nn, n_rounds = st["dims"]
    big = dict(zip(_BIG, refs[:len(_BIG)]))
    groups = dict(zip(_PACK, refs[len(_BIG):len(_BIG) + len(_PACK)]))
    (xpos_ref, xquat_ref, xmat_ref, xipos_ref, xanchor_ref, xaxis_ref,
     gxpos_ref, gxmat_ref, scom_ref, cinert_ref, cdof_ref, qM_ref,
     *inv_refs) = refs[len(_BIG) + len(_PACK):]

    f32 = jnp.float32
    qpos = qpos_ref[:]
    L = qpos.shape[-1]

    def T(name, idx=None):
        """Big static table input ref."""
        r = big[name]
        return r[idx] if idx is not None else r[:]

    def mm(table, b, idx=None):
        # (round-5 probe: a 3-pass bf16-split variant of this — exact for
        # these 0/1 tables — measured SLOWER than HIGHEST, +0.17 ms on the
        # FK front-end.  The front-end cost is not matmul passes.)
        return jnp.dot(T(table, idx) if isinstance(table, str) else table,
                       b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    def cvec(name, col=0):
        """One column of a packed per-row table, as (N, 1)."""
        g, start = colmap[name]
        return groups[g][:, start + col:start + col + 1]

    # ---- joint local transforms ----
    scalar = mm("e_scalar", qpos) - cvec("qpos0_j")
    half = 0.5 * scalar
    c, s = jnp.cos(half), jnp.sin(half)
    ax = [cvec("jnt_axis", k) for k in range(3)]
    q_hinge = (c, ax[0] * s, ax[1] * s, ax[2] * s)
    win = [mm("e_w", qpos, o) for o in range(7)]
    q_ball = _qnormalize((win[0], win[1], win[2], win[3]))
    q_free = _qnormalize((win[3], win[4], win[5], win[6]))

    mh = cvec("m_hinge")
    mb = cvec("m_ball")
    mf = cvec("m_free")
    ms = cvec("m_slide")
    unit_w = jnp.ones((nj, L), f32)
    zero = jnp.zeros((nj, L), f32)
    unit = (unit_w, zero, zero, zero)
    q_loc = tuple(mh * h + mb * bq + mf * fq + (1 - mh - mb - mf) * u
                  for h, bq, fq, u in zip(q_hinge, q_ball, q_free, unit))
    jp = tuple(cvec("jnt_pos", k) * unit_w for k in range(3))
    rot_jp = _qrot(q_loc, jp)
    p_rot = tuple(a - b for a, b in zip(jp, rot_jp))
    p_slide = tuple(a * scalar for a in ax)
    p_free = (win[0], win[1], win[2])
    p_loc = tuple(ms * sl + mf * fr + (1 - ms - mf) * pr
                  for sl, fr, pr in zip(p_slide, p_free, p_rot))

    # ---- node arrays: [offsets | joints | sentinel] ----
    ones1 = jnp.ones((1, L), f32)
    zeros1 = jnp.zeros((1, L), f32)

    def cat(body_col, jcomp, sent):
        body = jnp.broadcast_to(body_col, (nb - 1, L))
        return jnp.concatenate([body, jcomp, sent], axis=0)

    node_q = tuple(cat(cvec("body_quat", k), q_loc[k],
                       ones1 if k == 0 else zeros1) for k in range(4))
    node_p = tuple(cat(cvec("body_pos", k), p_loc[k], zeros1)
                   for k in range(3))

    # ---- pointer-doubling composition ----
    # (round-5 probe: lane-stacking the 7 components into ONE wide matmul
    # per round — shared one-hot LHS — measured SLOWER, +0.14 ms on the FK
    # front-end: the lane-axis concats cost more than the per-dot issue
    # they save.  Keep the per-component dots.)
    for r in range(n_rounds):
        aq = tuple(mm("jump_oh", cmp, r) for cmp in node_q)
        ap = tuple(mm("jump_oh", cmp, r) for cmp in node_p)
        node_p = tuple(a + b for a, b in zip(ap, _qrot(aq, node_p)))
        node_q = _qmul(aq, node_q)
    node_q = _qnormalize(node_q)

    # ---- extraction ----
    xquat = tuple(mm("final_oh", cmp) for cmp in node_q)
    xpos = tuple(mm("final_oh", cmp) for cmp in node_p)
    pq = tuple(mm("pre_oh", cmp) for cmp in node_q)
    pp = tuple(mm("pre_oh", cmp) for cmp in node_p)
    anchor = tuple(a + b for a, b in zip(pp, _qrot(pq, jp)))
    axis_w = _qrot(pq, tuple(a * unit_w for a in ax))
    jb_xpos = tuple(mm("jnt_body_oh", cmp) for cmp in xpos)
    xanchor = tuple(mf * fb + (1 - mf) * an
                    for fb, an in zip(jb_xpos, anchor))
    xaxis = tuple(mf * (a * unit_w) + (1 - mf) * aw
                  for a, aw in zip(ax, axis_w))

    xmat = _q2mat(xquat)
    ipos = tuple(cvec("body_ipos", k) for k in range(3))
    xipos = tuple(a + b for a, b in zip(xpos, _qrot(xquat, ipos)))

    run = (lambda s: cap is None or cap >= s)  # perf-bisect stage gate
    zero_b = jnp.zeros((nb, L), f32)
    zero_g = jnp.zeros((ngeom, L), f32)
    zero_v = jnp.zeros((nv, L), f32)
    massc = cvec("mass")

    if run(1):
        # geoms
        gq4 = tuple(mm("geom_oh", cmp) for cmp in xquat)
        gp3 = tuple(mm("geom_oh", cmp) for cmp in xpos)
        gpos_l = tuple(cvec("geom_pos", k) for k in range(3))
        gquat_l = tuple(cvec("geom_quat", k) for k in range(4))
        gxpos = tuple(a + b for a, b in zip(gp3, _qrot(gq4, gpos_l)))
        gxmat = _q2mat(_qmul(gq4, gquat_l))

        # subtree com / per-body origin
        scom = tuple(mm("sub_mask", massc * cmp)
                     * cvec("sub_m_inv") for cmp in xipos)
        origin = tuple(mm("root_oh", cmp) for cmp in scom)
    else:
        gxpos, gxmat = (zero_g,) * 3, (zero_g,) * 9
        scom, origin = (zero_b,) * 3, (zero_b,) * 3

    if run(2):
        # ---- cinert: spatial inertia of each body about its origin ----
        iq = _qmul(xquat, tuple(cvec("body_iquat", k) for k in range(4)))
        R = _q2mat(iq)
        Id = [cvec("body_inertia", k) for k in range(3)]

        def IC(i, j):
            return (R[3 * i] * Id[0] * R[3 * j]
                    + R[3 * i + 1] * Id[1] * R[3 * j + 1]
                    + R[3 * i + 2] * Id[2] * R[3 * j + 2])

        cvs = tuple(a - b for a, b in zip(xipos, origin))
        cdot = cvs[0] * cvs[0] + cvs[1] * cvs[1] + cvs[2] * cvs[2]
        eps = {(0, 1): -cvs[2], (0, 2): cvs[1], (1, 0): cvs[2],
               (1, 2): -cvs[0], (2, 0): -cvs[1], (2, 1): cvs[0]}

        cin = {}
        for i in range(3):
            for j in range(3):
                # top-left: IC + m*(cx cx^T) = IC + m*((c.c)I - c c^T)
                d = cdot if i == j else 0.0
                cin[(i, j)] = IC(i, j) + massc * (d - cvs[i] * cvs[j])
                tr = eps.get((i, j))
                cin[(i, j + 3)] = massc * tr if tr is not None else zero_b
                cin[(j + 3, i)] = cin[(i, j + 3)]
                cin[(i + 3, j + 3)] = (massc * jnp.ones((nb, L), f32)
                                       if i == j else zero_b)
    else:
        cin = {(i, j): zero_b for i in range(6) for j in range(6)}

    if run(3):
        # ---- crb subtree sums + qM assembly ----
        crb = {k: mm("sub_mask", v) for k, v in cin.items()}

        # cdof
        anchor_d = tuple(mm("dof_jnt_oh", cmp) for cmp in xanchor)
        hinge_ax = tuple(mm("dof_jnt_oh", cmp) for cmp in xaxis)
        org_d = tuple(mm("dof_body_oh", cmp) for cmp in origin)
        local_ax = []
        for i in range(3):
            acc = jnp.zeros((nv, L), f32)
            for a in range(3):
                acc = acc + cvec("m_axis", a) * mm(
                    "dof_body_oh", xmat[3 * i + a])
            local_ax.append(acc)
        mdh = cvec("m_dof_hinge")
        mdl = cvec("m_dof_lrot")
        mdf = cvec("m_dof_freet")
        mds = cvec("m_dof_slide")
        w = tuple(mdh * h + mdl * l for h, l in zip(hinge_ax, local_ax))
        rel = tuple(o - a for o, a in zip(org_d, anchor_d))
        lin_rot = _cross(w, rel)
        eye_r = [cvec("eye_rows", k) for k in range(3)]
        lin = tuple(mdf * e + mds * h + (1 - mdf - mds) * lr
                    for e, h, lr in zip(eye_r, hinge_ax, lin_rot))
        cdof6 = w + lin

        # F_i = crb[body(dof)] row i . cdof
        Fc = []
        for i in range(6):
            acc = jnp.zeros((nv, L), f32)
            for j in range(6):
                acc = acc + mm("dof_body_oh", crb[(i, j)]) * cdof6[j]
            Fc.append(acc)
    else:
        cdof6 = (zero_v,) * 6
        Fc = [zero_v] * 6

    if run(4):
        # qM = maskL.(F ox cdof) + maskU.(cdof ox F) - diag corr + armature
        maskL = T("mask_l")[:, :, None]
        maskU = T("mask_u")[:, :, None]
        low = jnp.zeros((nv, nv, L), f32)
        up = jnp.zeros((nv, nv, L), f32)
        for k in range(6):
            low = low + Fc[k][:, None, :] * cdof6[k][None, :, :]
            up = up + cdof6[k][:, None, :] * Fc[k][None, :, :]
        # i==j  <=>  i ancestor-or-self of j AND j ancestor-or-self of i
        diag_c = (T("mask_l") * T("mask_u"))[:, :, None]
        arm = cvec("armature")[:, 0][:, None, None]
        qM = maskL * low + maskU * up + diag_c * (arm - low)
    else:
        qM = jnp.zeros((nv, nv, L), f32)
    qM_ref[:] = qM

    # ---- fused mass-matrix inverse(s): in-VMEM symmetric sweep ----------
    # Same Gauss-Jordan sweep as ops/pallas_linalg._sweep_kernel, run here
    # so qMinv (and the implicit-damping (M + h diag(B))^-1 when the model
    # is damped) come out of the SAME launch — no qM HBM round-trip, no
    # lanes<->batch transposes, no second kernel (round-4: the separate
    # stacked sweep was +0.9 ms/substep at B=1024).
    eye2 = (jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
            ).astype(f32)

    def sweep_into(ref, A):
        # (round-5 probe: a blocked rank-8 principal-pivot-transform
        # variant — one full-matrix RMW per 8 pivots — measured SLOWER
        # (+0.29 ms over both sweeps): the cost is the (nv,nv,L) FMA
        # passes themselves, which blocking cannot reduce, and the
        # blocked form adds temporary traffic.)
        #
        # Jacobi scaling A~ = S A S cuts the condition number the sweep
        # sees (diag extracted by a MAJOR-axis reduction — Mosaic rejects
        # sublane-axis reductions feeding consumers)
        diag = jnp.sum(A * eye2, axis=0)                      # (nv, L)
        s = jax.lax.rsqrt(jnp.maximum(diag, 1e-30))
        ref[:] = A * s[:, None, :] * s[None, :, :]

        def body(k, carry):
            col = ref[:, pl.ds(k, 1), :]                      # (nv, 1, L)
            row = ref[pl.ds(k, 1), :, :]                      # (1, nv, L)
            dkk = ref[pl.ds(k, 1), pl.ds(k, 1), :]            # (1, 1, L)
            dinv = 1.0 / dkk
            ei = (jax.lax.broadcasted_iota(jnp.int32, (nv, 1, 1), 0)
                  == k).astype(f32)
            ej = (jax.lax.broadcasted_iota(jnp.int32, (1, nv, 1), 1)
                  == k).astype(f32)
            v = col - ei
            w_ = (row - ej) * dinv
            ref[:] = ref[:] - v * w_
            # the rank-1 form over-counts the pivot by exactly 2
            ref[pl.ds(k, 1), pl.ds(k, 1), :] = (
                ref[pl.ds(k, 1), pl.ds(k, 1), :] - 2.0)
            return carry

        jax.lax.fori_loop(0, nv, body, jnp.int32(0))
        ref[:] = -ref[:] * s[:, None, :] * s[None, :, :]

    if inv_refs:
        if run(5):
            sweep_into(inv_refs[0], qM)
        else:
            inv_refs[0][:] = jnp.zeros_like(inv_refs[0])
        if damped:
            if run(6):
                hb = cvec("hB")[:, 0][:, None, None]
                sweep_into(inv_refs[1], qM + eye2 * hb)
            else:
                inv_refs[1][:] = jnp.zeros_like(inv_refs[1])

    # ---- write component outputs ----
    for k in range(3):
        xpos_ref[:, k, :] = xpos[k]
        xipos_ref[:, k, :] = xipos[k]
        xanchor_ref[:, k, :] = xanchor[k]
        xaxis_ref[:, k, :] = xaxis[k]
        gxpos_ref[:, k, :] = gxpos[k]
        scom_ref[:, k, :] = scom[k]
    for k in range(4):
        xquat_ref[:, k, :] = xquat[k]
    for k in range(9):
        xmat_ref[:, k, :] = xmat[k]
        gxmat_ref[:, k, :] = gxmat[k]
    for i in range(6):
        for j in range(6):
            cinert_ref[:, 6 * i + j, :] = cin[(i, j)]
    for k in range(6):
        cdof_ref[:, k, :] = cdof6[k]


_CACHE: dict = {}


def make_position_fused(m, reference_fn, interpret: bool = False,
                        stage_cap: int | None = None):
    """Builds the fused position stage for one model.

    Per-env signature: qpos (nq,) -> (xpos (nb,3), xquat (nb,4),
    xmat (nb,3,3), xipos (nb,3), xanchor (njnt,3), xaxis (njnt,3),
    geom_xpos (ngeom,3), geom_xmat (ngeom,3,3), subtree_com (nb,3),
    cinert (nb,6,6), cdof (nv,6), qM (nv,nv), qMinv (nv,nv)
    [, qMhBinv (nv,nv) when the model needs implicit damping]).
    reference_fn: the per-env XLA pipeline with the same signature (also
    the unbatched/CPU fallback and test oracle).
    """
    key = (id(m), interpret, stage_cap)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[1]

    from vnl_tpu.physics.inertia import _needs_implicit_damping
    damped = _needs_implicit_damping(m)

    st = _statics(m)
    nb, nj, nv, nq, ngeom, _, _ = st["dims"]
    packed, colmap = _pack(st)
    kernel = functools.partial(_position_kernel, st, colmap, damped,
                               stage_cap)
    # keep numpy here: make_position_fused is typically first called
    # INSIDE a jit trace, and any jax conversion there creates tracers that
    # must not be cached across traces (convert per call in lanes_call).
    # (Round-3 probe: device_put-ing these at build time changed kernel
    # time by 0 — constant upload is NOT part of the 0.9 ms cost — and
    # leaked tracers into the cache when the build happened under a trace.)
    big_arrays = ([np.asarray(st[k], np.float32) for k in _BIG]
                  + [np.asarray(packed[g], np.float32) for g in _PACK])

    out_defs = [
        ((nb, 3), (nb, 3)), ((nb, 4), (nb, 4)), ((nb, 9), (nb, 3, 3)),
        ((nb, 3), (nb, 3)), ((nj, 3), (nj, 3)), ((nj, 3), (nj, 3)),
        ((ngeom, 3), (ngeom, 3)), ((ngeom, 9), (ngeom, 3, 3)),
        ((nb, 3), (nb, 3)), ((nb, 36), (nb, 6, 6)), ((nv, 6), (nv, 6)),
        ((nv, nv), (nv, nv)),
        # fused mass-matrix inverses: qMinv, plus (M + h diag(B))^-1 for
        # damped models (see _position_kernel.sweep_into)
        ((nv, nv), (nv, nv)),
    ] + ([((nv, nv), (nv, nv))] if damped else [])

    def lanes_call(qpos_l):
        b = qpos_l.shape[-1]
        grid = (b // _BLOCK,)
        vmem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None

        def spec(*shape):
            return pl.BlockSpec(shape + (_BLOCK,),
                                (lambda i: (0,) * len(shape) + (i,)),
                                memory_space=vmem)

        def cspec(shape):
            return pl.BlockSpec(shape, (lambda i: (0,) * len(shape)),
                                memory_space=vmem)

        params = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                  if (_HAS_PLTPU and not interpret) else None)
        return pl.pallas_call(
            kernel,
            grid=grid,
            compiler_params=params,
            out_shape=[jax.ShapeDtypeStruct(s + (b,), jnp.float32)
                       for s, _ in out_defs],
            in_specs=[spec(nq)] + [cspec(a.shape) for a in big_arrays],
            out_specs=[spec(*s) for s, _ in out_defs],
            interpret=interpret,
        )(qpos_l, *[jnp.asarray(a) for a in big_arrays])

    @custom_batching.custom_vmap
    def position_fused(qpos):
        return reference_fn(qpos)

    @position_fused.def_vmap
    def _rule(axis_size, in_batched, qpos):
        del in_batched
        b = axis_size
        use_pallas = interpret or (
            _HAS_PLTPU and jax.default_backend() == "tpu"
            and b >= _MIN_FUSED_BATCH)
        if not use_pallas:
            return jax.vmap(position_fused)(qpos), tuple(
                True for _ in out_defs)
        pad = (-b) % _BLOCK
        q = jnp.transpose(qpos, (1, 0))
        if pad:
            q = jnp.pad(q, [(0, 0), (0, pad)])
        outs = lanes_call(q)
        final = []
        for (sh, full), o in zip(out_defs, outs):
            o = jnp.moveaxis(o, -1, 0)[:b]
            final.append(o.reshape((b,) + full))
        return tuple(final), tuple(True for _ in out_defs)

    # hold m in the entry: the key uses id(m), and a recycled id after GC
    # would otherwise silently serve a kernel built from different tables
    _CACHE[key] = (m, position_fused)
    return position_fused
