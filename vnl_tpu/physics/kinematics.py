"""Forward kinematics and com-frame quantities.

Level-parallel formulation: bodies are grouped by tree depth at trace time
(static metadata), so each depth level is one vectorized batch of quaternion
ops instead of a 65-iteration sequential scan — the tree serial chain is
only as long as the deepest path (~15 for the rodent), and everything
vmaps cleanly over env batches.

Covers mj_kinematics + mj_comPos (cf. mjx ``smooth.kinematics`` used by the
reference at /root/reference/preprocessing/mjx_preprocess.py:137-147).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu.physics.model import Data, JointType, Model


def _window_gather(x, adr: np.ndarray, offset: int, width: int):
    """x[adr+offset : adr+offset+width] per row, as `width` 1-D gathers."""
    cols = [x[jnp.asarray(adr + offset + i)] for i in range(width)]
    return jnp.stack(cols, axis=-1)


def _levels(m: Model) -> List[np.ndarray]:
    """Static body-id groups by depth (excluding world)."""
    depth = m.body_treeid
    out = []
    for d in range(1, int(depth.max()) + 1 if m.nbody > 1 else 1):
        out.append(np.nonzero(depth == d)[0].astype(np.int32))
    return out


def kinematics(m: Model, d: Data) -> Data:
    """Computes xpos/xquat/xmat, joint anchors/axes, geom/site poses."""
    qpos = d.qpos
    dtype = qpos.dtype
    nb = m.nbody

    xpos = jnp.zeros((nb, 3), dtype)
    xquat = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)
    xanchor = jnp.zeros((m.njnt, 3), dtype)
    xaxis = jnp.asarray(m.jnt_axis, dtype)

    for level in _levels(m):
        bids = jnp.asarray(level)
        parent = jnp.asarray(m.body_parentid[level])
        p_pos = xpos[parent]
        p_quat = xquat[parent]
        # frame from parent + fixed body offset
        pos = p_pos + vmath.quat_rotate(p_quat, m.body_pos[bids])
        quat = vmath.quat_mul(p_quat, m.body_quat[bids])

        # Apply this level's joints slot-by-slot (bodies may have several
        # joints).  Each slot computes candidate updates for EVERY level
        # body under every joint type and merges them with static masks —
        # no pos/quat scatters.  (A previous formulation using masked
        # .at[idx].set updates was miscompiled by XLA:CPU for levels mixing
        # ball and hinge joints; see tests/test_physics_property.py.)
        max_jnts = int(m.body_jntnum[level].max()) if len(level) else 0
        for k in range(max_jnts):
            has = m.body_jntnum[level] > k
            jids = np.where(has, m.body_jntadr[level] + k, 0)
            jt = m.jnt_type[jids]  # static per body
            jadr = m.jnt_qposadr[jids]
            jids_j = jnp.asarray(jids)
            jadr_j = jnp.asarray(jadr)

            jpos_l = m.jnt_pos[jids_j]
            jaxis_l = m.jnt_axis[jids_j]
            anchor = pos + vmath.quat_rotate(quat, jpos_l)
            world_axis = vmath.quat_rotate(quat, jaxis_l)

            # record anchors/axes at application time for present joints
            rec = has & (jt != int(JointType.FREE))
            if rec.any():
                ridx = np.nonzero(rec)[0]
                xanchor = xanchor.at[jnp.asarray(jids[ridx])].set(anchor[ridx])
                xaxis = xaxis.at[jnp.asarray(jids[ridx])].set(
                    world_axis[ridx])

            # candidate updates per joint type (garbage lanes masked below)
            ref = m.qpos0[jadr_j]
            scalar = qpos[jadr_j] - ref
            qj_h = vmath.axis_angle_to_quat(jaxis_l, scalar)
            q_hinge = vmath.quat_mul(quat, qj_h)
            p_hinge = anchor - vmath.quat_rotate(q_hinge, jpos_l)
            p_slide = pos + world_axis * scalar[..., None]
            qj_b = vmath.normalize(_window_gather(qpos, jadr, 0, 4))
            q_ball = vmath.quat_mul(quat, qj_b)
            p_ball = anchor - vmath.quat_rotate(q_ball, jpos_l)
            p_free = _window_gather(qpos, jadr, 0, 3)
            q_free = vmath.normalize(_window_gather(qpos, jadr, 3, 4))

            def mask(t):
                sel = (jt == int(t)) & has
                return jnp.asarray(sel)[:, None]

            quat = jnp.where(mask(JointType.HINGE), q_hinge,
                    jnp.where(mask(JointType.BALL), q_ball,
                     jnp.where(mask(JointType.FREE), q_free, quat)))
            pos = jnp.where(mask(JointType.HINGE), p_hinge,
                   jnp.where(mask(JointType.SLIDE), p_slide,
                    jnp.where(mask(JointType.BALL), p_ball,
                     jnp.where(mask(JointType.FREE), p_free, pos))))
        xpos = xpos.at[bids].set(pos)
        xquat = xquat.at[bids].set(quat)

    # free-joint anchors: the body frame origin
    free_j = np.nonzero(m.jnt_type == int(JointType.FREE))[0]
    if len(free_j):
        fj = jnp.asarray(free_j)
        xanchor = xanchor.at[fj].set(xpos[jnp.asarray(m.jnt_bodyid[free_j])])

    xmat = vmath.quat_to_mat(xquat)
    xipos = xpos + vmath.quat_rotate(xquat, m.body_ipos)

    gb = jnp.asarray(m.geom_bodyid)
    geom_xpos = xpos[gb] + vmath.quat_rotate(xquat[gb], m.geom_pos)
    geom_xmat = vmath.quat_to_mat(vmath.quat_mul(xquat[gb], m.geom_quat))

    return d.replace(
        xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
        xanchor=xanchor, xaxis=xaxis,
        geom_xpos=geom_xpos, geom_xmat=geom_xmat,
    )


def com_pos(m: Model, d: Data) -> Data:
    """Subtree com, com-frame spatial inertias (cinert) and dof axes (cdof).

    Like mj_comPos: all quantities are expressed in the world-aligned frame
    centered at the subtree com of each body's kinematic root.
    """
    dtype = d.qpos.dtype
    mass = m.body_mass
    # subtree com as ONE mask matmul (body_subtree_mask is static)
    sub_mask = jnp.asarray(m.body_subtree_mask, dtype)
    sub_sum = sub_mask @ (mass[:, None] * d.xipos)
    sub_m = sub_mask @ mass
    subtree_com = sub_sum / jnp.maximum(sub_m, 1e-12)[:, None]

    # common origin per body: subtree com of its root body
    root = jnp.asarray(m.body_rootid)
    origin = subtree_com[root]  # (nbody, 3)

    # body spatial inertia about origin
    from vnl_tpu.math import spatial
    iq = vmath.quat_mul(d.xquat, m.body_iquat)
    irot = vmath.quat_to_mat(iq)
    cinert = spatial.inertia_at_point(mass, m.body_inertia, irot, d.xipos, origin)

    # cdof: motion axes about the same origin, fully vectorized over dofs.
    # Static per-dof metadata (numpy, resolved at trace time):
    njnt_nv = {int(JointType.FREE): 6, int(JointType.BALL): 3,
               int(JointType.SLIDE): 1, int(JointType.HINGE): 1}
    dof_jnt = m.dof_jntid            # (nv,)
    dof_body = m.dof_bodyid          # (nv,)
    dof_sub = np.zeros(m.nv, dtype=np.int32)  # index within joint
    for j in range(m.njnt):
        n = njnt_nv[int(m.jnt_type[j])]
        dof_sub[m.jnt_dofadr[j]:m.jnt_dofadr[j] + n] = np.arange(n)
    jt_per_dof = m.jnt_type[dof_jnt]
    is_free_t = (jt_per_dof == int(JointType.FREE)) & (dof_sub < 3)
    is_local_rot = ((jt_per_dof == int(JointType.BALL))
                    | ((jt_per_dof == int(JointType.FREE)) & (dof_sub >= 3)))
    is_hinge = jt_per_dof == int(JointType.HINGE)
    is_slide = jt_per_dof == int(JointType.SLIDE)
    axis_idx = np.where((jt_per_dof == int(JointType.FREE)) & (dof_sub >= 3),
                        dof_sub - 3, dof_sub).clip(0, 2)

    dj = jnp.asarray(dof_jnt)
    db = jnp.asarray(dof_body)
    org_d = origin[db]                       # (nv, 3)
    anchor_d = d.xanchor[dj]                 # (nv, 3)
    eye_rows = jnp.eye(3, dtype=dtype)[jnp.asarray(axis_idx)]  # (nv, 3)
    # body-local axes for free-rotation/ball dofs: columns of xmat
    local_axes = d.xmat[db][jnp.arange(m.nv), :, jnp.asarray(axis_idx)]
    hinge_axes = d.xaxis[dj]

    w = jnp.where(jnp.asarray(is_hinge)[:, None], hinge_axes,
                  jnp.where(jnp.asarray(is_local_rot)[:, None], local_axes,
                            jnp.zeros((m.nv, 3), dtype)))
    lin_rot = jnp.cross(w, org_d - anchor_d)
    lin = jnp.where(jnp.asarray(is_free_t)[:, None], eye_rows,
                    jnp.where(jnp.asarray(is_slide)[:, None], hinge_axes,
                              lin_rot))
    cdof = jnp.concatenate([w, lin], axis=-1)

    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)
