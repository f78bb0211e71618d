"""Velocity products: com-frame body velocities and bias forces.

mj_comVel + mj_rne(flg_acc=0) + mj_passive equivalents, level-parallel over
the kinematic tree.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vnl_tpu.math import spatial
from vnl_tpu.physics.model import Data, DisableBit, JointType, Model


def _levels(m: Model):
    depth = m.body_treeid
    return [np.nonzero(depth == d)[0].astype(np.int32)
            for d in range(1, int(depth.max()) + 1 if m.nbody > 1 else 1)]


def com_vel(m: Model, d: Data):
    """Body spatial velocities (com frame) and cdof time-derivatives.

    Within each body, dofs are applied in order: each dof's cdof_dot is the
    motion cross product of the velocity accumulated so far (ancestors plus
    preceding dofs of the same body) with its cdof — matching MuJoCo's
    sequential treatment of multi-dof bodies.
    """
    dtype = d.qpos.dtype
    cvel = jnp.zeros((m.nbody, 6), dtype)
    cdof_dot = jnp.zeros((m.nv, 6), dtype)

    # static per-dof slot metadata within each body:
    # - snapshot[s]: this slot starts a joint (or the rotation block of a
    #   free joint) => refresh the velocity snapshot used for cdof_dot
    # - freetrans[s]: free-joint translation dof => cdof_dot = 0
    jnt_nv = {0: 6, 1: 3, 2: 1, 3: 1}
    dof_slotflags = {}  # bodyid -> list of (dofid, snapshot, freetrans)
    for b in range(1, m.nbody):
        slots = []
        for j in range(m.body_jntadr[b], m.body_jntadr[b] + m.body_jntnum[b]):
            jt = int(m.jnt_type[j])
            for k in range(jnt_nv[jt]):
                dofid = int(m.jnt_dofadr[j]) + k
                if jt == int(JointType.FREE):
                    snapshot = k in (0, 3)
                    freetrans = k < 3
                else:
                    snapshot = k == 0
                    freetrans = False
                slots.append((dofid, snapshot, freetrans))
        dof_slotflags[b] = slots

    for level in _levels(m):
        bids = jnp.asarray(level)
        vel = cvel[jnp.asarray(m.body_parentid[level])]
        vel_snap = vel
        maxdof = int(m.body_dofnum[level].max()) if len(level) else 0
        for k in range(maxdof):
            has = m.body_dofnum[level] > k
            slots = [dof_slotflags[b][k] if m.body_dofnum[b] > k
                     else (0, False, False) for b in level]
            dids = jnp.asarray([s[0] for s in slots])
            snap = jnp.asarray([s[1] for s in slots], dtype=dtype)[:, None]
            ftrans = jnp.asarray([s[2] for s in slots], dtype=dtype)[:, None]
            hasj = jnp.asarray(has, dtype=dtype)[:, None]
            vel_snap = snap * vel + (1.0 - snap) * vel_snap
            cd = d.cdof[dids]
            dot = spatial.motion_cross(vel_snap, cd) * (1.0 - ftrans)
            cdof_dot = cdof_dot.at[dids].add(dot * hasj)
            vel = vel + cd * d.qvel[dids][:, None] * hasj
        cvel = cvel.at[bids].set(vel)

    return cvel, cdof_dot


def rne(m: Model, d: Data, cvel: jnp.ndarray, cdof_dot: jnp.ndarray):
    """Bias force C(q, qvel): gravity + velocity products (no applied acc)."""
    dtype = d.qpos.dtype
    grav = jnp.asarray(m.opt.gravity, dtype)
    if m.opt.disableflags & DisableBit.GRAVITY:
        grav = jnp.zeros(3, dtype)

    # body accelerations: start from -gravity, add velocity-product terms
    cacc = jnp.zeros((m.nbody, 6), dtype).at[0, 3:].set(-grav)
    for level in _levels(m):
        bids = jnp.asarray(level)
        acc = cacc[jnp.asarray(m.body_parentid[level])]
        maxdof = int(m.body_dofnum[level].max()) if len(level) else 0
        for k in range(maxdof):
            has = m.body_dofnum[level] > k
            dids = jnp.asarray(np.where(has, m.body_dofadr[level] + k, 0))
            hasj = jnp.asarray(has, dtype=dtype)[:, None]
            acc = acc + cdof_dot[dids] * d.qvel[dids][:, None] * hasj
        cacc = cacc.at[bids].set(acc)

    # f = I a + v x* (I v)
    Iv = jnp.einsum("bij,bj->bi", d.cinert, cvel)
    f = jnp.einsum("bij,bj->bi", d.cinert, cacc) + spatial.force_cross(cvel, Iv)

    # backward accumulate to parents
    for level in reversed(_levels(m)):
        parent = jnp.asarray(m.body_parentid[level])
        f = f.at[parent].add(f[jnp.asarray(level)])

    qfrc_bias = jnp.einsum("vi,vi->v", d.cdof, f[jnp.asarray(m.dof_bodyid)])
    return qfrc_bias


def passive(m: Model, d: Data) -> jnp.ndarray:
    """Joint spring/damper forces (mj_passive equivalent)."""
    dtype = d.qpos.dtype
    if m.opt.disableflags & DisableBit.PASSIVE:
        return jnp.zeros(m.nv, dtype)
    qfrc = -m.dof_damping * d.qvel
    # springs on hinge/slide joints: -k (qpos - springref)
    hs = np.isin(m.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE)))
    if hs.any():
        jids = np.nonzero(hs)[0]
        qadr = jnp.asarray(m.jnt_qposadr[jids])
        dadr = jnp.asarray(m.jnt_dofadr[jids])
        k = m.jnt_stiffness[jnp.asarray(jids)]
        frc = -k * (d.qpos[qadr] - m.qpos_spring[qadr])
        qfrc = qfrc.at[dadr].add(frc)
    return qfrc
