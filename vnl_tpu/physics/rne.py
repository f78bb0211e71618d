"""Velocity products: com-frame body velocities and bias forces.

mj_comVel + mj_rne(flg_acc=0) + mj_passive equivalents.  TPU-first: every
prefix/suffix sum along the kinematic tree is a single matmul against a
static ancestry mask (body_chain_dof_mask / dof_prefix_mask /
body_subtree_mask), so the whole velocity stage is a handful of batched
matmuls + crossproducts with no per-level scatters.

The per-joint velocity-snapshot rule for cdof_dot (free-joint rotations see
the post-translation velocity; free translations have constant axes) is
encoded statically in dof_prefix_mask at compile time and validated against
the oracle's d.cdof_dot in tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vnl_tpu.math import spatial
from vnl_tpu.physics.model import Data, DisableBit, JointType, Model


def com_vel(m: Model, d: Data):
    """Body spatial velocities (com frame) and cdof time-derivatives."""
    dtype = d.qpos.dtype
    dof_vel = d.cdof * d.qvel[:, None]                     # (nv, 6)
    chain = jnp.asarray(m.body_chain_dof_mask, dtype)      # (nbody, nv)
    cvel = chain @ dof_vel                                 # (nbody, 6)

    prefix = jnp.asarray(m.dof_prefix_mask, dtype)         # (nv, nv)
    vel_snap = prefix @ dof_vel                            # (nv, 6)
    cdof_dot = spatial.motion_cross(vel_snap, d.cdof)
    # free-joint translation axes are constant world vectors
    jt = m.jnt_type[m.dof_jntid]
    dof_sub = np.zeros(m.nv, dtype=np.int64)
    for j in range(m.njnt):
        n = {0: 6, 1: 3, 2: 1, 3: 1}[int(m.jnt_type[j])]
        dof_sub[m.jnt_dofadr[j]:m.jnt_dofadr[j] + n] = np.arange(n)
    freetrans = (jt == int(JointType.FREE)) & (dof_sub < 3)
    cdof_dot = cdof_dot * jnp.asarray(~freetrans, dtype)[:, None]
    return cvel, cdof_dot


def rne(m: Model, d: Data, cvel: jnp.ndarray, cdof_dot: jnp.ndarray):
    """Bias force C(q, qvel): gravity + velocity products (no applied acc)."""
    dtype = d.qpos.dtype
    grav = jnp.asarray(m.opt.gravity, dtype)
    if m.opt.disableflags & DisableBit.GRAVITY:
        grav = jnp.zeros(3, dtype)

    # body accelerations: -gravity + chain-sum of cdof_dot * qvel
    chain = jnp.asarray(m.body_chain_dof_mask, dtype)
    cacc = chain @ (cdof_dot * d.qvel[:, None])
    cacc = cacc.at[:, 3:].add(-grav)

    # f = I a + v x* (I v), then suffix(subtree) sum and projection on cdof
    Iv = jnp.einsum("bij,bj->bi", d.cinert, cvel)
    f = jnp.einsum("bij,bj->bi", d.cinert, cacc) + spatial.force_cross(cvel, Iv)
    sub_mask = jnp.asarray(m.body_subtree_mask, dtype)
    f_sub = sub_mask @ f                                    # (nbody, 6)
    qfrc_bias = jnp.einsum("vi,vi->v", d.cdof,
                           f_sub[jnp.asarray(m.dof_bodyid)])
    return qfrc_bias


def passive(m: Model, d: Data) -> jnp.ndarray:
    """Joint spring/damper forces (mj_passive equivalent)."""
    dtype = d.qpos.dtype
    if m.opt.disableflags & DisableBit.PASSIVE:
        return jnp.zeros(m.nv, dtype)
    qfrc = -m.dof_damping * d.qvel
    hs = np.isin(m.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE)))
    if hs.any():
        jids = np.nonzero(hs)[0]
        qadr = jnp.asarray(m.jnt_qposadr[jids])
        dadr = jnp.asarray(m.jnt_dofadr[jids])
        k = m.jnt_stiffness[jnp.asarray(jids)]
        frc = -k * (d.qpos[qadr] - m.qpos_spring[qadr])
        qfrc = qfrc.at[dadr].add(frc)
    return qfrc
