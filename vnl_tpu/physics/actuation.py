"""Actuation: gain/bias force generation and activation dynamics.

Supports the reference models' actuator space: joint-transmission
motor/general actuators with fixed/affine gain, none/affine bias and
none/integrator/filter activation dynamics (the rodent keeps its first-order
filter after the torque conversion, /root/reference/envs/rodent.py:42-45 —
na = nu = 30).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vnl_tpu.physics.model import BiasType, Data, DisableBit, DynType, GainType, JointType, Model


def actuation(m: Model, d: Data):
    """Returns (actuator_force, qfrc_actuator, act_dot)."""
    dtype = d.qpos.dtype
    if m.nu == 0 or (m.opt.disableflags & DisableBit.ACTUATION):
        return (jnp.zeros(m.nu, dtype), jnp.zeros(m.nv, dtype),
                jnp.zeros(m.na, dtype))

    ctrl = d.ctrl
    if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
        ctrl = jnp.where(m.actuator_ctrllimited,
                         jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                                  m.actuator_ctrlrange[:, 1]), ctrl)

    # joint transmission: length/velocity in actuator space
    trn_jnt = m.actuator_trnid
    qadr = jnp.asarray(m.jnt_qposadr[trn_jnt])
    dadr = jnp.asarray(m.jnt_dofadr[trn_jnt])
    gear = m.actuator_gear
    length = d.qpos[qadr] * gear
    velocity = d.qvel[dadr] * gear

    # activation dynamics
    has_act = np.asarray(m.actuator_actadr) >= 0
    if m.na:
        act_of_u = d.act[jnp.clip(m.actuator_actadr, 0)]
        dyn_filter = m.actuator_dyntype == int(DynType.FILTER)
        tau = jnp.maximum(m.actuator_dynprm[:, 0], 1e-8)
        act_dot_u = jnp.where(
            dyn_filter, (ctrl - act_of_u) / tau, ctrl)  # integrator: ctrl
        act_dot = act_dot_u[jnp.asarray(np.nonzero(has_act)[0])]
        inp = jnp.where(jnp.asarray(has_act), act_of_u, ctrl)
    else:
        act_dot = jnp.zeros(0, dtype)
        inp = ctrl

    gaintype = jnp.asarray(np.asarray(m.actuator_gaintype))
    gain = jnp.where(gaintype == int(GainType.AFFINE),
                     m.actuator_gainprm[:, 0] + m.actuator_gainprm[:, 1] * length
                     + m.actuator_gainprm[:, 2] * velocity,
                     m.actuator_gainprm[:, 0])
    biastype = jnp.asarray(np.asarray(m.actuator_biastype))
    bias = jnp.where(biastype == int(BiasType.AFFINE),
                     m.actuator_biasprm[:, 0] + m.actuator_biasprm[:, 1] * length
                     + m.actuator_biasprm[:, 2] * velocity,
                     jnp.zeros(m.nu, dtype))

    force = gain * inp + bias
    force = jnp.where(m.actuator_forcelimited,
                      jnp.clip(force, m.actuator_forcerange[:, 0],
                               m.actuator_forcerange[:, 1]), force)

    # moment^T force: scatter gear-scaled forces into dofs
    qfrc = jnp.zeros(m.nv, dtype).at[dadr].add(gear * force)
    return force, qfrc, act_dot
