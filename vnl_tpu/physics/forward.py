"""Forward dynamics pipeline and semi-implicit Euler integration.

mj_forward/mj_step equivalents: position stage (FK, com quantities, CRB,
collision, constraints), velocity stage (bias, passive), actuation,
acceleration (smooth + constrained), then Euler integration with implicit
joint damping — the pipeline the reference runs 5x per control step
(/root/reference/envs/rodent.py:97-101,181).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import math as vmath
from vnl_tpu.physics import actuation as _actuation
from vnl_tpu.physics import collision as _collision
from vnl_tpu.physics import constraint as _constraint
from vnl_tpu.physics import inertia as _inertia
from vnl_tpu.physics import kinematics as _kinematics
from vnl_tpu.physics import rne as _rne
from vnl_tpu.physics import solver as _solver
from vnl_tpu.physics.model import Data, DisableBit, IntegratorType, JointType, Model


def make_data(m: Model, qpos: Optional[jax.Array] = None,
              qvel: Optional[jax.Array] = None,
              dtype=jnp.float32) -> Data:
    """Fresh Data at qpos0 (or given state); call forward() to populate."""
    nb, nv, nq = m.nbody, m.nv, m.nq
    z = lambda *s: jnp.zeros(s, dtype)
    quat0 = jnp.zeros((nb, 4), dtype).at[:, 0].set(1.0)
    return Data(
        qpos=jnp.asarray(qpos, dtype) if qpos is not None else m.qpos0.astype(dtype),
        qvel=jnp.asarray(qvel, dtype) if qvel is not None else z(nv),
        act=z(m.na), ctrl=z(m.nu),
        xpos=z(nb, 3), xquat=quat0, xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (nb, 3, 3)),
        xipos=z(nb, 3), xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
        geom_xpos=z(m.ngeom, 3),
        geom_xmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (m.ngeom, 3, 3)),
        subtree_com=z(nb, 3), cinert=z(nb, 6, 6), cdof=z(nv, 6),
        cvel=z(nb, 6), qM=z(nv, nv), qMinv=z(nv, nv), qMhBinv=z(nv, nv),
        qfrc_bias=z(nv), qfrc_passive=z(nv), qfrc_actuator=z(nv),
        actuator_force=z(m.nu), act_dot=z(m.na),
        qfrc_smooth=z(nv), qacc_smooth=z(nv), qfrc_constraint=z(nv),
        qacc=z(nv),
        contact_dist=z(m.ncon_max), contact_pos=z(m.ncon_max, 3),
        contact_frame=z(m.ncon_max, 3, 3), contact_force=z(m.ncon_max, 4),
        sensordata=z(m.nsensordata),
    )


_POS_REF_CACHE: dict = {}


def _position_reference(m: Model):
    """Per-env XLA position stage with the fused kernel's flat signature
    (also its test oracle and small-batch/CPU fallback).  The trailing
    outputs are the mass-matrix inverse(s) the kernel now sweeps in-launch:
    qMinv, plus (M + h diag(B))^-1 when the model is damped."""
    hit = _POS_REF_CACHE.get(id(m))
    if hit is not None:
        return hit

    from vnl_tpu.ops.linalg import inv_spd

    damped = _inertia._needs_implicit_damping(m)

    def ref(qpos):
        d = make_data(m, qpos=qpos, dtype=qpos.dtype)
        d = _kinematics.kinematics(m, d)
        d = _kinematics.com_pos(m, d)
        qM = _inertia.assemble_qM(m, d)
        outs = [d.xpos, d.xquat, d.xmat, d.xipos, d.xanchor, d.xaxis,
                d.geom_xpos, d.geom_xmat, d.subtree_com, d.cinert,
                d.cdof, qM]
        if damped:
            hB = (m.opt.timestep * m.dof_damping).astype(qpos.dtype)
            inv = inv_spd(jnp.stack([qM, qM + jnp.diag(hB)]))
            outs += [inv[0], inv[1]]
        else:
            outs += [inv_spd(qM)]
        return tuple(outs)

    _POS_REF_CACHE[id(m)] = (m, ref)  # hold m: id() must stay unique
    return _POS_REF_CACHE[id(m)]


def fwd_position(m: Model, d: Data, refine_inverse: bool = False):
    from vnl_tpu.ops import pallas_position
    if pallas_position.enabled() and d.qpos.dtype == jnp.float32:
        fused = pallas_position.make_position_fused(
            m, _position_reference(m)[1],
            interpret=jax.default_backend() != "tpu")
        (xpos, xquat, xmat, xipos, xanchor, xaxis, gxp, gxm, scom,
         cinert, cdof, qM, *invs) = fused(d.qpos)
        d = d.replace(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
                      xanchor=xanchor, xaxis=xaxis, geom_xpos=gxp,
                      geom_xmat=gxm, subtree_com=scom, cinert=cinert,
                      cdof=cdof, qM=qM,
                      qMinv=invs[0],
                      qMhBinv=invs[1] if len(invs) > 1 else invs[0])
    else:
        d = _kinematics.kinematics(m, d)
        d = _kinematics.com_pos(m, d)
        d = _inertia.crb(m, d, refine_inverse=refine_inverse)
    con_dist, con_pos, con_frame, con_pair = _collision.collide(m, d)
    d = d.replace(contact_dist=con_dist, contact_pos=con_pos,
                  contact_frame=con_frame)
    efc = _constraint.make_constraints(m, d, con_dist, con_pos, con_frame,
                                       con_pair)
    return d, efc


def fwd_velocity(m: Model, d: Data):
    cvel, cdof_dot = _rne.com_vel(m, d)
    qfrc_bias = _rne.rne(m, d, cvel, cdof_dot)
    qfrc_passive = _rne.passive(m, d)
    return d.replace(cvel=cvel, qfrc_bias=qfrc_bias,
                     qfrc_passive=qfrc_passive)


def _matmul_precision() -> str:
    """TPU matmul precision for physics (env VNL_TPU_PHYSICS_PRECISION).

    XLA's DEFAULT on TPU is single-pass bf16 multiplies; measured ~1%
    relative noise on constrained accelerations (tools/debug_fused_cg.py),
    far from the CUDA-f32 reference numerics.  Physics is bandwidth-bound
    (<1% MXU util), so full-f32 passes cost almost nothing — pin f32."""
    import os
    return os.environ.get("VNL_TPU_PHYSICS_PRECISION", "float32")


def forward(m: Model, d: Data, compute_sensors: bool = False,
            refine_inverse: bool = False) -> Data:
    """Full forward dynamics: populates derived fields and qacc.

    compute_sensors: evaluate the model's sensors into d.sensordata (off by
    default — the tracking envs build observations from state directly, and
    sensor evaluation re-runs a velocity pass).
    refine_inverse: reuse+polish the carried mass-matrix inverses instead
    of refactoring (valid when d is the previous substep's output; see
    inertia.crb)."""
    with jax.default_matmul_precision(_matmul_precision()):
        d, efc = fwd_position(m, d, refine_inverse=refine_inverse)
        d = fwd_velocity(m, d)
        force, qfrc_act, act_dot = _actuation.actuation(m, d)
        d = d.replace(actuator_force=force, qfrc_actuator=qfrc_act,
                      act_dot=act_dot)
        qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
        qacc_smooth = _inertia.solve_m(d, qfrc_smooth)
        qacc, qfrc_constraint, con_force = _solver.solve(m, d, efc,
                                                         qacc_smooth)
        ncon = m.ncon_max
        if efc.ncon and con_force.shape[-1] == 3:  # elliptic rows -> pad
            con_force = jnp.pad(con_force, ((0, 0), (0, 1)))
        contact_force = (con_force if efc.ncon else
                         jnp.zeros((ncon, 4), d.qpos.dtype))
        d = d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth,
                      qacc=qacc, qfrc_constraint=qfrc_constraint,
                      contact_force=contact_force)
        if compute_sensors and m.nsensordata:
            from vnl_tpu.physics import sensor as _sensor
            d = d.replace(sensordata=_sensor.sensors(m, d))
        return d


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """qpos += dt * qvel with quaternion integration on free/ball joints.

    Hinge/slide dofs integrate in ONE gather+scatter over static index
    tables; quaternion joints (typically just the free root) are handled
    individually."""
    new = qpos
    hs = np.isin(m.jnt_type, (int(JointType.HINGE), int(JointType.SLIDE)))
    if hs.any():
        qadr = jnp.asarray(m.jnt_qposadr[hs])
        dadr = jnp.asarray(m.jnt_dofadr[hs])
        new = new.at[qadr].add(dt * qvel[dadr])
    for j in np.nonzero(~hs)[0]:
        jt = JointType(int(m.jnt_type[j]))
        qa, va = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
        if jt == JointType.FREE:
            new = new.at[qa:qa + 3].add(dt * qvel[va:va + 3])
            q = vmath.quat_integrate(qpos[qa + 3:qa + 7], qvel[va + 3:va + 6], dt)
            new = new.at[qa + 3:qa + 7].set(q)
        else:  # BALL
            q = vmath.quat_integrate(qpos[qa:qa + 4], qvel[va:va + 3], dt)
            new = new.at[qa:qa + 4].set(q)
    return new


def integrate(m: Model, d: Data) -> Data:
    """Semi-implicit Euler with implicit joint damping (mj_Euler)."""
    dt = m.opt.timestep
    qacc = d.qacc

    # Static model metadata resolves this branch at trace time; the
    # (M + dt·diag(B))⁻¹ factor was computed alongside M⁻¹ in crb() as one
    # stacked Newton–Schulz inverse, so implicit damping is a single matmul.
    if _inertia._needs_implicit_damping(m):
        # qvel += dt * (M + dt*diag(B))^-1 M qacc
        with jax.default_matmul_precision(_matmul_precision()):
            dv = d.qMhBinv @ (d.qM @ qacc)
        qvel = d.qvel + dt * dv
    else:
        qvel = d.qvel + dt * qacc

    act = d.act + dt * d.act_dot if m.na else d.act
    qpos = _integrate_pos(m, d.qpos, qvel, dt)
    return d.replace(qpos=qpos, qvel=qvel, act=act)


def _vel_forces(m: Model, d: Data, qvel: jax.Array) -> jax.Array:
    """Velocity-dependent smooth forces at state (d.qpos, qvel):
    passive (damping/springs) - bias (Coriolis/centrifugal) + actuator."""
    d2 = d.replace(qvel=qvel)
    cvel, cdof_dot = _rne.com_vel(m, d2)
    qfrc_bias = _rne.rne(m, d2, cvel, cdof_dot)
    qfrc_passive = _rne.passive(m, d2)
    _, qfrc_act, _ = _actuation.actuation(m, d2)
    return qfrc_passive - qfrc_bias + qfrc_act


def _implicit_integrate(m: Model, d: Data) -> Data:
    """mj_implicit: qvel += h * (M - h*qDeriv)^-1 (qfrc_smooth +
    qfrc_constraint) with qDeriv = d(smooth velocity forces)/d qvel —
    Coriolis/centrifugal, joint damping, and actuator velocity gains.

    MuJoCo builds qDeriv analytically (mjd_smooth_vel) and LU-factors the
    unsymmetric (M - h*qDeriv); here qDeriv is the exact jacfwd of the same
    forces (nv forward tangents through the velocity stage — identical
    derivative, no hand-derived recursion), and the solve is Newton-Schulz
    seeded from the damped-mass inverse qMhBinv: the residual is
    O(h*||dCoriolis||*||M^-1||), so a few all-matmul iterations reach the
    dtype floor — no TPU-hostile LU (CLAUDE.md: keep solves on matmuls)."""
    from vnl_tpu.ops.linalg import refine_inv_general
    h = m.opt.timestep
    qDeriv = jax.jacfwd(lambda v: _vel_forces(m, d, v))(d.qvel)
    A = d.qM - h * qDeriv
    Ainv = refine_inv_general(A, d.qMhBinv, iters=6)
    with jax.default_matmul_precision(_matmul_precision()):
        qacc = Ainv @ (d.qfrc_smooth + d.qfrc_constraint)
    qvel = d.qvel + h * qacc
    act = d.act + h * d.act_dot if m.na else d.act
    qpos = _integrate_pos(m, d.qpos, qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act)


_RK4_A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
_RK4_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _rk4(m: Model, d: Data) -> Data:
    """Classic 4th-order Runge–Kutta step (mj_RungeKutta semantics).

    d arrives with stage-0 forward dynamics already computed; each further
    stage evaluates full forward dynamics at the tableau-shifted state.
    The state derivative is (qvel, qacc, act_dot); qpos advances through
    quaternion integration of the combined velocity (no implicit damping —
    that is an Euler-integrator device)."""
    h = m.opt.timestep
    qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
    F = [(d.qvel, d.qacc, d.act_dot)]

    def comb(coeffs, idx):
        terms = [(c, F[j]) for c, j in zip(coeffs, idx) if c != 0.0]
        dqvel = sum(c * f[0] for c, f in terms)
        dqacc = sum(c * f[1] for c, f in terms)
        dact = sum(c * f[2] for c, f in terms) if m.na else d.act_dot
        return dqvel, dqacc, dact

    for i in range(3):
        dqvel, dqacc, dact = comb(_RK4_A[i], range(i + 1))
        d = d.replace(
            qpos=_integrate_pos(m, qpos0, dqvel, h),
            qvel=qvel0 + h * dqacc,
            act=act0 + h * dact if m.na else act0)
        d = forward(m, d)
        F.append((d.qvel, d.qacc, d.act_dot))

    dqvel, dqacc, dact = comb(_RK4_B, range(4))
    return d.replace(
        qpos=_integrate_pos(m, qpos0, dqvel, h),
        qvel=qvel0 + h * dqacc,
        act=act0 + h * dact if m.na else act0)


def step(m: Model, d: Data, refine_inverse: bool = False) -> Data:
    """One physics step: forward dynamics + integration.

    Integrators: Euler (with implicit joint damping, mj_Euler), RK4
    (mj_RungeKutta), implicitfast, and full implicit (mj_implicit, dense
    Coriolis qDeriv via _implicit_integrate).  For models whose velocity
    derivative is diagonal — joint damping only, no fluid forces, no
    actuator velocity gains, which covers the reference assets —
    MuJoCo's implicitfast update (M - h*qDeriv)^{-1}(qfrc_smooth +
    qfrc_constraint) is algebraically the same (M + h*diag(B))^{-1}
    solve the Euler path performs, so both route through integrate()."""
    d = forward(m, d, refine_inverse=refine_inverse)
    if m.opt.integrator == int(IntegratorType.IMPLICIT):
        return _implicit_integrate(m, d)
    if m.opt.integrator == int(IntegratorType.RK4):
        return _rk4(m, d)
    return integrate(m, d)
