"""Marginal in-program cost of each physics stage (prefix ablation).

Times jitted cumulative prefixes of the substep pipeline; consecutive
differences are each stage's true marginal cost inside the fused program
(standalone stage timings overstate: they pay HBM round-trips that XLA
fuses away in the full step).  Also prints XLA's cost analysis for the
full step (flops / bytes accessed) to classify compute- vs bandwidth-bound.

Usage: python tools/ablate_step.py [B]
"""

import sys
import time
import importlib

import jax
import jax.numpy as jnp

from vnl_tpu import mjcf, physics

fmod = importlib.import_module("vnl_tpu.physics.forward")
kmod = importlib.import_module("vnl_tpu.physics.kinematics")
imod = importlib.import_module("vnl_tpu.physics.inertia")
rmod = importlib.import_module("vnl_tpu.physics.rne")
cmod = importlib.import_module("vnl_tpu.physics.collision")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
smod = importlib.import_module("vnl_tpu.physics.solver")
amod = importlib.import_module("vnl_tpu.physics.actuation")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})

rng = jax.random.PRNGKey(0)
qpos = jnp.tile(m.qpos0[None], (B, 1))
qpos = qpos.at[:, :2].add(0.01 * jax.random.normal(rng, (B, 2)))
d0 = jax.vmap(lambda q: physics.make_data(m, qpos=q))(qpos)
d0 = jax.jit(jax.vmap(lambda d: physics.forward(m, d)))(d0)
jax.block_until_ready(d0)


def p_kin(d):
    return kmod.kinematics(m, d)


def p_com(d):
    return kmod.com_pos(p_kin(d))if False else kmod.com_pos(m, p_kin(d))


def p_crb(d):
    return imod.crb(m, p_com(d))


def p_col(d):
    d = p_crb(d)
    dist, pos, frame, pair = cmod.collide(m, d)
    return d.replace(contact_dist=dist, contact_pos=pos, contact_frame=frame)


def p_efc(d):
    d = p_crb(d)
    dist, pos, frame, pair = cmod.collide(m, d)
    efc = nmod.make_constraints(m, d, dist, pos, frame, pair)
    d = d.replace(contact_dist=dist, contact_pos=pos, contact_frame=frame)
    return d, jax.tree.leaves(efc)


def p_vel(d):
    d, efc = p_efc(d)
    cvel, cdof_dot = rmod.com_vel(m, d)
    qfrc_bias = rmod.rne(m, d, cvel, cdof_dot)
    return d.replace(cvel=cvel, qfrc_bias=qfrc_bias,
                     qfrc_passive=rmod.passive(m, d)), efc


def p_smooth(d):
    d, _ = p_vel(d)
    force, qfrc_act, act_dot = amod.actuation(m, d)
    d = d.replace(actuator_force=force, qfrc_actuator=qfrc_act,
                  act_dot=act_dot)
    qfrc_smooth = d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
    return d.replace(qfrc_smooth=qfrc_smooth,
                     qacc_smooth=imod.solve_m(d, qfrc_smooth))


def p_forward(d):
    return fmod.forward(m, d)


def p_step(d):
    return fmod.step(m, d)


def p_step_refine(d):
    return fmod.step(m, d, refine_inverse=True)


STAGES = [
    ("kinematics", p_kin),
    ("+com_pos", p_com),
    ("+crb+inv", p_crb),
    ("+collide", p_col),
    ("+constraints", p_efc),
    ("+comvel/rne/passive", p_vel),
    ("+actuation+qacc_smooth", p_smooth),
    ("forward(full: +solver)", p_forward),
    ("step(+integrate)", p_step),
    ("step(refine_inverse)", p_step_refine),
]


def bench(fn, iters=30):
    f = jax.jit(jax.vmap(fn))
    out = f(d0)
    jax.block_until_ready(out)
    out = f(d0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(d0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, f


prev = 0.0
for name, fn in STAGES:
    dt, f = bench(fn)
    marg = dt - prev
    print(f"{name:26s} {dt:8.2f} ms  (marginal {marg:+7.2f} ms)", flush=True)
    if not name.startswith("step"):
        prev = dt

# XLA cost analysis of the full step
f = jax.jit(jax.vmap(p_step))
ca = f.lower(d0).compile().cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
flops = ca.get("flops", 0.0)
bytes_ = ca.get("bytes accessed", 0.0)
print(f"\nfull step cost analysis: {flops/1e9:.2f} GFLOP, "
      f"{bytes_/1e9:.3f} GB accessed", flush=True)
print(f"  per env: {flops/B/1e6:.3f} MFLOP, {bytes_/B/1e3:.1f} KB", flush=True)
