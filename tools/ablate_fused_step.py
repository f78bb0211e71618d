"""Marginal in-program cost of each stage of the FUSED substep.

Like tools/ablate_step.py but along the path forward() actually takes on
TPU (pallas position megakernel -> Schur inverse -> collide/constraints ->
rne -> actuation -> pallas CG megakernel -> integrate).  Consecutive
differences locate the substep's time at current kernel boundaries.

Usage: python tools/ablate_fused_step.py [B]
"""

import importlib
import sys
import time

import jax
import jax.numpy as jnp

from vnl_tpu import mjcf, physics

fmod = importlib.import_module("vnl_tpu.physics.forward")
imod = importlib.import_module("vnl_tpu.physics.inertia")
rmod = importlib.import_module("vnl_tpu.physics.rne")
cmod = importlib.import_module("vnl_tpu.physics.collision")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
smod = importlib.import_module("vnl_tpu.physics.solver")
amod = importlib.import_module("vnl_tpu.physics.actuation")
pp = importlib.import_module("vnl_tpu.ops.pallas_position")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})

k1, k2 = jax.random.split(jax.random.PRNGKey(0))
qpos = jnp.tile(m.qpos0[None], (B, 1)).at[:, 2].add(-0.005)
qpos = qpos.at[:, 7:].add(0.05 * jax.random.normal(k1, (B, m.nq - 7)))
qvel = 0.3 * jax.random.normal(k2, (B, m.nv))
d0 = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
d0 = jax.jit(jax.vmap(lambda d: physics.forward(m, d)))(d0)
jax.block_until_ready(d0)
print("setup done", flush=True)


def s_pos_kernel(d):
    fused = pp.make_position_fused(
        m, fmod._position_reference(m)[1],
        interpret=jax.default_backend() != "tpu")
    return fused(d.qpos)


def _fwd_pos(d):
    d, efc = fmod.fwd_position(m, d)
    return d, efc


def s_position(d):
    d, efc = _fwd_pos(d)
    return d, jax.tree.leaves(efc)


def s_velocity(d):
    d, efc = _fwd_pos(d)
    d = fmod.fwd_velocity(m, d)
    return d, jax.tree.leaves(efc)


def s_smooth(d):
    d, efc = _fwd_pos(d)
    d = fmod.fwd_velocity(m, d)
    force, qfrc_act, act_dot = amod.actuation(m, d)
    qfrc_smooth = d.qfrc_passive - d.qfrc_bias + qfrc_act
    qacc_smooth = imod.solve_m(d, qfrc_smooth)
    return d.replace(qfrc_actuator=qfrc_act, qfrc_smooth=qfrc_smooth,
                     qacc_smooth=qacc_smooth), jax.tree.leaves(efc)


def s_solve(d):
    d, efc = _fwd_pos(d)
    d = fmod.fwd_velocity(m, d)
    force, qfrc_act, act_dot = amod.actuation(m, d)
    qfrc_smooth = d.qfrc_passive - d.qfrc_bias + qfrc_act
    qacc_smooth = imod.solve_m(d, qfrc_smooth)
    d = d.replace(qfrc_actuator=qfrc_act, qfrc_smooth=qfrc_smooth,
                  qacc_smooth=qacc_smooth)
    return smod.solve(m, d, efc, qacc_smooth)


def s_full(d):
    return fmod.step(m, d)


STAGES = [
    ("position kernel only", s_pos_kernel),
    ("fwd_position (+inv,col,efc)", s_position),
    ("+velocity (rne)", s_velocity),
    ("+actuation+qacc_smooth", s_smooth),
    ("+CG solve", s_solve),
    ("FULL step (+integrate)", s_full),
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
    return (time.perf_counter() - t0) / iters * 1e3


prev = 0.0
for name, fn in STAGES:
    with jax.default_matmul_precision(fmod._matmul_precision()):
        dt = bench(fn)
    print(f"{name:30s} {dt:8.2f} ms  (marginal {dt-prev:+7.2f} ms)",
          flush=True)
    prev = dt
