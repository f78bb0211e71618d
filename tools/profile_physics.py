"""Stage-by-stage TPU timing of the rodent physics substep."""

import time
import jax
import jax.numpy as jnp
import functools

from vnl_tpu import mjcf, physics
import importlib
fmod = importlib.import_module("vnl_tpu.physics.forward")
kmod = importlib.import_module("vnl_tpu.physics.kinematics")
imod = importlib.import_module("vnl_tpu.physics.inertia")
rmod = importlib.import_module("vnl_tpu.physics.rne")
cmod = importlib.import_module("vnl_tpu.physics.collision")
nmod = importlib.import_module("vnl_tpu.physics.constraint")
smod = importlib.import_module("vnl_tpu.physics.solver")

B = 1024
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


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms  ({dt*1e3/B:6.2f} us/env)", flush=True)
    return out


bench("kinematics", jax.vmap(lambda d: kmod.kinematics(m, d)), d0)
bench("com_pos", jax.vmap(lambda d: kmod.com_pos(m, d)), d0)
bench("crb+cholesky", jax.vmap(lambda d: imod.crb(m, d)), d0)
bench("crb only", jax.vmap(lambda d: d.replace(qM=imod.crb(m, d).qM)), d0)
bench("cholesky only",
      jax.vmap(lambda d: jax.scipy.linalg.cholesky(
          d.qM + 0.1 * jnp.eye(m.nv), lower=True)), d0)
bench("collide", jax.vmap(lambda d: cmod.collide(m, d)[:3]), d0)


def constraints(d):
    dist, pos, frame, pair = cmod.collide(m, d)
    return nmod.make_constraints(m, d, dist, pos, frame, pair)[:5]


bench("collide+constraints", jax.vmap(constraints), d0)
bench("com_vel+rne", jax.vmap(lambda d: rmod.rne(m, d, *rmod.com_vel(m, d))), d0)


def full_solve(d):
    dist, pos, frame, pair = cmod.collide(m, d)
    efc = nmod.make_constraints(m, d, dist, pos, frame, pair)
    return smod.solve(m, d, efc, d.qacc_smooth)[0]


bench("collide+efc+solver", jax.vmap(full_solve), d0)
bench("integrate(eulerdamp)", jax.vmap(lambda d: fmod.integrate(m, d)), d0)
bench("FULL forward", jax.vmap(lambda d: fmod.forward(m, d)), d0)
bench("FULL step", jax.vmap(lambda d: fmod.step(m, d)), d0)
