"""Relay-proof split of the full substep + control step (round 5).

Times progressively larger slices of the hot path — position stage, smooth
dynamics, constrained substep, full env control step — with the chained
methodology of tools/bisect_position_kernel.py: ITERS invocations chained
inside one jit program (state feeds forward), timed by a scalar VALUE
readback (block_until_ready does not wait through the axon relay).

Usage: python tools/bisect_substep.py [B] [ITERS]
"""

import importlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs, mjcf, physics

fmod = importlib.import_module("vnl_tpu.physics.forward")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 30

m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
qpos = jnp.tile(jnp.asarray(m.qpos0)[None], (B, 1))
qpos = qpos.at[:, 7:].add(
    0.05 * jax.random.normal(k1, (B, m.nq - 7), jnp.float32))
qvel = 0.3 * jax.random.normal(k2, (B, m.nv), jnp.float32)
d0 = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
d0 = jax.jit(jax.vmap(lambda d: physics.forward(m, d)))(d0)
jax.block_until_ready(d0)
print("setup done", flush=True)


def stage_position(d):
    d, efc = fmod.fwd_position(m, d)
    # fold every efc leaf into the carried state so nothing is DCE'd
    leaves = [x for x in jax.tree_util.tree_leaves(efc)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                        jnp.floating)]
    bump = sum(jnp.sum(x) * 1e-30 for x in leaves)
    return d.replace(qpos=d.qpos + bump)


def make_smooth():
    act = importlib.import_module("vnl_tpu.physics.actuation")
    iner = importlib.import_module("vnl_tpu.physics.inertia")

    def f(d):
        d, efc = fmod.fwd_position(m, d)
        d = fmod.fwd_velocity(m, d)
        force, qfrc_act, act_dot = act.actuation(m, d)
        qfrc_smooth = d.qfrc_passive - d.qfrc_bias + qfrc_act
        qacc_smooth = iner.solve_m(d, qfrc_smooth)
        return d.replace(qpos=d.qpos + 1e-30 * jnp.sum(qacc_smooth))
    return f


def stage_substep(d):
    return physics.step(m, d)


def timeit(tag, per_env_fn, iters=ITERS):
    @jax.jit
    def prog(d):
        def body(d, _):
            d2 = jax.vmap(per_env_fn)(d)
            # chain through qpos/qvel so iterations serialize
            return d.replace(qpos=d2.qpos, qvel=d2.qvel), ()
        d, _ = jax.lax.scan(body, d, (), length=iters)
        return d.qpos[0, 0]

    with jax.default_matmul_precision(fmod._matmul_precision()):
        t0 = time.perf_counter()
        float(prog(d0))
        tc = time.perf_counter() - t0
        float(prog(d0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(prog(d0))
            best = min(best, time.perf_counter() - t0)
    per = best / iters * 1e3
    print(f"{tag:26s} {per:7.3f} ms/iter  [compile {tc:.0f}s]", flush=True)
    return per


t_pos = timeit("fwd_position(+efc)", stage_position)
t_smooth = timeit("+vel+act+qacc_smooth", make_smooth())
t_sub = timeit("full substep", stage_substep)
print(f"\nmarginals: smooth-dyn {t_smooth - t_pos:+.3f}  "
      f"solver+integrate {t_sub - t_smooth:+.3f} ms", flush=True)

# ---- env control step (5 substeps + obs/traj/reward) ----
cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
from vnl_tpu.data.io import load_clip
clip = load_clip(cfg["clip_path"])
env = envs.get_environment("rodent", reference_clip=clip,
                           **cfg["env_args"])
wrapped = envs.wrap_for_training(env, episode_length=150)
keys = jax.random.split(jax.random.PRNGKey(1), B)
st0 = jax.jit(wrapped.reset)(keys)
jax.block_until_ready(st0.obs)
act_dim = env.action_size


@jax.jit
def prog_env(st):
    def body(carry, _):
        st, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.uniform(ka, (B, act_dim), minval=-1., maxval=1.)
        st = wrapped.step(st, a)
        return (st, k), ()
    (st, _), _ = jax.lax.scan(body, (st, keys[0]), (), length=ITERS)
    return st.obs[0, 0]


t0 = time.perf_counter()
float(prog_env(st0))
tc = time.perf_counter() - t0
float(prog_env(st0))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    float(prog_env(st0))
    best = min(best, time.perf_counter() - t0)
per = best / ITERS * 1e3
print(f"{'env control step':26s} {per:7.3f} ms/iter  [compile {tc:.0f}s]",
      flush=True)
print(f"env-side marginal (ctrl - 5*substep): {per - 5 * t_sub:+.3f} ms",
      flush=True)
