"""Marginal cost of each rodent env.step stage (prefix ablation).

Like tools/ablate_step.py but one level up: physics pipeline_step vs the
env-side obs/traj/reward/termination work per control step.

Usage: python tools/ablate_env_step.py [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs
from vnl_tpu.data.io import load_clip

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
clip = load_clip(cfg["clip_path"])
env = envs.get_environment("rodent", reference_clip=clip, **cfg["env_args"])

rng = jax.random.PRNGKey(0)
state0 = jax.jit(jax.vmap(env.reset))(jax.random.split(rng, B))
jax.block_until_ready(state0)
action = jnp.zeros((B, env.action_size))
print("env ready", flush=True)


def p_pipeline(s, a):
    return env.pipeline_step(s.pipeline_state, a)


def p_obs(s, a):
    d = env.pipeline_step(s.pipeline_state, a)
    return d, env._get_obs(d, a, s.info)


def p_traj(s, a):
    d = env.pipeline_step(s.pipeline_state, a)
    cur = s.info["cur_frame"] + 1
    ref = env._get_clip(s.info)
    return d, env._get_obs(d, a, s.info), env._get_traj(d, cur, ref)


def p_full(s, a):
    return env.step(s, a)


STAGES = [("pipeline (5 substeps)", p_pipeline), ("+obs", p_obs),
          ("+traj features", p_traj), ("full env.step", p_full)]


def bench(fn, iters=20):
    f = jax.jit(jax.vmap(fn, in_axes=(0, 0)))
    out = f(state0, action)
    jax.block_until_ready(out)
    out = f(state0, action)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(state0, action)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


prev = 0.0
for name, fn in STAGES:
    dt = bench(fn)
    print(f"{name:24s} {dt:8.2f} ms  (marginal {dt-prev:+7.2f} ms)",
          flush=True)
    if not name.startswith("full"):
        prev = dt
dt_full = dt
print(f"\nenv.step sps at B={B}: {B/dt_full*1000:,.0f}", flush=True)
