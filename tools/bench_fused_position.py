"""A/B the fused position-stage megakernel on TPU: full step at B=1024.

Usage: python tools/bench_fused_position.py [B]
"""

import os
import sys
import time
import importlib

import jax
import jax.numpy as jnp
import numpy as np

from vnl_tpu import mjcf, physics

fmod = importlib.import_module("vnl_tpu.physics.forward")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
m = mjcf.load_model("/root/reference/assets/rodent.xml",
                    rescale=(0.9, 0.9), torque_actuators=True,
                    overrides={"solver": "cg", "iterations": 6,
                               "ls_iterations": 6})

rng = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(rng)
qpos = jnp.tile(m.qpos0[None], (B, 1))
qpos = qpos.at[:, 2].add(-0.005)
qpos = qpos.at[:, 7:].add(0.05 * jax.random.normal(k1, (B, m.nq - 7)))
qvel = 0.3 * jax.random.normal(k2, (B, m.nv))
os.environ["VNL_TPU_FUSED_POSITION"] = "0"
d0 = jax.vmap(lambda q, v: physics.make_data(m, qpos=q, qvel=v))(qpos, qvel)
d0 = jax.jit(jax.vmap(lambda d: physics.forward(m, d)))(d0)
jax.block_until_ready(d0)
print("setup done", flush=True)


def timeit(tag, iters=30):
    f = jax.jit(jax.vmap(lambda d: fmod.step(m, d)))
    t0 = time.perf_counter()
    out = f(d0)
    jax.block_until_ready(out)
    print(f"{tag}: compile+1 run {time.perf_counter()-t0:.1f} s", flush=True)
    out = f(d0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(d0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag}: {dt:.2f} ms/substep  ({B/dt*1000:.0f} substeps/s)",
          flush=True)
    return out, dt


out_base, dt_base = timeit("baseline (fused-CG only)")

os.environ["VNL_TPU_FUSED_POSITION"] = "1"
out_fused, dt_fused = timeit("fused-position")

qa = np.asarray(out_base.qacc)
qf = np.asarray(out_fused.qacc)
rel = np.max(np.abs(qa - qf) / (np.abs(qa) + 1.0))
qm_rel = np.max(np.abs(np.asarray(out_base.qM) - np.asarray(out_fused.qM)))
print(f"qacc max rel-ish diff: {rel:.2e}; qM max abs diff: {qm_rel:.2e}",
      flush=True)
print(f"speedup: {dt_base/dt_fused:.3f}x", flush=True)
