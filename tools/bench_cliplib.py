"""Clip-library scaling throughput probe (VERDICT r4 #5, SURVEY §5.7).

Measures rollout steps/s of rodent_multiclip at growing library sizes
(2 / 8 / 64 clips by default).  The clip gather is id-indexed into one
device-resident stacked tensor, so throughput should be FLAT in library
size; a drop would mean the gather is materializing per-env copies.

Relay-proof timing: N control steps chained inside one jit program, timed
by a scalar value readback (CLAUDE.md round-4: block_until_ready does not
wait through the axon relay).

Usage: python tools/bench_cliplib.py [num_envs] [sizes_comma]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from vnl_tpu import envs
from vnl_tpu.data.io import load_clip
from vnl_tpu.data.pipeline import process_recording
from vnl_tpu import mjcf

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SIZES = ([int(s) for s in sys.argv[2].split(",")]
         if len(sys.argv) > 2 else [2, 8, 64])
STEPS = 40

cfg = yaml.safe_load(open("configs/env_config.yaml"))["env"]
args = dict(cfg["env_args"])
clip = load_clip(cfg["clip_path"])
qpos = np.concatenate([np.asarray(clip.position),
                       np.asarray(clip.quaternion),
                       np.asarray(clip.joints)], axis=1)
model = mjcf.load_model(args["mjcf_path"],
                        rescale=(args["scale_factor"],) * 2,
                        torque_actuators=True)

for n_clips in SIZES:
    # chunk the 250-frame recording, then tile to reach n_clips
    base_len = max(25, (qpos.shape[0] // max(2, min(n_clips, 10))))
    lib = process_recording(model, qpos, clip_length=base_len)
    reps = int(np.ceil(n_clips / lib.num_clips))
    if reps > 1:
        lib = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.tile(
                x, (reps,) + (1,) * (x.ndim - 1)), lib)
    lib = jax.tree_util.tree_map(
        lambda x: None if x is None else x[:n_clips], lib)
    a = dict(args, clip_length=int(lib.clip_length),
             sub_clip_length=min(int(args["sub_clip_length"]),
                                 int(lib.clip_length) - 6))
    env = envs.get_environment("rodent_multiclip", clip_library=lib, **a)
    wrapped = envs.wrap_for_training(env, episode_length=100)

    @jax.jit
    def prog(keys):
        st = wrapped.reset(keys)

        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            act = jax.random.uniform(ka, (B, env.action_size),
                                     minval=-1.0, maxval=1.0)
            st = wrapped.step(st, act)
            return (st, k), ()

        (st, _), _ = jax.lax.scan(body, (st, keys[0]), (), length=STEPS)
        return st.reward[0]

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    t0 = time.perf_counter()
    float(prog(keys))
    t_compile = time.perf_counter() - t0
    float(prog(keys))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(keys))
        best = min(best, time.perf_counter() - t0)
    sps = B * STEPS / best
    gb = sum(x.nbytes for x in jax.tree_util.tree_leaves(lib.clips)) / 1e9
    print(f"clips={n_clips:4d} clip_len={lib.clip_length:4d} "
          f"lib={gb * 1e3:7.1f} MB  rollout {sps / 1e3:6.1f}k sps  "
          f"[compile {t_compile:.0f}s]", flush=True)
