"""Humanoid-tracking learning run on the virtual CPU mesh (VERDICT r2 #6).

Small-but-real training on the synthetic stand clip; writes the metrics
JSONL + curve PNG under logs/.  Usage:
  python tools/run_humanoid_cpu.py [num_timesteps] [num_envs]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import json  # noqa: E402
import os  # noqa: E402

import numpy as np  # noqa: E402

from vnl_tpu import envs, models, training  # noqa: E402

NUM_TIMESTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 128

env = envs.get_environment("humanoidtracking")
rows = []


def progress(step, metrics):
    row = {"step": int(step),
           **{k: float(v) for k, v in metrics.items()
              if isinstance(v, (int, float, np.floating))}}
    rows.append(row)
    with open("logs/metrics_humanoid_cpu.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[{step:>10}] reward="
          f"{metrics.get('eval/episode_reward', float('nan')):.4f} "
          f"len={metrics.get('eval/avg_episode_length', float('nan')):.1f}",
          flush=True)


os.makedirs("logs", exist_ok=True)
open("logs/metrics_humanoid_cpu.jsonl", "w").close()
make_policy, params, metrics = training.train(
    env, num_timesteps=NUM_TIMESTEPS, episode_length=150,
    num_envs=NUM_ENVS, num_eval_envs=64, learning_rate=6e-4,
    entropy_cost=1e-3, discounting=0.99, unroll_length=20,
    batch_size=NUM_ENVS // 32 or 1, num_minibatches=32,
    num_updates_per_batch=8, num_evals=16, normalize_observations=True,
    reward_scaling=1.0, clipping_epsilon=0.2, gae_lambda=0.95,
    kl_weight=1e-4, seed=0, progress_fn=progress)

first = next(r for r in rows if "eval/episode_reward" in r)
best = max(r.get("eval/episode_reward", -1) for r in rows)
print(f"first eval reward {first['eval/episode_reward']:.4f} -> best {best:.4f}",
      flush=True)
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs = [r["step"] for r in rows if "eval/episode_reward" in r]
    ys = [r["eval/episode_reward"] for r in rows if "eval/episode_reward" in r]
    plt.figure(figsize=(6, 4))
    plt.plot(xs, ys, marker="o")
    plt.xlabel("env steps")
    plt.ylabel("eval episode reward")
    plt.title("HumanoidTracking (synthetic stand clip, CPU mesh)")
    plt.tight_layout()
    plt.savefig("logs/curve_r3_humanoid.png", dpi=120)
    print("curve written logs/curve_r3_humanoid.png", flush=True)
except Exception as e:  # pragma: no cover
    print("plot skipped:", e, flush=True)
