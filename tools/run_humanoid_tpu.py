"""Humanoid-tracking learning run on the real TPU chip (VERDICT r2 #6).

Same workload as run_humanoid_cpu.py but at TPU scale: the synthetic
stand clip, reference-shaped PPO hyperparameters, metrics JSONL + curve
PNG under logs/.  Usage:
  python tools/run_humanoid_tpu.py [num_timesteps] [num_envs]
"""

import json
import os
import sys

import numpy as np

from vnl_tpu import envs, training

NUM_TIMESTEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
NUM_ENVS = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

env = envs.get_environment("humanoidtracking")
rows = []

os.makedirs("logs", exist_ok=True)
out_path = "logs/metrics_humanoid_tpu.jsonl"
open(out_path, "w").close()


def progress(step, metrics):
    row = {"step": int(step),
           **{k: float(v) for k, v in metrics.items()
              if isinstance(v, (int, float, np.floating))}}
    rows.append(row)
    with open(out_path, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"[{step:>10}] reward="
          f"{metrics.get('eval/episode_reward', float('nan')):.4f} "
          f"len={metrics.get('eval/avg_episode_length', float('nan')):.1f} "
          f"sps={metrics.get('training/sps', float('nan')):.0f}",
          flush=True)


make_policy, params, metrics = training.train(
    env, num_timesteps=NUM_TIMESTEPS, episode_length=150,
    num_envs=NUM_ENVS, num_eval_envs=256, learning_rate=6e-4,
    entropy_cost=1e-3, discounting=0.99, unroll_length=20,
    batch_size=32, num_minibatches=32, num_updates_per_batch=8,
    num_evals=15, normalize_observations=True, reward_scaling=1.0,
    clipping_epsilon=0.2, gae_lambda=0.95, kl_weight=1e-4, seed=0,
    progress_fn=progress)

evals = [r for r in rows if "eval/episode_reward" in r]
best = max(r["eval/episode_reward"] for r in evals)
print(f"first eval reward {evals[0]['eval/episode_reward']:.4f} "
      f"-> best {best:.4f}", flush=True)
try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs = [r["step"] for r in evals]
    ys = [r["eval/episode_reward"] for r in evals]
    ls = [r.get("eval/avg_episode_length", float("nan")) for r in evals]
    fig, ax = plt.subplots(1, 2, figsize=(10, 4))
    ax[0].plot(xs, ys, marker="o")
    ax[0].set_xlabel("env steps")
    ax[0].set_ylabel("eval episode reward")
    ax[1].plot(xs, ls, marker="o", color="tab:orange")
    ax[1].set_xlabel("env steps")
    ax[1].set_ylabel("avg episode length")
    fig.suptitle("HumanoidTracking (synthetic stand clip, TPU)")
    fig.tight_layout()
    fig.savefig("logs/curve_r4_humanoid_tpu.png", dpi=120)
    print("curve written logs/curve_r4_humanoid_tpu.png", flush=True)
except Exception as e:  # pragma: no cover
    print("plot skipped:", e, flush=True)
