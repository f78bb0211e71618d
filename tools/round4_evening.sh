#!/bin/bash
# Round-4 evening TPU window: run AFTER stopping the long rodent run.
# Sequential, each step under its own timeout, all artifacts into logs/.
#   1) TPU-vs-CPU numerics check (golden fixture + fused-vs-XLA on device)
#   2) multi-clip rodent learning run (2x125-frame clips, per-clip evals)
#   3) humanoid TPU learning run
#   4) bench.py (records last-good for the driver's end-of-round run)
set -u
cd "$(dirname "$0")/.."

echo "=== [1/4] TPU numerics check ==="
timeout 1200 python tools/check_tpu_numerics.py 2>&1 | grep -v WARNING \
  | tee logs/tpu_numerics_r4.log

echo "=== [2/4] multi-clip run ==="
timeout 3600 python train.py \
  env.name=rodent_multiclip env.env_args.clip_length=125 \
  env.env_args.sub_clip_length=100 env.env_args.min_sub_clip_length=5 \
  train.episode_length=100 train.num_envs=1024 \
  train.eval_every=10000000 train.num_timesteps=60000000 \
  train.task_name=rodent_multiclip_r4 \
  2>&1 | grep -v WARNING | tee logs/train_r4_multiclip.log

echo "=== [3/4] humanoid TPU run ==="
timeout 2700 python tools/run_humanoid_tpu.py 30000000 1024 \
  2>&1 | grep -v WARNING | tee logs/train_r4_humanoid_tpu.log

echo "=== [4/4] bench ==="
timeout 1800 python bench.py 2>&1 | grep -v WARNING | tail -3
echo "=== evening window done ==="
