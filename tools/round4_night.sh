#!/bin/bash
# Round-4 night TPU window (trimmed round4_evening.sh): fire the moment the
# relay probe reports healthy.  Priority-ordered — if the relay dies again
# mid-window, the most judge-valuable artifacts land first.
#   1) bench.py                (BENCH_r04 last-good; VERDICT r3 #1)
#   2) multi-clip rodent run   (per-clip eval curve;  VERDICT r3 #5)
#   3) humanoid TPU run        (learning evidence;    VERDICT r3 #8)
#   4) TPU-vs-CPU numerics     (golden fixture;       VERDICT r3 #6)
# Everything sequential (TPU is exclusively held), each under timeout,
# artifacts into logs/ so they can be committed as each step lands.
# ADVICE r4 fixes: bench timeout raised above bench.py's own worst-case
# self-budget (420s probe + 2700s+ attempt), and every stage gets a
# SIGKILL backstop (-k 30) because orbax/async threads swallowed SIGTERM
# on the r4 night and stages overlapped on the exclusive TPU.
set -u
cd "$(dirname "$0")/.."

echo "=== [1/4] bench ($(date -u +%H:%M)) ==="
timeout -k 30 3600 python bench.py 2>&1 | grep -v WARNING | tail -4

echo "=== [2/4] multi-clip run ($(date -u +%H:%M)) ==="
timeout -k 30 2100 python train.py \
  env.name=rodent_multiclip env.env_args.clip_length=125 \
  env.env_args.sub_clip_length=100 env.env_args.min_sub_clip_length=5 \
  train.episode_length=100 train.num_envs=1024 \
  train.eval_every=10000000 train.num_timesteps=80000000 \
  train.task_name=rodent_multiclip_r4 \
  2>&1 | grep -v WARNING | tee logs/train_r4_multiclip.log | tail -30

echo "=== [3/4] humanoid TPU run ($(date -u +%H:%M)) ==="
timeout -k 30 1500 python tools/run_humanoid_tpu.py 40000000 1024 \
  2>&1 | grep -v WARNING | tee logs/train_r4_humanoid_tpu.log | tail -20

echo "=== [4/4] TPU numerics check ($(date -u +%H:%M)) ==="
timeout -k 30 1200 python tools/check_tpu_numerics.py 2>&1 | grep -v WARNING \
  | tee logs/tpu_numerics_r4.log

echo "=== night window done ($(date -u +%H:%M)) ==="
