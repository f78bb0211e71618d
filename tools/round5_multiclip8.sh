#!/bin/bash
# Round-5 8-clip adaptive multiclip run (VERDICT r4 #4+#5): chunk the
# shipped 250-frame recording into 8 clips of 30 frames, train
# rodent_multiclip with ADAPTIVE clip weights (weights grow on the clips
# the policy scores worst on, refreshed each eval interval), and verify
# per-clip eval rewards + throughput at library scale.
set -u
cd "$(dirname "$0")/.."
echo "=== relay probe-gate ($(date -u +%H:%M)) ==="
python tools/probe_relay.py 1800 || { echo "relay dead; aborting"; exit 1; }

CKROOT=model_checkpoints/multiclip8_r5
CKPT_ROOT=$CKROOT ATTEMPT_SECONDS="${ATTEMPT_SECONDS:-2400}" ATTEMPTS=3 \
timeout -k 30 "${RUN_SECONDS:-3600}" tools/train_resilient.sh \
  env.name=rodent_multiclip \
  env.env_args.clip_length=30 \
  env.env_args.sub_clip_length=24 \
  env.env_args.min_sub_clip_length=7 \
  train.episode_length=25 \
  train.num_envs=1024 \
  train.eval_every=8000000 \
  train.num_timesteps=64000000 \
  train.adaptive_clip_weights=true \
  train.render_eval=false \
  train.checkpoint_dir=$CKROOT \
  train.task_name=rodent_multiclip8_r5 2>&1 \
  | grep --line-buffered -v WARNING \
  | tee logs/train_r5_multiclip8.log | tail -6
tools/collect_r5_artifacts.sh $CKROOT
echo "=== multiclip8 done ($(date -u +%H:%M)) ==="
