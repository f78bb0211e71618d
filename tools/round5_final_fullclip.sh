#!/bin/bash
# Round-5 final single-clip campaign: continue the BEST policy
# (checkpoints_keep/13fcbe84/state_230809600, eval 0.90 / len 73 of 245)
# at the winning curriculum ratio (probe battery + staged campaign:
# floor ~= 0.25 of the sub-clip cap; 0.5 was fatal) for as long as the
# wall budget allows.  Collects + git-adds the keeper checkpoint every
# CYCLE_SECONDS so progress survives anything.
# Env: WALL_SECONDS total budget (default 10800), CYCLE_SECONDS per
# resilient cycle (default 2700).
set -u
cd "$(dirname "$0")/.."
echo "=== relay probe-gate ($(date -u +%H:%M)) ==="
python tools/probe_relay.py 1800 || { echo "relay dead; aborting"; exit 1; }

CKROOT=model_checkpoints/fullclip_r5
mkdir -p "$CKROOT"
# seed the resume scan with the committed best policy if the root is empty
if ! ls "$CKROOT"/*/state/* >/dev/null 2>&1; then
  mkdir -p "$CKROOT/seed/state"
  cp -r checkpoints_keep/13fcbe84/state_230809600 "$CKROOT/seed/state/230809600"
  echo "seeded resume root from checkpoints_keep/13fcbe84 (230M best)"
fi

DEADLINE=$(( $(date +%s) + ${WALL_SECONDS:-10800} ))
cycle=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  cycle=$((cycle + 1))
  left=$(( DEADLINE - $(date +%s) ))
  budget=$(( left < ${CYCLE_SECONDS:-3600} ? left : ${CYCLE_SECONDS:-3600} ))
  [ "$budget" -lt 600 ] && break
  echo "=== final-fullclip cycle $cycle (${budget}s left-slice, $(date -u +%H:%M)) ==="
  CKPT_ROOT=$CKROOT ATTEMPT_SECONDS=$budget ATTEMPTS=1 \
  timeout -k 30 $((budget + 120)) tools/train_resilient.sh \
    env.name=rodent \
    train.task_name=rodent_fullclip_r5 \
    train.checkpoint_dir=$CKROOT \
    train.episode_length=245 \
    env.env_args.sub_clip_length=240 \
    env.env_args.min_sub_clip_length=60 \
    train.num_envs=1024 \
    train.eval_every=20000000 \
    train.num_timesteps=3000000000 \
    train.render_eval=false 2>&1 \
    | grep --line-buffered -v WARNING \
    | tee -a logs/train_r5_fullclip_final.log | tail -3
  tools/collect_r5_artifacts.sh $CKROOT
  git commit -q -m "Keeper: final-fullclip cycle $cycle checkpoint" \
    -- checkpoints_keep logs 2>/dev/null || true
done
echo "=== final-fullclip campaign done ($(date -u +%H:%M)) ==="
