#!/bin/bash
# Round-5 single-clip full-horizon run (VERDICT r4 #2): groom clip with a
# STAGED horizon curriculum — the log-uniform sub-clip floor rises across
# resumes (10 -> 60 -> 120), shifting training mass onto long horizons once
# short-horizon tracking is learned.  episode_length=245 so EVAL episodes
# can run the whole 250-frame clip (r3 capped eval at 150 and the target is
# eval length >= 150/244, reward >= 1.5).
#
# Each stage resumes from the newest full-TrainingState checkpoint via
# train_resilient.sh.  After EVERY stage, collect_r5_artifacts.sh copies
# the newest checkpoint into checkpoints_keep/ (round 4 lost the program's
# best policy to a container wipe; never again).
#
# Env: STAGE_SECONDS per stage wall budget (default 4200), STAGES list.
set -u
cd "$(dirname "$0")/.."
# Probe-gate: after ANY killed TPU client the next client's first compile
# absorbs minutes of relay-session cleanup (round-5 finding: a train.py
# launched right after a kill wedged at 0 CPU for 20+ min).  A throwaway
# probe takes the hit instead, so training starts on a verified relay.
echo "=== relay probe-gate ($(date -u +%H:%M)) ==="
python tools/probe_relay.py 1800 || { echo "relay dead; aborting"; exit 1; }

# task-scoped checkpoint root: the resilient resume scan must never pick
# up a checkpoint from another campaign (e.g. the multiclip probes)
CKROOT=model_checkpoints/fullclip_r5
COMMON=(env.name=rodent
        train.task_name=rodent_fullclip_r5
        train.checkpoint_dir=$CKROOT
        train.episode_length=245
        env.env_args.sub_clip_length=240
        train.num_envs=1024
        train.eval_every=20000000
        train.render_eval=false)

stage() { # msl num_timesteps
  msl=$1; nt=$2
  echo "=== single-clip stage msl=$msl -> ${nt} steps ($(date -u +%H:%M)) ==="
  CKPT_ROOT=$CKROOT ATTEMPT_SECONDS="${STAGE_ATTEMPT:-2400}" ATTEMPTS=4 \
  timeout -k 30 "${STAGE_SECONDS:-4200}" tools/train_resilient.sh \
    "${COMMON[@]}" \
    env.env_args.min_sub_clip_length="$msl" \
    train.num_timesteps="$nt" 2>&1 \
    | grep --line-buffered -v WARNING | tee -a logs/train_r5_fullclip.log | tail -4
  tools/collect_r5_artifacts.sh $CKROOT
}

stage 10 120000000
stage 60 220000000
stage 120 320000000
echo "=== single-clip schedule done ($(date -u +%H:%M)) ==="
