#!/bin/bash
# Round-5 plateau probe battery (VERDICT r4 #3): 4 sequential ~20M-step
# variants resumed from the committed r4 multiclip checkpoint (80.8M steps,
# eval episode length plateaued at ~39, reward 0.46).  Pick the knob by
# eval length/reward slope; feed the winner into the long runs.
#   P0 control   — unchanged hyperparameters (isolates the +20M effect)
#   P1 kl        — kl_weight 1e-4 -> 1e-3 (stronger imitation prior)
#   P2 term      — termination_threshold 5 -> 2 (tighter tracking gate)
#   P3 horizon   — min_sub_clip_length 5 -> 30 (curriculum floor raised)
# All stages share episode_length=120 (the full 125-frame clip horizon) so
# eval lengths are comparable; each under timeout -k (orbax threads swallow
# SIGTERM, ADVICE r4) and strictly sequential (one TPU client).
set -u
cd "$(dirname "$0")/.."
# Probe-gate: after ANY killed TPU client the next client's first compile
# absorbs minutes of relay-session cleanup (round-5 finding: a train.py
# launched right after a kill wedged at 0 CPU for 20+ min).  A throwaway
# probe takes the hit instead, so training starts on a verified relay.
echo "=== relay probe-gate ($(date -u +%H:%M)) ==="
python tools/probe_relay.py 1800 || { echo "relay dead; aborting"; exit 1; }
CKPT=$(readlink -f checkpoints_keep/multiclip_c52586f1/state_80855040)
COMMON=(env.name=rodent_multiclip env.env_args.clip_length=125
        env.env_args.sub_clip_length=100 env.env_args.min_sub_clip_length=5
        train.episode_length=120 train.num_envs=1024
        train.eval_every=5000000 train.num_timesteps=101000000
        train.render_eval=false
        train.checkpoint_dir=model_checkpoints/probes_r5
        "train.restore_checkpoint=$CKPT")

run() { # name extra-overrides...
  name=$1; shift
  echo "=== probe $name ($(date -u +%H:%M)) ==="
  timeout -k 30 "${PROBE_SECONDS:-1500}" python train.py "${COMMON[@]}" \
    train.task_name="probe_$name" "$@" 2>&1 \
    | grep --line-buffered -v WARNING | tee "logs/probe_r5_$name.log" | tail -6
}

run P0_control
run P1_kl train.kl_weight=0.001
run P2_term env.env_args.termination_threshold=2
run P3_horizon env.env_args.min_sub_clip_length=30
echo "=== probes done ($(date -u +%H:%M)) ==="
