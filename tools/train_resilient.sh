#!/bin/bash
# Retry-on-fault training driver: on a TPU device fault, restart train.py
# resuming from the newest full-TrainingState checkpoint across runs.
# Usage: tools/train_resilient.sh <train.py overrides...>
set -u
ATTEMPTS=${ATTEMPTS:-20}
for i in $(seq 1 "$ATTEMPTS"); do
  RESTORE=$(CKPT_ROOT="${CKPT_ROOT:-model_checkpoints}" python - <<'PY'
import os
root = os.environ.get("CKPT_ROOT", "model_checkpoints")
best, best_step = "", -1
if os.path.isdir(root):
    for run in os.listdir(root):
        st = os.path.join(root, run, "state")
        if not os.path.isdir(st):
            continue
        for name in os.listdir(st):
            base = name.removesuffix(".msgpack")
            if base.isdigit() and int(base) > best_step:
                best_step = int(base)
                best = os.path.join(st, name)
print(os.path.abspath(best) if best else "")
PY
)
  EXTRA=()
  if [ -n "$RESTORE" ]; then
    EXTRA=("train.restore_checkpoint=$RESTORE")
    echo "=== attempt $i: resuming from $RESTORE ===" >&2
  else
    echo "=== attempt $i: fresh start ===" >&2
  fi
  # per-attempt watchdog: TPU faults sometimes manifest as silent hangs,
  # not crashes; bounded attempts + full-state resume keep net progress
  timeout -k 30 "${ATTEMPT_SECONDS:-2400}" python train.py "$@" "${EXTRA[@]}"
  rc=$?
  [ "$rc" -eq 0 ] && exit 0
  echo "=== attempt $i ended (rc=$rc); retrying ===" >&2
  sleep 15
done
exit 1
