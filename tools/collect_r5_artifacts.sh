#!/bin/bash
# Round-5 artifact collector (VERDICT r4 #8): copies run metrics/logs into
# logs/ AND — the part round 4 lacked — copies the newest full-TrainingState
# checkpoint of each named run into checkpoints_keep/ and git-adds it, so a
# container wipe can never again delete the program's best policy (the r3
# 183M-step checkpoint was lost exactly that way).
# Usage: tools/collect_r5_artifacts.sh [run_root ...]
#   run_root: directories holding model_checkpoints/<run_id>/state/<step>
#             (default: ./model_checkpoints and /tmp/run5*/model_checkpoints)
set -u
cd "$(dirname "$0")/.."

roots=("$@")
if [ ${#roots[@]} -eq 0 ]; then
  roots=(model_checkpoints)
  for d in /tmp/run5*/model_checkpoints; do
    [ -d "$d" ] && roots+=("$d")
  done
fi

# metrics from /tmp sandboxes
for d in /tmp/run5*/logs; do
  [ -d "$d" ] || continue
  cp -n "$d"/metrics_*.jsonl logs/ 2>/dev/null
done

python - "${roots[@]}" <<'PY'
import os
import shutil
import sys

kept = []
for root in sys.argv[1:]:
    if not os.path.isdir(root):
        continue
    for run in sorted(os.listdir(root)):
        st = os.path.join(root, run, "state")
        if not os.path.isdir(st):
            continue
        steps = [int(n) for n in os.listdir(st) if n.isdigit()]
        if not steps:
            continue
        best = max(steps)
        src = os.path.join(st, str(best))
        dst = os.path.join("checkpoints_keep", f"{run}", f"state_{best}")
        if os.path.isdir(dst):
            continue
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(src, dst)
        kept.append(dst)
        print(f"kept {src} -> {dst}", flush=True)
if not kept:
    print("no new checkpoints to keep", flush=True)
PY

git add -A checkpoints_keep/ logs/ 2>/dev/null
git status --short checkpoints_keep/ | head
echo "collect_r5_artifacts done; COMMIT the staged keeper checkpoints now"
