#!/bin/bash
# Collect round-4 run artifacts from the /tmp run sandboxes into logs/.
set -u
cd "$(dirname "$0")/.."

# all rodent-run metrics (resilient attempts each have a run id)
for f in /tmp/run4/logs/metrics_*.jsonl /tmp/run4_code/logs/metrics_*.jsonl \
         /tmp/run4_code2/logs/metrics_*.jsonl; do
  [ -f "$f" ] || continue
  base=$(basename "$f")
  case "$base" in
    # skip pre-round-4 files that were snapshotted in from the repo
    metrics_1f677a16.jsonl|metrics_077764b1.jsonl|metrics_3af5eade.jsonl|\
    metrics_aa868421.jsonl|metrics_27213b52.jsonl|metrics_4766e61b.jsonl|\
    metrics_humanoid_cpu.jsonl|metrics_a*.jsonl|metrics_b*.jsonl|\
    metrics_d8*.jsonl|metrics_ed*.jsonl|metrics_f8*.jsonl|metrics_6*.jsonl|\
    metrics_4c*.jsonl|metrics_76*.jsonl) continue ;;
  esac
  cp -n "$f" logs/ 2>/dev/null || cp "$f" logs/
done

# stitched learning curve over every round-4 rodent attempt, in step order
files=$(python - <<'EOF'
import glob, json, os
out = []
for f in sorted(set(glob.glob('/tmp/run4/logs/metrics_*.jsonl')
                    + glob.glob('/tmp/run4_code/logs/metrics_*.jsonl')
                    + glob.glob('/tmp/run4_code2/logs/metrics_*.jsonl'))):
    try:
        first = json.loads(open(f).readline())
    except Exception:
        continue
    cfg = first.get('_config', {})
    if cfg.get('train', {}).get('task_name') != 'rodent_tpu':
        continue
    if cfg.get('train', {}).get('checkpoint_dir', '').startswith('/tmp/run4') \
       or cfg.get('train', {}).get('checkpoint_dir', '') == 'model_checkpoints':
        out.append(f)
print(','.join(out))
EOF
)
echo "curve inputs: $files"
[ -n "$files" ] && python tools/plot_run.py "$files" logs/curve_r4_rodent.png

# newest overlay gif + diag plot from the rodent run
new_gif=$(ls -t /tmp/run4/model_checkpoints/*/rollout_*.gif 2>/dev/null | head -1)
[ -n "${new_gif:-}" ] && cp "$new_gif" logs/rollout_r4_rodent.gif
new_diag=$(ls -t /tmp/run4/model_checkpoints/*/diag_*.png 2>/dev/null | head -1)
[ -n "${new_diag:-}" ] && cp "$new_diag" logs/diag_r4_rodent.png
ls -la logs/ | tail -8
