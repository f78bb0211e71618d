"""In-program throughput report from run metrics (VERDICT r4 #6).

Reads metrics JSONL(s) and reports the distribution of training/sps over
eval intervals, excluding the first interval (compile warm-up).  Only
training/sps is trustworthy in-program: it is derived from wall time
between interval boundaries, each closed by a device_get of the interval's
stats (a VALUE readback, which the axon relay cannot fake —
block_until_ready can; CLAUDE.md round-4).  eval/sps is relay-async and
untrusted.

Usage: python tools/sps_report.py metrics.jsonl [more.jsonl ...]
"""

import json
import sys

import numpy as np

rows = []
for path in sys.argv[1:]:
    for line in open(path):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "training/sps" in r:
            rows.append((path, r.get("_step", r.get("step", 0)),
                         float(r["training/sps"])))

if not rows:
    print("no training/sps rows found")
    sys.exit(1)

by_file = {}
for path, step, sps in rows:
    by_file.setdefault(path, []).append((step, sps))

all_steady = []
for path, pts in by_file.items():
    pts.sort()
    steady = [s for _, s in pts[1:]] or [pts[0][1]]
    all_steady.extend(steady)
    print(f"{path}: n={len(pts)} first={pts[0][1]:.0f} "
          f"steady median={np.median(steady):.0f} "
          f"min={min(steady):.0f} max={max(steady):.0f}")

print(f"\nOVERALL steady training/sps: median={np.median(all_steady):.0f} "
      f"mean={np.mean(all_steady):.0f} n={len(all_steady)} "
      f"(intervals after the first of each attempt)")
