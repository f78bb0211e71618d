"""Learning-curve plot for a training run's metrics JSONL.

Two stacked panels (never dual-axis): eval episode reward and eval episode
length over environment steps.  Single series per panel, direct panel
titles, recessive grid.

Usage: python tools/plot_run.py [metrics.jsonl[,more.jsonl,...]] [out.png]
Multiple comma-separated JSONLs are stitched by step (resilient-trainer
attempts each open a fresh run id; rows are merged and sorted, later
files win on duplicate steps).
"""

import json
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def latest_metrics():
    files = sorted(
        (f for f in os.listdir("logs") if f.startswith("metrics_")),
        key=lambda f: os.path.getmtime(os.path.join("logs", f)))
    return os.path.join("logs", files[-1])


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else latest_metrics()
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/learning_curve.png"
    by_step = {}
    for i, p in enumerate(path.split(",")):
        for line in open(p):
            d = json.loads(line)
            if "eval/episode_reward" in d:
                by_step[d.get("_step", len(by_step))] = (
                    d["eval/episode_reward"],
                    d.get("eval/avg_episode_length", 0.0))
    if not by_step:
        raise SystemExit(f"no eval rows in {path}")
    steps = sorted(by_step)
    reward = [by_step[s][0] for s in steps]
    length = [by_step[s][1] for s in steps]
    # fall back to eval index when steps weren't logged per row
    if all(s == steps[0] for s in steps):
        steps = list(range(len(reward)))
        xlabel = "eval #"
    else:
        steps = [s / 1e6 for s in steps]
        xlabel = "env steps (millions)"

    ink, muted = "#1f2430", "#8a8f98"
    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(7, 5.2), sharex=True)
    for ax, ys, title, color in (
            (ax1, reward, "eval episode reward", "#2f6fd6"),
            (ax2, length, "eval episode length (steps tracked)",
             "#1a8a7a")):
        ax.plot(steps, ys, color=color, linewidth=2)
        ax.set_title(title, loc="left", fontsize=11, color=ink)
        ax.grid(True, color="#e4e6ea", linewidth=0.8)
        ax.tick_params(colors=muted, labelsize=9)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#c9ccd2")
    ax2.set_xlabel(xlabel, color=muted, fontsize=10)
    fig.suptitle(os.path.basename(path), fontsize=10, color=muted, x=0.99,
                 ha="right")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print("wrote", out)


if __name__ == "__main__":
    main()
