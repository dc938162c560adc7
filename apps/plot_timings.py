#!/usr/bin/env python
"""Timing analysis plots from Timer CSV dumps — the reference's
`result/plot_time_usage.py` / `plot_bar_time_by_step.py` role.

Input: one or more CSVs written by `utils.timer.Timer.dump_into_file`
(one column per stage, one row per frame). Outputs, per the data's job:
  - `<out>_stages.png`: mean per-stage time as a horizontal bar chart —
    magnitude of one measure, so a single hue (no categorical rainbow);
    when comparing runs (2-4 CSVs), grouped bars in a fixed
    colorblind-safe order with a legend.
  - `<out>_perframe.png`: per-frame total time over the sequence, one line
    per run (same fixed series order), single y-axis.

Usage: python apps/plot_timings.py run_a.csv [run_b.csv ...] --out timings
"""

import argparse
import csv
import os
import sys

import numpy as np

# fixed series order, colorblind-safe (blue/orange/teal/rose); magnitude-only
# charts use just the first hue
SERIES_COLORS = ["#5778a4", "#e49444", "#3c9b8f", "#c26b84"]
INK = "#333333"
MUTED = "#777777"
GRID = "#dddddd"


def read_timer_csv(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    names = rows[0]
    cols = {n: [] for n in names}
    for row in rows[1:]:
        for n, v in zip(names, row):
            if v:
                cols[n].append(float(v))
    return {n: np.asarray(v) for n, v in cols.items() if len(v)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+", help="Timer.dump_into_file CSVs (<= 4 runs)")
    ap.add_argument("--out", default="timings", help="output path prefix")
    ap.add_argument("--labels", default="", help="comma-separated run labels")
    args = ap.parse_args()
    if len(args.csvs) > 4:
        sys.exit("compare at most 4 runs (fold the rest into separate figures)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = [read_timer_csv(p) for p in args.csvs]
    labels = args.labels.split(",") if args.labels else [
        os.path.splitext(os.path.basename(p))[0] for p in args.csvs
    ]

    # ---- per-stage mean bars ----
    stages = sorted({n for r in runs for n in r}, key=lambda n: -max(np.mean(r[n]) for r in runs if n in r))
    y = np.arange(len(stages), dtype=float)
    fig, ax = plt.subplots(figsize=(8, 0.5 * len(stages) + 1.6))
    h = 0.7 / len(runs)
    for i, (run, lab) in enumerate(zip(runs, labels)):
        means = [float(np.mean(run[n])) if n in run else 0.0 for n in stages]
        bars = ax.barh(y + (i - (len(runs) - 1) / 2) * h, means, height=h * 0.9,
                       color=SERIES_COLORS[i], label=lab, zorder=3)
        # selective direct labels: the largest stage per run only
        j = int(np.argmax(means))
        ax.text(means[j], y[j] + (i - (len(runs) - 1) / 2) * h, f" {means[j]:.2f} ms",
                va="center", fontsize=8, color=INK)
    ax.set_yticks(y)
    ax.set_yticklabels(stages, fontsize=9, color=INK)
    ax.invert_yaxis()
    ax.set_xlabel("mean time per call (ms)", color=INK)
    ax.xaxis.grid(True, color=GRID, zorder=0)
    for s in ("top", "right", "left"):
        ax.spines[s].set_visible(False)
    ax.tick_params(colors=MUTED)
    if len(runs) > 1:
        ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(f"{args.out}_stages.png", dpi=130)
    print(f"wrote {args.out}_stages.png")

    # ---- per-frame total over the sequence ----
    fig, ax = plt.subplots(figsize=(8, 3.2))
    for i, (run, lab) in enumerate(zip(runs, labels)):
        rows = min(len(v) for v in run.values())
        total = np.sum(np.stack([v[:rows] for v in run.values()]), axis=0)
        ax.plot(total, color=SERIES_COLORS[i], lw=1.5, label=lab)
        fps = 1e3 / max(float(np.mean(total)), 1e-9)
        ax.annotate(f"{lab}: {fps:.1f} fps mean", xy=(rows - 1, total[-1]),
                    fontsize=8, color=INK, ha="right", xytext=(0, 6), textcoords="offset points")
    ax.set_xlabel("frame", color=INK)
    ax.set_ylabel("total time per frame (ms)", color=INK)
    ax.yaxis.grid(True, color=GRID, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.tick_params(colors=MUTED)
    if len(runs) > 1:
        ax.legend(frameon=False)
    fig.tight_layout()
    fig.savefig(f"{args.out}_perframe.png", dpi=130)
    print(f"wrote {args.out}_perframe.png")


if __name__ == "__main__":
    main()
