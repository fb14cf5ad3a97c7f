#!/usr/bin/env python
"""Plotting pipeline — counterpart of the reference's `plots/` package
(plots/plots/microbenchmarks_cameraready.py, e2e_parse_benchlog.py):
renders the committed measurement artifacts into figures.

  figure 1  benchmarks/figs/microbench.svg
            TPU-vs-baseline speedup per microbenchmark, from the
            `.bench` files in benchmarks/ (reference util.rs:13-30
            format) and the BASELINE.md c5d.4xlarge rows.
  figure 2  benchmarks/figs/e2e_rounds.svg
            mean round time per crypto mode, from results/e2e_table.csv
            (counterpart of plots/data/e2e_table.csv).

Usage: python scripts/plot_results.py
"""
import csv
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from microbench_table import BASE, baseline_for  # noqa: E402

INK = "#333639"          # primary text ink
MUTED = "#73777b"        # secondary ink / grid
BAR = "#3b6ea5"          # single sequential hue (one series -> no legend)
SURFACE = "#ffffff"


def style_axes(ax):
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.tick_params(colors=INK, labelsize=9)
    ax.xaxis.grid(True, color="#e4e6e8", linewidth=0.8, zorder=0)
    ax.set_axisbelow(True)


def load_micro():
    import glob
    import re

    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "benchmarks",
                                              "*.bench"))):
        fn = os.path.basename(path)
        m = re.match(r"(.+?)-((?:\d+-)*)\((.+)\)\.bench", fn)
        if not m:
            continue
        name = m.group(1)
        parts = [p for p in m.group(2).split("-") if p]
        d = int(parts[-1])
        samples = [int(x) for x in open(path) if x.strip()]
        if not samples:
            continue
        mean_s = sum(samples) / len(samples) / 1000.0
        base = baseline_for(name, d)
        if base:
            rows.append((f"{name} d={d}", base / mean_s))
    return rows


def fig_micro(out):
    rows = load_micro()
    if not rows:
        print("no .bench files with baseline rows; skipping microbench fig")
        return
    rows.sort(key=lambda r: r[1])
    labels = [r[0] for r in rows]
    vals = [r[1] for r in rows]
    fig, ax = plt.subplots(figsize=(8, 0.38 * len(rows) + 1.2))
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.barh(range(len(rows)), vals, height=0.62, color=BAR, zorder=3)
    ax.axvline(1.0, color=MUTED, linewidth=1.0, linestyle="--", zorder=2)
    ax.set_yticks(range(len(rows)), labels)
    ax.set_xscale("log")
    ax.set_xlabel("speedup vs c5d.4xlarge AVX2 baseline (log)", color=INK,
                  fontsize=9)
    ax.set_title("rofl_tpu microbenchmarks — TPU v5e vs reference CPU",
                 color=INK, fontsize=11, loc="left")
    for i, v in enumerate(vals):
        ax.text(v * 1.08, i, f"{v:.2f}x", va="center", color=INK, fontsize=8)
    style_axes(ax)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


def fig_e2e(out):
    path = os.path.join(REPO, "results", "e2e_table.csv")
    if not os.path.exists(path):
        print("no results/e2e_table.csv; skipping e2e fig")
        return
    with open(path) as f:
        rows = list(csv.DictReader(f))
    labels = [r["mode"] for r in rows]
    vals = [float(r["mean_round_ms"]) / 1000.0 for r in rows]
    fig, ax = plt.subplots(figsize=(6, 0.5 * len(rows) + 1.2))
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)
    ax.barh(range(len(rows)), vals, height=0.58, color=BAR, zorder=3)
    ax.set_yticks(range(len(rows)), labels)
    ax.set_xlabel("mean client round time (s)", color=INK, fontsize=9)
    ax.set_title("e2e round time per crypto mode", color=INK, fontsize=11,
                 loc="left")
    for i, v in enumerate(vals):
        ax.text(v * 1.02, i, f"{v:.1f}s", va="center", color=INK, fontsize=8)
    style_axes(ax)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")


def main():
    figs = os.path.join(REPO, "benchmarks", "figs")
    os.makedirs(figs, exist_ok=True)
    fig_micro(os.path.join(figs, "microbench.svg"))
    fig_e2e(os.path.join(figs, "e2e_rounds.svg"))


if __name__ == "__main__":
    main()
