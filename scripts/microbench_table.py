#!/usr/bin/env python
"""Summarize benchmarks/*.bench (reference `.bench` format: integer ms per
sample line) into benchmarks/MICRO_r5.md with a baseline column
(BASELINE.md c5d.4xlarge rows; linear d-scaling where the reference only
shipped d=524288)."""
import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# c5d.4xlarge seconds from BASELINE.md (measured reference data).
# Values given as {d: seconds}; "*" scales linearly from 524288.
BASE = {
    "create-rangeproof": {8192: 2.58, 32768: 10.27, 131072: 41.07,
                          262144: 82.69, 524288: 166.00},
    "create-rangeproof-part36": {524288: 165.97},
    "verify-rangeproof": {32768: 0.72, 524288: 11.70},
    "verify-rangeproof-part36": {32768: 0.72, 524288: 11.70},
    "create-randproof": {32768: 1.22, 524288: 19.43},
    "verify-randproof": {524288: 10.35},
    "create-compressedrandproof": {32768: 0.61, 524288: 9.54},
    "verify-compressedrandproof": {524288: 9.00},
    "create-squarerandproof": {32768: 1.99, 524288: 33.38},
    "verify-squarerandproof": {524288: 17.21},
    "create-squareproof": {524288: 20.41},
    "verify-squareproof": {524288: 12.41},
    "create-rangeproof-l2": {524288: 0.165},
    "verify-rangeproof-l2": {524288: 0.0015},
    "bench_paper_addelgamal": {32768: 0.18, 524288: 2.87},
    "bench_paper_dlog2": {32768: 0.33, 524288: 0.63},
}


def baseline_for(name, d):
    rows = BASE.get(name)
    if not rows:
        return None
    if d in rows:
        return rows[d]
    ref_d = max(rows)
    return rows[ref_d] * d / ref_d


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "benchmarks")
    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, "*.bench"))):
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
        rows.append((name, d, mean_s, base,
                     round(base / mean_s, 2) if base else None, fn))

    lines = [
        "# Microbenchmark grid — TPU v5e vs reference CPU baseline",
        "",
        "TPU column: mean over samples in the committed `.bench` files "
        "(reference `util::create_bench_file` format, bench_suite.py). "
        "Baseline: c5d.4xlarge rows from BASELINE.md; rows marked ~ scale "
        "linearly from the d=524288 reference measurement.",
        "",
        "| benchmark | d | TPU s | baseline s | speedup | file |",
        "|---|---|---|---|---|---|",
    ]
    for name, d, mean_s, base, speed, fn in rows:
        approx = "~" if base and d not in BASE.get(name, {}) else ""
        lines.append(
            f"| {name} | {d} | {mean_s:.3f} | "
            f"{approx}{base:.3f} | {speed}x | {fn} |"
            if base else
            f"| {name} | {d} | {mean_s:.3f} | — | — | {fn} |")
    out = os.path.join(out_dir, "MICRO_r5.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
