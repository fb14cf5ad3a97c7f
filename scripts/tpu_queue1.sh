#!/bin/bash
# Serial TPU job queue — never run two TPU processes at once, and never
# kill one mid-compile (it wedges the remote compile helper for ~1 h).
set -x
cd /root/repo
python scripts/bench_rp_tpu.py 32768 16 2
python bench.py
