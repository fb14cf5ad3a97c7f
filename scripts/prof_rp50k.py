#!/usr/bin/env python
"""Focused ROFL_TIMING profile of the d=50k chunk-batched range-proof
prover (the 38 s pole of the L2 headline) — one warm pass, then timed
reps with per-phase device-sync ticks. Usage:
  ROFL_TIMING=1 python scripts/prof_rp50k.py [d] [n_partition] [reps]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rofl_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rofl_tpu.crypto import pedersen  # noqa: E402
from rofl_tpu.crypto import range_proof_vec as rpv  # noqa: E402
from rofl_tpu.crypto.fp_codec import FpConfig  # noqa: E402


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    fp = FpConfig(16, 7)
    rng = np.random.default_rng(7)
    lo, hi = fp.clip_bounds(8)
    vals = (rng.uniform(lo, hi, d) * 0.5).astype(np.float32)
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))

    t0 = time.time()
    rpv.create_rangeproof(vals, np.asarray(blind), fp, 8, parts, rng)
    print(f"== warm pass: {time.time() - t0:.1f}s", flush=True)
    for i in range(reps):
        t0 = time.time()
        rpv.create_rangeproof(vals, np.asarray(blind), fp, 8, parts, rng)
        print(f"== rep {i}: {time.time() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
