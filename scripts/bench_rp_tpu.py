#!/usr/bin/env python
"""Time create/verify rangeproof on TPU at reference dims.

Usage: python scripts/bench_rp_tpu.py [d] [n_partition] [reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rofl_tpu.utils.cache import setup_cache
setup_cache()

from rofl_tpu.crypto import pedersen
from rofl_tpu.crypto import range_proof_vec as rpv
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import sc


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    n_part = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    fp = FpConfig(16, 7)
    rng = np.random.default_rng(11)
    lo, hi = fp.clip_bounds(8)
    vals = rng.uniform(lo, hi, d).astype(np.float32)
    blind = [int(x) for x in
             sc.unpack_scalars(pedersen.rnd_scalar_limbs(d, rng))]

    t0 = time.time()
    proofs, commits = rpv.create_rangeproof(vals, blind, fp, 8, n_part, rng)
    print(f"create d={d} part={n_part} compile+1: {time.time()-t0:.1f}s",
          flush=True)
    for _ in range(reps):
        t0 = time.time()
        proofs, commits = rpv.create_rangeproof(vals, blind, fp, 8, n_part,
                                                rng)
        print(f"create: {time.time()-t0:.2f}s", flush=True)

    t0 = time.time()
    ok = rpv.verify_rangeproof(proofs, commits, fp, 8, rng)
    print(f"verify compile+1: ok={ok} {time.time()-t0:.1f}s", flush=True)
    assert ok
    for _ in range(reps):
        t0 = time.time()
        ok = rpv.verify_rangeproof(proofs, commits, fp, 8, rng)
        print(f"verify: ok={ok} {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
