#!/usr/bin/env python
"""Micro-bench kernel window widths on the real TPU:
  * windowed-Horner MSM at w ∈ {2, 4} (ROFL_MSM_W)
  * per-lane scalar_mul at W ∈ {1, 4} (ROFL_SMUL_W)
  * fixed-base mul: MXU one-hot vs gather formulation
Each validated bit-exact against the spec path on small N first.
Set the env var BEFORE running; this script benches the CURRENT setting.
  ROFL_MSM_W=4 ROFL_SMUL_W=4 python scripts/bench_w_tpu.py [N]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rofl_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rofl_tpu.crypto import pedersen  # noqa: E402
from rofl_tpu.ops import curve, fixed_base, kernels  # noqa: E402


def sync(arrs):
    for a in arrs:
        np.asarray(a[..., :1])


def timeit(label, fn, reps=3):
    out = fn()
    sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        sync(out)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    msm_w = os.environ.get("ROFL_MSM_W", "2")
    smul_w = os.environ.get("ROFL_SMUL_W", "4")
    rng = np.random.default_rng(5)
    ks = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    kp = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    P = pedersen.base_B().mul(kp)
    sync(tuple(P))

    # correctness spot-check at 512 lanes vs the ladder+tree path
    Ps = curve.PointArray(*[c[:, :512] for c in P])
    kss = ks[:, :512]
    got = curve.compress_to_bytes(
        curve.PointArray(*kernels.msm_flat(tuple(Ps), kss)))
    want = curve.compress_to_bytes(
        curve.tree_sum(curve.scalar_mul(Ps, kss)))
    assert np.array_equal(np.asarray(got), np.asarray(want)), "msm mismatch"
    print(f"msm w={msm_w} correctness OK", flush=True)

    t = timeit(f"msm_flat w={msm_w} N={N}",
               lambda: kernels.msm_flat(tuple(P), ks))
    print(f"  -> {N/t/1000:.0f}k terms/s", flush=True)
    t = timeit(f"scalar_mul W={smul_w} N={N}",
               lambda: kernels.scalar_mul(tuple(P), ks))
    print(f"  -> {N/t/1000:.0f}k lanes/s", flush=True)
    t = timeit(f"fixed_base mul N={N}",
               lambda: tuple(pedersen.base_B().mul(ks)))
    print(f"  -> {N/t/1000:.0f}k lanes/s", flush=True)


if __name__ == "__main__":
    main()
