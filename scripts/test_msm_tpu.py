#!/usr/bin/env python
"""Validate + time the bit-plane Horner MSM kernel vs the ladder path on
the real TPU. Timing forces sync via host transfer (axon tunnel's
block_until_ready does not wait)."""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rofl_tpu.utils.cache import setup_cache
setup_cache()

from rofl_tpu.crypto import pedersen
from rofl_tpu.ops import curve, kernels
from rofl_tpu.ops.curve import PointArray


def canon(p):
    if not isinstance(p, PointArray):
        p = PointArray(*p)
    return curve.compress_to_bytes(p)


def main():
    rng = np.random.default_rng(5)
    N = 4096
    ks = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    kp = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    P = pedersen.base_B().mul(kp)
    jax.block_until_ready(P.x)

    t0 = time.time()
    got = canon(kernels.msm_flat(tuple(P), ks))
    print(f"msm_flat compile+run {time.time()-t0:.1f}s", flush=True)
    want = canon(curve.tree_sum(curve.scalar_mul(P, ks)))
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"msm_flat@{N}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        raise SystemExit(1)

    g = kernels.msm_groups(tuple(P), ks, 1024)
    wantg = curve.tree_sum_groups(curve.scalar_mul(P, ks), 1024)
    okg = np.array_equal(np.asarray(canon(g)), np.asarray(canon(wantg)))
    print(f"msm_groups@{N}/1024: {'OK' if okg else 'MISMATCH'}", flush=True)
    if not okg:
        raise SystemExit(1)

    # odd (padded) size
    P3 = PointArray(*[c[:, :3000] for c in P])
    got3 = canon(kernels.msm_flat(tuple(P3), ks[:, :3000]))
    want3 = canon(curve.tree_sum(curve.scalar_mul(P3, ks[:, :3000])))
    print(f"msm_flat@3000(pad): "
          f"{'OK' if np.array_equal(np.asarray(got3), np.asarray(want3)) else 'MISMATCH'}",
          flush=True)

    # timing at 2^18 lanes (the verify mega-MSM scale at d=32768)
    NB = 1 << 18
    kb = jnp.asarray(pedersen.rnd_scalar_limbs(NB, rng))
    kb2 = jnp.asarray(pedersen.rnd_scalar_limbs(NB, rng))
    PB = pedersen.base_B().mul(kb)
    _ = np.asarray(PB.x[:1, :1])
    PBt = tuple(PB)

    t0 = time.time()
    r = kernels.msm_flat(PBt, kb2)
    _ = np.asarray(r[0][:1, :1])
    comp = time.time() - t0
    reps = 3
    t0 = time.time()
    for _i in range(reps):
        r = kernels.msm_flat(PBt, kb2)
        _ = np.asarray(r[0][:1, :1])
    dt = (time.time() - t0) / reps
    print(f"msm_flat@262k: {dt*1e3:.1f} ms (compile+1 {comp:.1f}s) "
          f"-> {NB/dt/1e6:.1f} M terms/s", flush=True)

    t0 = time.time()
    r = kernels.tree_sum(kernels.scalar_mul(PBt, kb2))
    _ = np.asarray(r[0][:1, :1])
    comp = time.time() - t0
    t0 = time.time()
    for _i in range(reps):
        r = kernels.tree_sum(kernels.scalar_mul(PBt, kb2))
        _ = np.asarray(r[0][:1, :1])
    dt = (time.time() - t0) / reps
    print(f"ladder-msm@262k: {dt*1e3:.1f} ms (compile+1 {comp:.1f}s) "
          f"-> {NB/dt/1e6:.1f} M terms/s", flush=True)


if __name__ == "__main__":
    main()
