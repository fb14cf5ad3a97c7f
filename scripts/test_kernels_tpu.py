#!/usr/bin/env python
"""Validate + time the Pallas kernels vs the jnp ops on the real TPU.

NB: block_until_ready through the axon tunnel does NOT actually wait, so
all timing here chains dispatches through data dependencies and forces a
final np.asarray transfer.
"""

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
from rofl_tpu.ops import curve, kernels, sc
from rofl_tpu.ops.curve import PointArray


def canon_pt(p):
    if not isinstance(p, PointArray):
        p = PointArray(*p)
    return curve.compress_to_bytes(p)


def check(name, got, want):
    ok = np.array_equal(np.asarray(got), np.asarray(want))
    print(f"{name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        raise SystemExit(f"{name} mismatch")


def chain_pt(name, fn, p, iters, work):
    """fn: (pt_tuple) -> pt_tuple; chained through the x coord."""
    t0 = time.time()
    r = fn(p)
    _ = np.asarray(r[0][:1, :1])
    comp = time.time() - t0
    t0 = time.time()
    r = p
    for _ in range(iters):
        r = fn(r)
    _ = np.asarray(r[0][:1, :1])
    dt = time.time() - t0
    print(f"{name}: {dt/iters*1e3:.2f} ms/iter (compile+1 {comp:.1f}s) "
          f"-> {work*iters/dt/1e6:.1f} M/s", flush=True)


def main():
    rng = np.random.default_rng(1)
    N = 2048
    ks = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    ks2 = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    P = pedersen.base_B().mul(ks)
    Q = pedersen.base_H().mul(ks2)
    jax.block_until_ready(P.x)

    # correctness at N=2048
    check("point_add", canon_pt(kernels.point_add(tuple(P), tuple(Q))),
          canon_pt(curve.add(P, Q)))
    check("point_double", canon_pt(kernels.point_double(tuple(P))),
          canon_pt(curve.double(P)))
    check("scalar_mul", canon_pt(kernels.scalar_mul(tuple(P), ks2)),
          canon_pt(curve.scalar_mul(P, ks2)))
    check("tree_sum", canon_pt(kernels.tree_sum(tuple(P))),
          canon_pt(curve.tree_sum(P)))
    check("sc_mul", np.asarray(kernels.sc_mul(ks, ks2)),
          np.asarray(sc.mul(ks, ks2)))
    check("sc_sum", np.asarray(kernels.sc_sum(ks)),
          np.asarray(sc.sum_reduce(ks, axis=0)))
    k_one = ks2[:, :1]
    check("shared_scalar_mul",
          canon_pt(kernels.shared_scalar_mul(tuple(P), k_one)),
          canon_pt(curve.scalar_mul(P, jnp.broadcast_to(k_one, (16, N)))))

    # odd size (padding path)
    P3 = PointArray(*[c[:, :300] for c in P])
    check("tree_sum_odd", canon_pt(kernels.tree_sum(tuple(P3))),
          canon_pt(curve.tree_sum(P3)))
    zero_k = jnp.zeros((16, 4), jnp.uint32)
    check("scalar_mul_zero",
          canon_pt(kernels.scalar_mul(
              tuple(PointArray(*[c[:, :4] for c in P])), zero_k)),
          canon_pt(curve.identity((4,))))

    # timing at larger N (chained)
    NB = 1 << 18
    kb = jnp.asarray(pedersen.rnd_scalar_limbs(NB, rng))
    kb2 = jnp.asarray(pedersen.rnd_scalar_limbs(NB, rng))
    PB = pedersen.base_B().mul(kb)
    QB = tuple(pedersen.base_H().mul(kb2))
    jax.block_until_ready(PB.x)
    PBt = tuple(PB)

    chain_pt("point_add@262k",
             lambda p: kernels.point_add(p, QB), PBt, 10, NB)
    chain_pt("point_double@262k", kernels.point_double, PBt, 10, NB)
    chain_pt("scalar_mul@262k",
             lambda p: kernels.scalar_mul(p, kb2), PBt, 2, NB)
    chain_pt("shared_mul@262k",
             lambda p: kernels.shared_scalar_mul(p, kb2[:, :1]), PBt, 2, NB)

    def msm_once(p):
        s = kernels.tree_sum(kernels.scalar_mul(p, kb2))
        # broadcast result back so the chain keeps shape
        return tuple(jnp.broadcast_to(c, (16, NB)) for c in s)

    chain_pt("msm@262k(ladder+sum)", msm_once, PBt, 2, NB)

    t0 = time.time()
    r = kernels.tree_sum(PBt)
    _ = np.asarray(r[0][:1, :1])
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        r = kernels.tree_sum(PBt)
    _ = np.asarray(r[0][:1, :1])
    print(f"tree_sum@262k: {(time.time()-t0)/5*1e3:.2f} ms "
          f"(compile+1 {comp:.1f}s)", flush=True)

    # msm correctness vs naive at 2048
    got = kernels.tree_sum(kernels.scalar_mul(tuple(P), ks2))
    from rofl_tpu.ops import msm as msm_mod
    check("msm_correct", canon_pt(got), canon_pt(msm_mod.msm(P, ks2)))


if __name__ == "__main__":
    main()
