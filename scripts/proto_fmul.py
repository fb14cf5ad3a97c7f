#!/usr/bin/env python
"""f_mul restructure experiment: the production schoolbook materializes
~94 live limb rows (31 lo + 31 hi + cols) per multiply — far beyond the
vector register file — so point kernels are VMEM-spill-bound. Variants:

  A: production f_mul (31 lo + 31 hi accumulation, then fold)
  B: column-major with product recompute (each 16x16 product computed
     twice — once for its lo column, once for the hi column — live state
     ~34 rows; trades 256 extra vmuls for zero spill traffic)
  C: B with (8, T/8) packed rows

Metric: 10-chain p_add wall time at 64x1024 lanes (sync-corrected)."""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rofl_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from rofl_tpu.ops import kernels as K  # noqa: E402

NL, T, NB, CHAIN = 16, 1024, 64, 10
MASK = np.uint32(0xFFFF)
U38 = np.uint32(38)


def f_mul_colmajor(a, b):
    """Column-major schoolbook with recompute: folded column k (k<16)
    accumulates lo(i+j=k), hi(i+j=k-1), 38*lo(i+j=k+16), 38*hi(i+j=k+15)."""
    zero = jnp.zeros_like(a[0])
    out = []
    for k in range(NL):
        acc = zero
        for i in range(NL):
            j = k - i
            if 0 <= j < NL:
                acc = acc + ((a[i] * b[j]) & MASK)
            j = k - 1 - i
            if 0 <= j < NL:
                acc = acc + ((a[i] * b[j]) >> 16)
            j = k + 16 - i
            if 0 <= j < NL:
                acc = acc + U38 * ((a[i] * b[j]) & MASK)
            j = k + 15 - i
            if 0 <= j < NL:
                acc = acc + U38 * ((a[i] * b[j]) >> 16)
        out.append(acc)
    return K.f_norm(out)


def make_prod():
    def kern(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
        p = tuple([r[k:k+1, :] for k in range(NL)] for r in (px, py, pz, pt))
        q = tuple([r[k:k+1, :] for k in range(NL)] for r in (qx, qy, qz, qt))
        acc = p
        for _ in range(CHAIN):
            acc = K.p_add(acc, q)
        for ref, ls in zip((ox, oy, oz, ot), acc):
            for k in range(NL):
                ref[k:k+1, :] = ls[k]
    spec = pl.BlockSpec((NL, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, T * NB), jnp.uint32)
                        for _ in range(4)),
        grid=(NB,), in_specs=[spec] * 8, out_specs=tuple([spec] * 4))


def make_cm(packed):
    import rofl_tpu.ops.kernels as KK
    orig = KK.f_mul

    def kern(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
        if packed:
            rd = lambda r: [r[k, 0] for k in range(NL)]
            wr = lambda ref, ls: [ref.__setitem__((k, 0), ls[k])
                                  for k in range(NL)]
        else:
            rd = lambda r: [r[k:k+1, :] for k in range(NL)]
            wr = lambda ref, ls: [ref.__setitem__((slice(k, k+1),
                                                   slice(None)), ls[k])
                                  for k in range(NL)]
        p = tuple(rd(r) for r in (px, py, pz, pt))
        q = tuple(rd(r) for r in (qx, qy, qz, qt))
        KK.f_mul = f_mul_colmajor
        try:
            acc = p
            for _ in range(CHAIN):
                acc = K.p_add(acc, q)
        finally:
            KK.f_mul = orig
        for ref, ls in zip((ox, oy, oz, ot), acc):
            wr(ref, ls)

    if packed:
        spec = pl.BlockSpec((NL, 1, 8, T // 8), lambda i: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
        out_shape = tuple(jax.ShapeDtypeStruct((NL, NB, 8, T // 8),
                                               jnp.uint32) for _ in range(4))
    else:
        spec = pl.BlockSpec((NL, T), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        out_shape = tuple(jax.ShapeDtypeStruct((NL, T * NB), jnp.uint32)
                          for _ in range(4))
    return pl.pallas_call(kern, out_shape=out_shape, grid=(NB,),
                          in_specs=[spec] * 8, out_specs=tuple([spec] * 4))


def sync(out):
    jax.tree.map(lambda x: np.asarray(x[..., :1][(0,) * (x.ndim - 1)]), out)


def bench(label, fn, args):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    n = CHAIN * T * NB
    print(f"{label}: {best*1000:.1f} ms -> {n/best/1e6:.1f} M p_add/s",
          flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    n = NB * T
    arrs2 = [jnp.asarray(rng.integers(0, 1 << 16, (NL, n), dtype=np.int64)
                         .astype(np.uint32)) for _ in range(8)]
    arrs3 = [a.reshape(NL, NB, 8, T // 8) for a in arrs2]

    outA = bench("A prod (1,T) rows      ", make_prod(), tuple(arrs2))
    outB = bench("B colmajor (1,T) rows  ", make_cm(False), tuple(arrs2))
    outC = bench("C colmajor (8,T/8) rows", make_cm(True), tuple(arrs3))
    # cross-check B/C against A bit-exactly
    for a, b in zip(outA, outB):
        assert np.array_equal(np.asarray(a), np.asarray(b)), "B mismatch"
    for a, c in zip(outA, outC):
        assert np.array_equal(np.asarray(a),
                              np.asarray(c).reshape(NL, n)), "C mismatch"
    print("B/C bit-exact vs A", flush=True)


if __name__ == "__main__":
    main()
