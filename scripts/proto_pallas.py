#!/usr/bin/env python
"""Prototype: fused Pallas kernels for GF(2^255-19) limb arithmetic.

Hypothesis from calibrate_tpu.py: the jnp limb kernels run ~100x below
VPU compute bound (fe.mul 0.06 G/s vs 4.7 Tops/s raw u32) because every
field op materializes through HBM (optimization barriers + pad/stack
layout ops) and XLA compile time explodes. A single Pallas kernel doing
the whole op chain in VMEM should close most of that gap.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rofl_tpu.utils.cache import setup_cache
setup_cache()

NLIMB = 16
MASK = np.uint32(0xFFFF)
U38 = np.uint32(38)


def _carry(limbs):
    out = []
    c = jnp.zeros_like(limbs[0])
    for k in range(NLIMB):
        v = limbs[k] + c
        out.append(v & MASK)
        c = v >> 16
    return out, c


def _normalize(limbs):
    limbs, c = _carry(limbs)
    limbs[0] = limbs[0] + c * U38
    limbs, c = _carry(limbs)
    limbs[0] = limbs[0] + c * U38
    limbs, _ = _carry(limbs)
    return limbs


def _mul(a, b):
    zero = jnp.zeros_like(a[0])
    lo = [zero] * 31
    hi = [zero] * 31
    for i in range(NLIMB):
        for j in range(NLIMB):
            p = a[i] * b[j]
            k = i + j
            lo[k] = lo[k] + (p & MASK)
            hi[k] = hi[k] + (p >> 16)
    cols = []
    for k in range(32):
        v = zero
        if k < 31:
            v = v + lo[k]
        if k > 0:
            v = v + hi[k - 1]
        cols.append(v)
    folded = [cols[k] + U38 * cols[k + 16] for k in range(16)]
    return _normalize(folded)


def fe_mul_x10_kernel(a_ref, b_ref, o_ref):
    a = [a_ref[k, :] for k in range(NLIMB)]
    b = [b_ref[k, :] for k in range(NLIMB)]
    acc = a
    for _ in range(10):
        acc = _mul(acc, b)
    for k in range(NLIMB):
        o_ref[k, :] = acc[k]


def make_fe_mul_x10(tile):
    def run(a, b):
        n = a.shape[1]
        grid = n // tile
        return pl.pallas_call(
            fe_mul_x10_kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((NLIMB, tile), lambda i: (0, i)),
                pl.BlockSpec((NLIMB, tile), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((NLIMB, tile), lambda i: (0, i)),
        )(a, b)

    return jax.jit(run)


def main():
    N = 1 << 18
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, (NLIMB, N), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (NLIMB, N), dtype=np.uint32))

    for tile in (512, 2048):
        f = make_fe_mul_x10(tile)
        t0 = time.time()
        out = jax.block_until_ready(f(a, b))
        compile_s = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            out = jax.block_until_ready(f(a, b))
            times.append(time.time() - t0)
        best = min(times)
        print(f"pallas fe_mul_x10 tile={tile}: best={best*1e3:.3f} ms "
              f"compile={compile_s:.1f}s rate={10*N/best/1e9:.3f} G muls/s",
              flush=True)

    # correctness vs the jnp reference implementation
    from rofl_tpu.ops import fe

    @jax.jit
    def ref10(a, b):
        acc = a
        for _ in range(10):
            acc = fe.mul(acc, b)
        return acc

    small_a, small_b = a[:, :2048], b[:, :2048]
    want = np.asarray(ref10(small_a, small_b))
    got = np.asarray(make_fe_mul_x10(512)(small_a, small_b))
    # both weakly reduced; compare canonical
    from rofl_tpu.ops.fe import canonicalize
    wc = np.asarray(canonicalize(jnp.asarray(want)))
    gc = np.asarray(canonicalize(jnp.asarray(got)))
    print("bit-exact:", np.array_equal(wc, gc), flush=True)


if __name__ == "__main__":
    main()
