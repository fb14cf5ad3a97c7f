#!/usr/bin/env python
"""Measure raw device rates that bound MSM/IPA design choices:
  - uint32 multiply / add VPU throughput vs f32
  - fe.mul, curve.add, curve.double throughput (adds/sec)
  - fixed_base.mul and scalar_mul rates
Prints one JSON line per measurement.
"""

import json
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


def timeit(name, fn, *args, reps=5, work=None):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        times.append(time.time() - t0)
    best = min(times)
    rec = {"name": name, "best_s": round(best, 6), "compile_s": round(compile_s, 3)}
    if work:
        rec["rate"] = f"{work / best / 1e9:.2f} G/s"
    print(json.dumps(rec), flush=True)
    return out


def main():
    N = 1 << 18  # 262144
    rng = np.random.default_rng(0)
    print(json.dumps({"device": str(jax.devices()[0]), "N": N}), flush=True)

    # raw VPU rates: 100 chained uint32 mults vs f32 mults on (16, N)
    a32 = jnp.asarray(rng.integers(0, 1 << 16, (16, N), dtype=np.uint32))
    f32 = jnp.asarray(rng.random((16, N), dtype=np.float32))

    @jax.jit
    def chain_u32(x):
        acc = x
        for i in range(100):
            acc = acc * x + jnp.uint32(i)
        return acc

    @jax.jit
    def chain_u32_shift(x):
        acc = x
        for i in range(100):
            acc = ((acc * x) & jnp.uint32(0xFFFF)) + (acc >> 16)
        return acc

    @jax.jit
    def chain_f32(x):
        acc = x
        for i in range(100):
            acc = acc * x + np.float32(i)
        return acc

    work = 100 * 16 * N
    timeit("u32_mul_chain", chain_u32, a32, work=work)
    timeit("u32_mulshift_chain", chain_u32_shift, a32, work=work)
    timeit("f32_fma_chain", chain_f32, f32, work=work)

    from rofl_tpu.ops import curve, fe, sc, fixed_base
    from rofl_tpu.crypto import pedersen

    xa = jnp.asarray(rng.integers(0, 1 << 16, (16, N), dtype=np.uint32))
    xb = jnp.asarray(rng.integers(0, 1 << 16, (16, N), dtype=np.uint32))

    @jax.jit
    def fe_mul_chain(a, b):
        acc = a
        for _ in range(10):
            acc = fe.mul(acc, b)
        return acc

    timeit("fe_mul_x10", fe_mul_chain, xa, xb, work=10 * N)

    @jax.jit
    def sc_mul_chain(a, b):
        acc = a
        for _ in range(10):
            acc = sc.mul(acc, b)
        return acc

    timeit("sc_mul_x10", sc_mul_chain, xa % jnp.uint32(0xFFFF), xb, work=10 * N)

    # point ops
    ks = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    P = pedersen.base_B().mul(ks)  # arbitrary points
    jax.block_until_ready(P.x)

    @jax.jit
    def add_chain(p):
        acc = p
        for _ in range(10):
            acc = curve.add(acc, p)
        return acc

    timeit("point_add_x10", add_chain, P, work=10 * N)

    @jax.jit
    def dbl_chain(p):
        acc = p
        for _ in range(10):
            acc = curve.double(acc)
        return acc

    timeit("point_double_x10", dbl_chain, P, work=10 * N)

    timeit("fixed_base_mul", fixed_base.mul, pedersen.base_B().table, ks,
           work=32 * N)  # 32 window adds per element

    # full variable-base scalar mul (256 dbl + 256 sel-add)
    timeit("scalar_mul", curve.scalar_mul, P, ks, work=512 * N)

    # tree sum
    timeit("tree_sum", curve.tree_sum, P, 1, work=N)

    timeit("compress", curve.compress, P, work=N)


if __name__ == "__main__":
    main()
