#!/usr/bin/env python
"""Layout experiment: field-mul chain throughput with limb rows as
(T,) 1-D slices of a (16, T) block (production layout) vs (8, T/8) tiles
of a (16, 8, T/8) block (full vreg occupancy hypothesis), and a point-add
chain in both layouts. Decides whether the (8, 128) repack is worth a
kernels.py-wide refactor."""
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

NL = 16
T = 1024
CHAIN = 10


def make_2d():
    def kern(a_ref, b_ref, o_ref):
        a = [a_ref[k, :] for k in range(NL)]
        b = [b_ref[k, :] for k in range(NL)]
        acc = a
        for _ in range(CHAIN):
            acc = K.f_mul(acc, b)
        for k in range(NL):
            o_ref[k, :] = acc[k]

    spec = pl.BlockSpec((NL, T), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((NL, T * NB), jnp.uint32),
        grid=(NB,), in_specs=[spec, spec], out_specs=spec)


def make_3d():
    def kern(a_ref, b_ref, o_ref):
        a = [a_ref[k, 0] for k in range(NL)]
        b = [b_ref[k, 0] for k in range(NL)]
        acc = a
        for _ in range(CHAIN):
            acc = K.f_mul(acc, b)
        for k in range(NL):
            o_ref[k, 0] = acc[k]

    spec = pl.BlockSpec((NL, 1, 8, T // 8), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((NL, NB, 8, T // 8), jnp.uint32),
        grid=(NB,), in_specs=[spec, spec], out_specs=spec)


def make_add_2d():
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


def make_add_3d():
    def kern(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
        p = tuple([r[k, 0] for k in range(NL)] for r in (px, py, pz, pt))
        q = tuple([r[k, 0] for k in range(NL)] for r in (qx, qy, qz, qt))
        acc = p
        for _ in range(CHAIN):
            acc = K.p_add(acc, q)
        for ref, ls in zip((ox, oy, oz, ot), acc):
            for k in range(NL):
                ref[k, 0] = ls[k]

    spec = pl.BlockSpec((NL, 1, 8, T // 8), lambda i: (0, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct((NL, NB, 8, T // 8), jnp.uint32)
                        for _ in range(4)),
        grid=(NB,), in_specs=[spec] * 8, out_specs=tuple([spec] * 4))


NB = 64  # 64 blocks x 1024 lanes


def sync(out):
    jax.tree.map(lambda x: np.asarray(x[..., :1][(0,) * (x.ndim - 1)]), out)


def bench(label, fn, args, nmul):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        sync(out)
        best = min(best, time.time() - t0)
    rate = nmul / best / 1e9
    print(f"{label}: {best*1000:.1f} ms -> {rate:.2f} G fmul/s", flush=True)


def main():
    n = NB * T
    rng = np.random.default_rng(0)
    a2 = jnp.asarray(rng.integers(0, 1 << 16, (NL, n), dtype=np.int64)
                     .astype(np.uint32))
    b2 = jnp.asarray(rng.integers(0, 1 << 16, (NL, n), dtype=np.int64)
                     .astype(np.uint32))
    a3 = a2.reshape(NL, NB, 8, T // 8)
    b3 = b2.reshape(NL, NB, 8, T // 8)

    bench("fe_mul x10 rows=(T,)   ", make_2d(), (a2, b2), CHAIN * n)
    bench("fe_mul x10 rows=(8,T/8)", make_3d(), (a3, b3), CHAIN * n)

    pts2 = (a2, b2, a2, b2)  # garbage coords: timing only
    bench("p_add x10 rows=(1,T)   ", make_add_2d(), pts2 + pts2,
          CHAIN * n * 9)
    pts3 = (a3, b3, a3, b3)
    bench("p_add x10 rows=(8,T/8) ", make_add_3d(), pts3 + pts3,
          CHAIN * n * 9)


if __name__ == "__main__":
    main()
