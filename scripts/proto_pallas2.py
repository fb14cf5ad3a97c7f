#!/usr/bin/env python
"""Experiments to find where kernel time goes vs the fe_mul prototype."""

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

from rofl_tpu.ops import kernels as K

NLIMB = 16


def bench(name, fn, *args, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name}: best={min(ts)*1e3:.3f} ms compile={comp:.1f}s", flush=True)


def make_addchain(tile, n_chain, stacked):
    """Chain of point adds in one kernel. stacked=True passes each point as
    one (64, tile) ref instead of 4 (16, tile) refs."""
    if stacked:
        def kern(p_ref, q_ref, o_ref):
            p = tuple(K._unstack(p_ref[16 * i:16 * (i + 1), :]) for i in range(4))
            q = tuple(K._unstack(q_ref[16 * i:16 * (i + 1), :]) for i in range(4))
            acc = p
            for _ in range(n_chain):
                acc = K.p_add(acc, q)
            for i in range(4):
                o_ref[16 * i:16 * (i + 1), :] = K._stack(acc[i])

        def run(p, q):
            n = p.shape[-1]
            spec = pl.BlockSpec((64, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((64, n), jnp.uint32),
                grid=(n // tile,),
                in_specs=[spec, spec],
                out_specs=spec,
            )(p, q)
        return jax.jit(run)
    else:
        def kern(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
            p = K._read_pt((px, py, pz, pt))
            q = K._read_pt((qx, qy, qz, qt))
            acc = p
            for _ in range(n_chain):
                acc = K.p_add(acc, q)
            K._write_pt((ox, oy, oz, ot), acc)

        def run(pp, qq):
            n = pp[0].shape[-1]
            spec = pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern,
                out_shape=tuple(jax.ShapeDtypeStruct((NLIMB, n), jnp.uint32)
                                for _ in range(4)),
                grid=(n // tile,),
                in_specs=[spec] * 8,
                out_specs=tuple([spec] * 4),
            )(*pp, *qq)
        return jax.jit(run)


def make_ladder(tile, n_bits, stack_carry):
    """Mini scalar-mul ladder (n_bits steps) with list-pytree carries vs
    stacked-tensor carries."""
    def kern(k_ref, p_ref, o_ref):
        p = tuple(K._unstack(p_ref[16 * i:16 * (i + 1), :]) for i in range(4))
        acc = K.p_identity(p[0][0])

        if stack_carry:
            def body(i, state):
                acc, addend = K.p_unstack(state[0]), K.p_unstack(state[1])
                limb = k_ref[pl.ds(i >> 4, 1), :][0]
                bit = (limb >> (i & 15).astype(jnp.uint32)) & 1
                acc = K.p_select(bit == 1, K.p_add(acc, addend), acc)
                return K.p_stack(acc), K.p_stack(K.p_double(addend))

            acc, _ = jax.lax.fori_loop(
                0, n_bits, body, (K.p_stack(acc), K.p_stack(p)))
            acc = K.p_unstack(acc)
        else:
            def body(i, state):
                acc, addend = state
                limb = k_ref[pl.ds(i >> 4, 1), :][0]
                bit = (limb >> (i & 15).astype(jnp.uint32)) & 1
                acc = K.p_select(bit == 1, K.p_add(acc, addend), acc)
                return acc, K.p_double(addend)

            acc, _ = jax.lax.fori_loop(
                0, n_bits, body,
                (tuple(list(c) for c in acc), tuple(list(c) for c in p)))

        for i in range(4):
            o_ref[16 * i:16 * (i + 1), :] = K._stack(acc[i])

    def run(k, p):
        n = p.shape[-1]
        spec64 = pl.BlockSpec((64, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        spec16 = pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((64, n), jnp.uint32),
            grid=(n // tile,),
            in_specs=[spec16, spec64],
            out_specs=spec64,
        )(k, p)
    return jax.jit(run)


def main():
    N = 1 << 18
    rng = np.random.default_rng(0)
    from rofl_tpu.crypto import pedersen

    ks = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
    P = pedersen.base_B().mul(jnp.asarray(pedersen.rnd_scalar_limbs(N, rng)))
    Pstk = jnp.concatenate([P.x, P.y, P.z, P.t], axis=0)  # (64, N)
    Q = pedersen.base_H().mul(ks)
    Qstk = jnp.concatenate([Q.x, Q.y, Q.z, Q.t], axis=0)
    jax.block_until_ready(Pstk)

    for tile in (1024, 2048):
        f = make_addchain(tile, 10, stacked=True)
        bench(f"addchain10 stacked tile={tile}", f, Pstk, Qstk)
    f = make_addchain(1024, 10, stacked=False)
    bench("addchain10 4refs tile=1024", f, tuple(P), tuple(Q))
    f = make_addchain(1024, 1, stacked=True)
    bench("addchain1 stacked tile=1024", f, Pstk, Qstk)

    # ladders: 32 bits only (scale x8 for full)
    f = make_ladder(512, 32, stack_carry=True)
    bench("ladder32 stackcarry tile=512", f, ks, Pstk)
    f = make_ladder(512, 32, stack_carry=False)
    bench("ladder32 listcarry tile=512", f, ks, Pstk)
    f = make_ladder(256, 32, stack_carry=False)
    bench("ladder32 listcarry tile=256", f, ks, Pstk)


if __name__ == "__main__":
    main()
