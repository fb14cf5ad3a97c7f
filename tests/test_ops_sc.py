"""Batched scalar-field (mod l) ops vs the spec."""

import numpy as np
import jax.numpy as jnp

from rofl_tpu.ops import sc
from rofl_tpu.spec import scalar as SS

rng = np.random.default_rng(7)
N = 64


def rand_scalars(n=N):
    return [int.from_bytes(rng.bytes(32), "little") % SS.L for _ in range(n)]


def check2(op_jax, op_spec, a_ints, b_ints):
    a = jnp.asarray(sc.pack_scalars(a_ints))
    b = jnp.asarray(sc.pack_scalars(b_ints))
    got = sc.unpack_scalars(np.asarray(op_jax(a, b)))
    want = [op_spec(x, y) for x, y in zip(a_ints, b_ints)]
    assert got == want


def test_add_sub_neg():
    a, b = rand_scalars(), rand_scalars()
    edges = [0, 1, SS.L - 1, SS.L - 2, 2**252, 12345]
    check2(sc.add, SS.sadd, a, b)
    check2(sc.add, SS.sadd, edges, edges[::-1])
    check2(sc.sub, SS.ssub, a, b)
    check2(sc.sub, SS.ssub, edges, edges[::-1])
    got = sc.unpack_scalars(np.asarray(sc.neg(jnp.asarray(sc.pack_scalars(edges)))))
    assert got == [SS.sneg(x) for x in edges]


def test_mul():
    a, b = rand_scalars(), rand_scalars()
    check2(sc.mul, SS.smul, a, b)
    edges = [0, 1, SS.L - 1, 2**252 - 1, 2**200, 3]
    check2(sc.mul, SS.smul, edges, [SS.L - 1] * 6)
    check2(sc.mul, SS.smul, edges, edges)


def test_inv():
    a = rand_scalars(8) + [1, SS.L - 1]
    got = sc.unpack_scalars(np.asarray(sc.inv(jnp.asarray(sc.pack_scalars(a)))))
    assert got == [SS.sinv(x) for x in a]


def test_sum_and_inner():
    a, b = rand_scalars(9), rand_scalars(9)
    aj = jnp.asarray(sc.pack_scalars(a))
    bj = jnp.asarray(sc.pack_scalars(b))
    s = sc.unpack_scalars(np.asarray(sc.sum_reduce(aj)))[0]
    assert s == sum(a) % SS.L
    ip = sc.unpack_scalars(np.asarray(sc.inner_product(aj, bj)))[0]
    assert ip == sum(x * y for x, y in zip(a, b)) % SS.L


def test_powers():
    x = rand_scalars(1)[0]
    xs = sc.unpack_scalars(np.asarray(sc.powers(jnp.asarray(sc.pack_scalars([x])), 13)))
    assert xs == [pow(x, i, SS.L) for i in range(13)]
