"""Batched scalar-field (mod l) arithmetic for TPU, 16x16-bit limbs.

l = 2^252 + DELTA, DELTA = 27742317777372353535851937790883648493 (~2^124.4).

Reduction strategy (branch-free, all-uint32): full 512-bit schoolbook
product, then three "fold" steps using 2^252 ≡ -DELTA (mod l). Negative
intermediates are avoided by adding a constant multiple K*l >= hi*DELTA
before subtracting, keeping everything unsigned:

    v ≡ (v mod 2^252) + (K*l - (v >> 252) * DELTA)   (mod l)

Canonical (< l) values at API boundaries; same (16, *batch) uint32 layout
as rofl_tpu.ops.fe. Bit-exact with rofl_tpu.spec.scalar == dalek Scalar.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .dispatch import use_pallas
from ..spec import scalar as SS

_BUCKET_FLOOR = int(__import__("os").environ.get("ROFL_JNP_BUCKET", "256"))


def _bucketable(*arrays) -> int | None:
    """Lane bucketing for the eager jnp paths — see ops/curve.py. Zeros are
    a safe pad for every mod-l op here."""
    if _BUCKET_FLOOR <= 0:
        return None
    n = None
    for a in arrays:
        if isinstance(a, jax.core.Tracer) or a.ndim != 2:
            return None
        ln = a.shape[-1]
        if ln != 1:
            if n is not None and ln != n:
                return None
            n = ln
    if n is None:
        return None
    p2 = 1 << (n - 1).bit_length() if n > 1 else 1
    m = max(_BUCKET_FLOOR, p2)
    return None if m == n else n


def _bucket_of(n: int) -> int:
    p2 = 1 << (n - 1).bit_length() if n > 1 else 1
    return max(_BUCKET_FLOOR, p2)


def _padz(a: jnp.ndarray, m: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (0, m - a.shape[-1])))


def _bucketed2(fn, a, b):
    n = _bucketable(a, b)
    if n is None:
        return fn(a, b)
    m = _bucket_of(n)
    ab = _padz(a, m) if a.shape[-1] == n else a
    bb = _padz(b, m) if b.shape[-1] == n else b
    return fn(ab, bb)[:, :n]

NLIMB = 16
MASK16 = jnp.uint32(0xFFFF)
L_INT = SS.L
DELTA = L_INT - 2**252
_DELTA_NLIMB = 8  # DELTA < 2^128
assert DELTA < 2**125


def _int_to_limbs(v: int, n: int) -> np.ndarray:
    return np.array([(v >> (16 * k)) & 0xFFFF for k in range(n)], dtype=np.uint32)


_DELTA_LIMBS = _int_to_limbs(DELTA, _DELTA_NLIMB)
_L_LIMBS = _int_to_limbs(L_INT, NLIMB)


def pack_scalars(values) -> np.ndarray:
    values = [int(v) % L_INT for v in values]
    out = np.zeros((NLIMB, len(values)), dtype=np.uint32)
    for i, v in enumerate(values):
        out[:, i] = _int_to_limbs(v, NLIMB)
    return out


def unpack_scalars(limbs) -> list[int]:
    limbs = np.asarray(limbs).reshape(NLIMB, -1)
    return [
        sum(int(limbs[k, i]) << (16 * k) for k in range(NLIMB))
        for i in range(limbs.shape[1])
    ]


def constant(v: int, batch_shape=()) -> jnp.ndarray:
    limbs = _int_to_limbs(int(v) % L_INT, NLIMB).reshape(
        (NLIMB,) + (1,) * len(batch_shape)
    )
    return jnp.asarray(limbs)


def zeros(batch_shape) -> jnp.ndarray:
    return jnp.zeros((NLIMB,) + tuple(batch_shape), dtype=jnp.uint32)


def ones(batch_shape) -> jnp.ndarray:
    o = np.zeros((NLIMB,) + tuple(batch_shape), dtype=np.uint32)
    o[0] = 1
    return jnp.asarray(o)


# -- generic limb helpers (lists of (batch,)-shaped uint32 rows) ------------


def _carry(limbs: list) -> list:
    """Full carry propagation; appends overflow limbs as needed."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for v in limbs:
        v = v + carry
        out.append(v & MASK16)
        carry = v >> 16
    # absorb remaining carry (< 2^16 after inputs < 2^27-ish)
    out.append(carry & MASK16)
    out.append(carry >> 16)
    # fusion barrier — see ops/fe.py _normalize: XLA:CPU fusion otherwise
    # explores exponentially many duplicated fusions across consumers.
    return list(jax.lax.optimization_barrier(tuple(out)))


def _mul_limbs(a: list, b_const: np.ndarray) -> list:
    """Product of limb list with a small constant limb vector (carry-save)."""
    na, nb = len(a), len(b_const)
    ncols = na + nb - 1
    lo = [None] * ncols
    hi = [None] * ncols
    for j, bc in enumerate(b_const):
        c = jnp.uint32(int(bc))
        if int(bc) == 0:
            continue
        for i in range(na):
            p = a[i] * c
            k = i + j
            plo, phi = p & MASK16, p >> 16
            lo[k] = plo if lo[k] is None else lo[k] + plo
            hi[k] = phi if hi[k] is None else hi[k] + phi
    zero = jnp.zeros_like(a[0])
    cols = []
    for k in range(ncols + 1):
        v = zero
        if k < ncols and lo[k] is not None:
            v = v + lo[k]
        if k > 0 and hi[k - 1] is not None:
            v = v + hi[k - 1]
        cols.append(v)
    return _carry(cols)


def _const_minus(limbs: list, big: int) -> list:
    """big - value(limbs), where big >= value always; result fully carried.

    Saturation trick: write big = sum(sat_k * 2^16k) with sat_k >= 0xFFFF for
    every limb position of the subtrahend, so the limbwise difference never
    underflows. The result may be wider than the input.
    """
    n_sub = len(limbs)
    rem = big - (2 ** (16 * n_sub) - 1)
    assert rem >= 0, "constant too small for saturated subtraction"
    rem_limbs = []
    v = rem
    while v:
        rem_limbs.append(v & 0xFFFF)
        v >>= 16
    n_out = max(n_sub, len(rem_limbs))
    zero = jnp.zeros_like(limbs[0])
    out = []
    for k in range(n_out):
        sat = (0xFFFF if k < n_sub else 0) + (
            rem_limbs[k] if k < len(rem_limbs) else 0
        )
        term = jnp.uint32(sat) + zero
        if k < n_sub:
            term = term - limbs[k]
        out.append(term)
    return _carry(out)


def _split_252(limbs: list) -> tuple[list, list]:
    """(low 252 bits as 16 limbs, high part shifted down by 252 bits)."""
    low = list(limbs[:15]) + [limbs[15] & jnp.uint32(0x0FFF)]
    n = len(limbs)
    hi = []
    for k in range(n - 15):
        v = limbs[15 + k] >> 12
        if 16 + k < n:
            v = v | ((limbs[16 + k] & jnp.uint32(0x0FFF)) << 4)
        hi.append(v)
    return low, hi


def _add_lists(a: list, b: list) -> list:
    n = max(len(a), len(b))
    zero = jnp.zeros_like(a[0])
    out = [
        (a[k] if k < len(a) else zero) + (b[k] if k < len(b) else zero)
        for k in range(n)
    ]
    return _carry(out)


def _trim(limbs: list, bits: int) -> list:
    """Drop limbs known to be zero beyond `bits`."""
    n = (bits + 15) // 16
    return limbs[:n]


def _fold_once(limbs: list, hi_bits: int, k_mult: int) -> list:
    """One 2^252 ≡ -DELTA fold: low + (k_mult*l - hi*DELTA)."""
    low, hi = _split_252(limbs)
    hi = _trim(hi, hi_bits)
    prod = _mul_limbs(hi, _DELTA_LIMBS)  # hi * DELTA
    prod = _trim(prod, hi_bits + 125)
    t = _const_minus(prod, k_mult * L_INT)
    return _add_lists(low, t)


def _cond_sub_l(limbs: list) -> list:
    """One conditional subtract of l from a 16-limb value (< 2^256)."""
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for k in range(NLIMB):
        v = limbs[k] + jnp.uint32(0x10000) - jnp.uint32(int(_L_LIMBS[k])) - borrow
        diff.append(v & MASK16)
        borrow = jnp.uint32(1) - (v >> 16)
    ge = borrow == 0
    return [jnp.where(ge, diff[k], limbs[k]) for k in range(NLIMB)]


def _reduce_to_canonical(limbs: list, n_subs: int) -> jnp.ndarray:
    limbs = limbs[:NLIMB] + [jnp.zeros_like(limbs[0])] * max(0, NLIMB - len(limbs))
    for _ in range(n_subs):
        limbs = _cond_sub_l(limbs)
    return jax.lax.optimization_barrier(jnp.stack(limbs))


# -- public ops -------------------------------------------------------------


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if use_pallas():
        from . import kernels

        return kernels.sc_add(a, b)
    return _bucketed2(_add_jnp, a, b)


@jax.jit
def _add_jnp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = _carry([a[k] + b[k] for k in range(NLIMB)])
    return _reduce_to_canonical(_trim(s, 253), 1)


def _l_minus(b: jnp.ndarray) -> list:
    """l - b for canonical b (borrow chain; b <= l so no final borrow)."""
    out = []
    borrow = jnp.zeros_like(b[0])
    for k in range(NLIMB):
        v = jnp.uint32(int(_L_LIMBS[k]) + 0x10000) - b[k] - borrow
        out.append(v & MASK16)
        borrow = jnp.uint32(1) - (v >> 16)
    return out


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b (canonical inputs) via a + (l - b)."""
    if use_pallas():
        from . import kernels

        return kernels.sc_sub(a, b)
    return _bucketed2(_sub_jnp, a, b)


@jax.jit
def _sub_jnp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s = _add_lists([a[k] for k in range(NLIMB)], _l_minus(b))
    return _reduce_to_canonical(_trim(s, 254), 2)


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    """l - a for canonical a; maps 0 → l → one conditional subtract fixes."""
    return _reduce_to_canonical(_l_minus(a), 1)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full 512-bit schoolbook product + three folds + canonical subtracts.

    Routed to the fused Pallas kernel on TPU."""
    if use_pallas():
        from . import kernels

        return kernels.sc_mul(a, b)
    return _bucketed2(_mul_jnp, a, b)


@jax.jit
def _mul_jnp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    ncols = 31
    lo = [None] * ncols
    hi = [None] * ncols
    for i in range(NLIMB):
        p = a[i][None] * b
        plo, phi = p & MASK16, p >> 16
        for j in range(NLIMB):
            k = i + j
            lo[k] = plo[j] if lo[k] is None else lo[k] + plo[j]
            hi[k] = phi[j] if hi[k] is None else hi[k] + phi[j]
    zero = jnp.zeros(shape[1:], jnp.uint32)
    cols = []
    for k in range(ncols + 1):
        v = zero
        if k < ncols:
            v = v + lo[k]
        if k > 0:
            v = v + hi[k - 1]
        cols.append(v)
    prod = _carry(cols)  # 512-bit product, fully carried
    return _reduce_512(prod)


def _reduce_512(limbs: list) -> jnp.ndarray:
    """Reduce a fully-carried value < 2^512 to canonical mod l.

    Bounds walkthrough: v<2^512 → hi1<2^260, prod1<2^385 (25 limbs) needs
    K1*l >= 2^400-1 → K1=2^149, v1<2^402; hi2<2^150, prod2<2^275 (18 limbs)
    needs K2*l >= 2^288-1 → K2=2^36, v2<2^290; hi3<2^38, prod3<2^163
    (11 limbs) needs K3*l >= 2^176-1 → K3=1, v3 < 2^252 + l*1 < 2^254.
    """
    v1 = _fold_once(_trim(limbs, 513), hi_bits=260, k_mult=1 << 149)
    v2 = _fold_once(_trim(v1, 402), hi_bits=150, k_mult=1 << 36)
    v3 = _fold_once(_trim(v2, 290), hi_bits=38, k_mult=1)
    return _reduce_to_canonical(_trim(v3, 254), 3)


def reduce_wide_bytes(byte_cols: jnp.ndarray) -> jnp.ndarray:
    """(64, N) uint32 byte columns (LE) → canonical scalars (16, N).

    Scalar::from_bytes_mod_order_wide on device — turns batched transcript
    challenge bytes into challenge scalars without a host round-trip.
    """
    if use_pallas():
        from . import kernels

        return kernels.sc_reduce_wide(byte_cols)
    return _reduce_wide_bytes_jnp(byte_cols)


@jax.jit
def _reduce_wide_bytes_jnp(byte_cols: jnp.ndarray) -> jnp.ndarray:
    limbs = [byte_cols[2 * k] | (byte_cols[2 * k + 1] << 8) for k in range(32)]
    return _reduce_512(limbs)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=0)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(l-2) mod l — square-and-multiply with a scanned bit vector (keeps
    the compiled graph at one mul body instead of ~500)."""
    e = L_INT - 2
    bits = jnp.asarray(
        [(e >> i) & 1 for i in range(e.bit_length())][::-1], dtype=jnp.uint32
    )

    def body(acc, bit):
        acc = mul(acc, acc)
        with_mul = mul(acc, a)
        return jnp.where(bit[None] == 1, with_mul, acc), None

    acc0 = jnp.broadcast_to(ones(a.shape[1:]), a.shape)
    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


@jax.jit
def _sum_reduce_pow2(a: jnp.ndarray) -> jnp.ndarray:
    """Hillis-Steele sum over the last axis (pow2 length), one loop body."""
    n = a.shape[-1]
    steps = int(np.log2(n))
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

    def body(t, acc):
        stride = jnp.int32(n) >> (t + 1)
        gidx = jnp.clip(idx + stride, 0, n - 1)
        shifted = jnp.take(acc, gidx, axis=-1)
        combined = add(acc, shifted)
        return jnp.where((idx < stride)[None], combined, acc)

    acc = jax.lax.fori_loop(0, steps, body, a)
    return acc[..., :1]


def sum_reduce(a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Sum scalars along a batch axis (log-depth, one compiled body)."""
    if use_pallas() and a.ndim == 2 and axis == 0:
        from . import kernels

        return kernels.sc_sum(a)
    ax = axis + 1
    if ax != a.ndim - 1:
        a = jnp.moveaxis(a, ax, -1)
    n = a.shape[-1]
    m = 1 if n == 0 else 1 << (n - 1).bit_length()
    if m != n:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, m - n)])
    out = _sum_reduce_pow2(a)
    if ax != a.ndim - 1:
        out = jnp.moveaxis(out, -1, ax)
    return out


def sum_reduce_groups(a: jnp.ndarray, group: int) -> jnp.ndarray:
    """Per-group mod-l sums over contiguous groups: (16, G·group) → (16, G)."""
    if use_pallas():
        from . import kernels

        return kernels.sc_sum_groups(a, group)
    L = a.shape[-1]
    G = L // group
    out = sum_reduce(a.reshape(NLIMB, G, group), axis=1)
    return out.reshape(NLIMB, G)


def inner_product_groups(a: jnp.ndarray, b: jnp.ndarray, group: int) -> jnp.ndarray:
    """<a, b> mod l per contiguous group → (16, G)."""
    return sum_reduce_groups(mul(a, b), group)


def inner_product(a: jnp.ndarray, b: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """<a, b> mod l along a batch axis."""
    return sum_reduce(mul(a, b), axis=axis)


from functools import partial


@partial(jax.jit, static_argnums=1)
def _powers_impl(x: jnp.ndarray, m: int) -> jnp.ndarray:
    idx = jax.lax.broadcasted_iota(jnp.int32, (m,), 0)
    arr = jnp.broadcast_to(jnp.asarray(ones((1,))), (NLIMB, m))

    def body(k, state):
        arr, cur = state
        stride = jnp.int32(1) << k
        gidx = jnp.clip(idx - stride, 0, m - 1)
        shifted = mul(jnp.take(arr, gidx, axis=-1), cur)
        mask = (idx >= stride) & (idx < 2 * stride)
        return jnp.where(mask[None], shifted, arr), mul(cur, cur)

    arr, _ = jax.lax.fori_loop(0, int(np.log2(m)), body, (arr, x))
    return arr


def powers(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(n-1)] for a single scalar x of shape (16, 1) →
    (16, n). Log-depth block doubling with one compiled body."""
    if n == 1:
        return jnp.asarray(ones((1,)))
    m = 1 << (n - 1).bit_length()
    return _powers_impl(x, m)[:, :n]


def from_bytes_wide_array(data: np.ndarray) -> np.ndarray:
    """(N, 64) uint8 → canonical scalars (host-side, exact wide reduction)."""
    data = np.asarray(data, dtype=np.uint8).reshape(-1, 64)
    out = np.zeros((NLIMB, data.shape[0]), dtype=np.uint32)
    for i in range(data.shape[0]):
        v = int.from_bytes(bytes(data[i]), "little") % L_INT
        out[:, i] = _int_to_limbs(v, NLIMB)
    return out


def to_bytes_array(limbs) -> np.ndarray:
    limbs = np.asarray(limbs).reshape(NLIMB, -1)
    out = np.zeros((limbs.shape[1], 32), dtype=np.uint8)
    out[:, 0::2] = (limbs & 0xFF).T
    out[:, 1::2] = (limbs >> 8).T
    return out
