"""Batched GF(2^255-19) arithmetic for TPU — 16x16-bit limbs in uint32 lanes.

TPU-native design notes (not a port of dalek's u64 backend):
  * A field element batch is a uint32 array of shape (16, *batch): limb-major
    so the (large) batch dimension is the TPU lane/minor dimension and limbs
    live in sublanes. All ops are elementwise over the batch and unrolled
    over the 16 limbs, which XLA fuses into a handful of VPU loops.
  * Limbs hold 16-bit digits (radix 2^16) so uint32 products a_i*b_j are
    exact and column accumulations never overflow 32 bits.
  * Values are kept weakly reduced in [0, 2^256); 2^256 ≡ 38 (mod p) folds
    keep everything in range. Canonical form is only forced at
    encode/compare boundaries, exactly like curve25519-dalek.

Bit-exactness target: rofl_tpu.spec.field (itself validated against
RFC 9496 / dalek vectors). Reference uses dalek's AVX2 backend
(rofl_crypto/Cargo.toml:21); this replaces it wholesale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..spec import field as SF

NLIMB = 16
MASK16 = jnp.uint32(0xFFFF)

P_INT = SF.P


def _to_limbs_int(v: int) -> np.ndarray:
    return np.array([(v >> (16 * k)) & 0xFFFF for k in range(NLIMB)], dtype=np.uint32)


def pack_scalars(values, batch_shape=None) -> np.ndarray:
    """Python ints (< 2^256) → uint32 limb array (16, N)."""
    values = list(values)
    out = np.zeros((NLIMB, len(values)), dtype=np.uint32)
    for i, v in enumerate(values):
        out[:, i] = _to_limbs_int(int(v))
    return out


def unpack_scalars(limbs) -> list[int]:
    """uint32 limb array (16, N) → list of Python ints."""
    limbs = np.asarray(limbs)
    flat = limbs.reshape(NLIMB, -1)
    return [
        sum(int(flat[k, i]) << (16 * k) for k in range(NLIMB))
        for i in range(flat.shape[1])
    ]


def constant(v: int, batch_shape=()) -> jnp.ndarray:
    """Broadcastable constant field element of shape (16,) + (1,)*len(batch)."""
    limbs = _to_limbs_int(v % P_INT).reshape((NLIMB,) + (1,) * len(batch_shape))
    return jnp.asarray(limbs)


def zeros(batch_shape) -> jnp.ndarray:
    return jnp.zeros((NLIMB,) + tuple(batch_shape), dtype=jnp.uint32)


def ones(batch_shape) -> jnp.ndarray:
    one = np.zeros((NLIMB,) + tuple(batch_shape), dtype=np.uint32)
    one[0] = 1
    return jnp.asarray(one)


# 4p = 2^257 - 76, saturated limbwise so (a + FOUR_P - b) never underflows
# for any fully-carried a, b: limb0 = 0x1FFB4, limbs 1..15 = 0x1FFFE.
_FOUR_P_SAT = np.full(NLIMB, 0x1FFFE, dtype=np.uint32)
_FOUR_P_SAT[0] = 0x1FFB4
assert sum(int(x) << (16 * k) for k, x in enumerate(_FOUR_P_SAT)) == 4 * P_INT

_P_LIMBS = _to_limbs_int(P_INT)


def _carry_pass(limbs: list) -> tuple[list, jnp.ndarray]:
    """One full sequential carry pass; returns (carried limbs, carry-out)."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for k in range(NLIMB):
        v = limbs[k] + carry
        out.append(v & MASK16)
        carry = v >> 16
    return out, carry


def _normalize(limbs: list) -> jnp.ndarray:
    """Carry-propagate limbs (< 2^27 each) to fully-carried form < 2^256.

    Three passes with 2^256 ≡ 38 folds; branch-free and always sufficient:
    after pass1 the fold adds < 2^16 to limb0, after pass2 the fold adds at
    most 38, whose ripple pass3 absorbs.
    """
    limbs, carry = _carry_pass(limbs)
    limbs[0] = limbs[0] + carry * jnp.uint32(38)
    limbs, carry = _carry_pass(limbs)
    limbs[0] = limbs[0] + carry * jnp.uint32(38)
    limbs, _ = _carry_pass(limbs)
    # Fusion barrier: without it XLA:CPU's fusion pass explores duplicated
    # fusions across every consumer of a field element and compile time
    # explodes exponentially with fan-out (measured: curve.add >500s to
    # compile without, ~linear with). No measurable runtime cost.
    return jax.lax.optimization_barrier(jnp.stack(limbs))


@jax.jit
def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _normalize([a[k] + b[k] for k in range(NLIMB)])


@jax.jit
def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b mod p via a + (4p - b), all-unsigned."""
    four_p = jnp.asarray(_FOUR_P_SAT)
    return _normalize([a[k] + four_p[k] - b[k] for k in range(NLIMB)])


@jax.jit
def neg(a: jnp.ndarray) -> jnp.ndarray:
    four_p = jnp.asarray(_FOUR_P_SAT)
    return _normalize([four_p[k] - a[k] for k in range(NLIMB)])


def mul_small(a: jnp.ndarray, c: int) -> jnp.ndarray:
    """Multiply by a small constant c < 2^11."""
    cc = jnp.uint32(c)
    return _normalize([a[k] * cc for k in range(NLIMB)])


@jax.jit
def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 16x16-limb product with carry-save column accumulation.

    Stacked formulation: row i of partial products is shifted by i limbs
    (a pad, which XLA lowers to cheap slice-writes) and accumulated in
    lo/hi carry-save accumulators, so the whole product is ~100 fused VPU
    ops over the batch rather than 256 scalar-indexed ones.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    pad_cfg = ((0, 0),) * (len(shape) - 1)

    lo_acc = None  # (31, *batch) columns of low product halves
    hi_acc = None  # high halves (worth 2^16 within their column)
    for i in range(NLIMB):
        p = a[i][None] * b  # (16, batch) exact uint32 products
        plo = jnp.pad(p & MASK16, ((i, 15 - i),) + pad_cfg)
        phi = jnp.pad(p >> 16, ((i, 15 - i),) + pad_cfg)
        lo_acc = plo if lo_acc is None else lo_acc + plo
        hi_acc = phi if hi_acc is None else hi_acc + phi

    # col[k] (radix 2^16) = lo_acc[k] + hi_acc[k-1]; 32 columns total.
    zero_row = jnp.zeros((1,) + shape[1:], jnp.uint32)
    cols = jnp.concatenate([lo_acc, zero_row]) + jnp.concatenate([zero_row, hi_acc])
    # Fold columns 16..31 with 2^256 ≡ 38.
    folded = cols[:NLIMB] + jnp.uint32(38) * cols[NLIMB:]
    return _normalize([folded[k] for k in range(NLIMB)])


def sqr(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def _sqr_n(a: jnp.ndarray, n: int) -> jnp.ndarray:
    if n <= 4:
        for _ in range(n):
            a = sqr(a)
        return a
    return jax.lax.fori_loop(0, n, lambda _, x: sqr(x), a)


def _pow22501(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(x^(2^250-1), x^11) — the shared prefix of inversion and sqrt chains
    (classic ref10 addition chain, as in dalek)."""
    t0 = sqr(x)                      # 2
    t1 = _sqr_n(t0, 2)               # 8
    t2 = mul(x, t1)                  # 9
    t3 = mul(t0, t2)                 # 11
    t4 = sqr(t3)                     # 22
    t5 = mul(t2, t4)                 # 31 = 2^5 - 1
    t6 = mul(_sqr_n(t5, 5), t5)      # 2^10 - 1
    t7 = mul(_sqr_n(t6, 10), t6)     # 2^20 - 1
    t8 = mul(_sqr_n(t7, 20), t7)     # 2^40 - 1
    t9 = mul(_sqr_n(t8, 10), t6)     # 2^50 - 1
    t10 = mul(_sqr_n(t9, 50), t9)    # 2^100 - 1
    t11 = mul(_sqr_n(t10, 100), t10)  # 2^200 - 1
    t12 = mul(_sqr_n(t11, 50), t9)   # 2^250 - 1
    return t12, t3


@jax.jit
def inv(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) = a^(2^255 - 21); inv(0) == 0."""
    t12, t3 = _pow22501(a)
    return mul(_sqr_n(t12, 5), t3)


@jax.jit
def pow_p58(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p-5)/8) = a^(2^252 - 3)."""
    t12, _ = _pow22501(a)
    return mul(_sqr_n(t12, 2), a)


@jax.jit
def canonicalize(a: jnp.ndarray) -> jnp.ndarray:
    """Reduce to the canonical representative in [0, p)."""
    p_limbs = jnp.asarray(_P_LIMBS)
    for _ in range(2):  # value < 2^256 < 3p, so two conditional subtracts
        diff = []
        borrow = jnp.zeros_like(a[0])
        for k in range(NLIMB):
            v = a[k] + jnp.uint32(0x10000) - p_limbs[k] - borrow
            diff.append(v & MASK16)
            borrow = jnp.uint32(1) - (v >> 16)
        ge = borrow == 0  # a >= p
        a = jnp.stack([jnp.where(ge, diff[k], a[k]) for k in range(NLIMB)])
    return a


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise field equality → bool over the batch."""
    ca, cb = canonicalize(a), canonicalize(b)
    return jnp.all(ca == cb, axis=0)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(canonicalize(a) == 0, axis=0)


def is_negative(a: jnp.ndarray) -> jnp.ndarray:
    """dalek IS_NEGATIVE: canonical encoding is odd."""
    return (canonicalize(a)[0] & 1).astype(jnp.bool_)


def cabs(a: jnp.ndarray) -> jnp.ndarray:
    """CT_ABS: negate iff negative."""
    return select(is_negative(a), neg(a), a)


def select(cond: jnp.ndarray, a_true: jnp.ndarray, a_false: jnp.ndarray) -> jnp.ndarray:
    """Per-batch-element select; cond has batch shape (no limb dim)."""
    return jnp.where(cond[None], a_true, a_false)


def sqrt_ratio_m1(u: jnp.ndarray, v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched FieldElement::sqrt_ratio_i (see spec.field.sqrt_ratio_m1)."""
    v3 = mul(sqr(v), v)
    v7 = mul(sqr(v3), v)
    r = mul(mul(u, v3), pow_p58(mul(u, v7)))
    check = mul(v, sqr(r))

    u_neg = neg(u)
    correct_sign = eq(check, u)
    flipped_sign = eq(check, u_neg)
    sqrt_m1 = constant(SF.SQRT_M1, u.shape[1:])
    flipped_sign_i = eq(check, mul(u_neg, sqrt_m1))

    r = select(flipped_sign | flipped_sign_i, mul(r, sqrt_m1), r)
    r = cabs(r)
    return correct_sign | flipped_sign, r


def from_bytes_array(data: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 LE encodings → (16, N) limbs, top bit masked (dalek
    from_bytes semantics; NOT reduced)."""
    data = np.asarray(data, dtype=np.uint8).reshape(-1, 32).astype(np.uint32)
    lo = data[:, 0::2]
    hi = data[:, 1::2]
    limbs = (lo | (hi << 8)).T.copy()  # (16, N)
    limbs[15] &= 0x7FFF
    return limbs


def to_bytes_array(limbs) -> np.ndarray:
    """Canonical encodings: (16, N) limbs → (N, 32) uint8 (host-side)."""
    limbs = np.asarray(canonicalize(jnp.asarray(limbs)))
    n = limbs.shape[1] if limbs.ndim > 1 else 1
    limbs = limbs.reshape(NLIMB, -1)
    out = np.zeros((limbs.shape[1], 32), dtype=np.uint8)
    out[:, 0::2] = (limbs & 0xFF).T
    out[:, 1::2] = (limbs >> 8).T
    return out
