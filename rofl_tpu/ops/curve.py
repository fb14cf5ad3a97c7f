"""Batched Ristretto255 point ops for TPU (extended twisted-Edwards coords).

A point batch is a NamedTuple of four limb arrays (rofl_tpu.ops.fe layout:
(16, *batch) uint32). The a=-1 unified addition law is complete (works for
identity/doubling), so every op is branch-free and batcheable — the key
property that lets commitments, Σ-protocols and MSMs run as straight-line
SPMD code on the VPU with no data-dependent control flow.

Bit-exact with rofl_tpu.spec.ristretto (== curve25519-dalek-ng), which the
reference's proofs are built on (SURVEY.md §2.1 L0).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from . import fe
from .dispatch import use_pallas
from ..spec import field as SF
from ..spec import ristretto as SR

# Lane bucketing for the jnp paths: eager top-level calls pad their lane
# count to a pow2 with a floor so the per-shape XLA:CPU compiles (ladder
# ~20 s, compress ~32 s each) are shared across callers/tests instead of
# recompiling for every distinct size. Only concrete (non-tracer) 2-D
# arrays are bucketed — inside an outer jit the inner jits are inlined
# anyway, so padding there would only grow the traced graph.
_BUCKET_FLOOR = int(os.environ.get("ROFL_JNP_BUCKET", "256"))


def _bucket(n: int) -> int:
    if _BUCKET_FLOOR <= 0:
        return n
    p2 = 1 << (n - 1).bit_length() if n > 1 else 1
    return max(_BUCKET_FLOOR, p2)


def _bucketable(*arrays) -> int | None:
    """Common lane count if every array is a concrete 2-D (16, N) (N>=1)
    or (16, 1) broadcast operand; None disables bucketing."""
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
    if n is None or _bucket(n) == n:
        return None
    return n


def _pad_pt(p: "PointArray", m: int) -> "PointArray":
    """Pad lanes to m with identity points (0, 1, 1, 0)."""
    n = p.x.shape[-1]
    pad = m - n
    zero = jnp.zeros((16, pad), jnp.uint32)
    one = jnp.zeros((16, pad), jnp.uint32).at[0].set(1)
    return PointArray(
        jnp.concatenate([p.x, zero], axis=1),
        jnp.concatenate([p.y, one], axis=1),
        jnp.concatenate([p.z, one], axis=1),
        jnp.concatenate([p.t, zero], axis=1),
    )


def _pad_limbs(a: jnp.ndarray, m: int) -> jnp.ndarray:
    return jnp.pad(a, ((0, 0), (0, m - a.shape[-1])))


class PointArray(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[1:]


def pack_points(points) -> PointArray:
    """List of spec RistrettoPoints → PointArray (host-side)."""
    xs, ys, zs, ts = [], [], [], []
    for p in points:
        xs.append(p.X)
        ys.append(p.Y)
        zs.append(p.Z)
        ts.append(p.T)
    return PointArray(
        jnp.asarray(fe.pack_scalars(xs)),
        jnp.asarray(fe.pack_scalars(ys)),
        jnp.asarray(fe.pack_scalars(zs)),
        jnp.asarray(fe.pack_scalars(ts)),
    )


def unpack_points(pa: PointArray) -> list:
    """PointArray → list of spec RistrettoPoints (host-side)."""
    xs = fe.unpack_scalars(np.asarray(pa.x))
    ys = fe.unpack_scalars(np.asarray(pa.y))
    zs = fe.unpack_scalars(np.asarray(pa.z))
    ts = fe.unpack_scalars(np.asarray(pa.t))
    return [SR.RistrettoPoint(*c) for c in zip(xs, ys, zs, ts)]


def identity(batch_shape=()) -> PointArray:
    return PointArray(
        fe.zeros(batch_shape), fe.ones(batch_shape), fe.ones(batch_shape),
        fe.zeros(batch_shape),
    )


def basepoint(batch_shape=()) -> PointArray:
    b = SR.BASEPOINT
    shape = (1,) * len(batch_shape)
    return PointArray(
        fe.constant(b.X, batch_shape), fe.constant(b.Y, batch_shape),
        fe.constant(b.Z, batch_shape), fe.constant(b.T, batch_shape),
    )


def add(p: PointArray, q: PointArray) -> PointArray:
    """Unified extended addition (add-2008-hwcd-3, a=-1): 9 field muls.

    Routed to the fused Pallas kernel on TPU (ops/kernels.py), jnp on CPU.
    """
    if use_pallas():
        from . import kernels

        return PointArray(*kernels.point_add(tuple(p), tuple(q)))
    n = _bucketable(*p, *q)
    if n is not None:
        m = _bucket(n)
        pb = _pad_pt(p, m) if p.x.shape[-1] == n else p
        qb = _pad_pt(q, m) if q.x.shape[-1] == n else q
        r = _add_jnp(pb, qb)
        return PointArray(*[c[:, :n] for c in r])
    return _add_jnp(p, q)


@jax.jit
def _add_jnp(p: PointArray, q: PointArray) -> PointArray:
    a = fe.mul(fe.sub(p.y, p.x), fe.sub(q.y, q.x))
    b = fe.mul(fe.add(p.y, p.x), fe.add(q.y, q.x))
    c = fe.mul(fe.mul(p.t, fe.constant(SF.D2, p.t.shape[1:])), q.t)
    d = fe.mul_small(fe.mul(p.z, q.z), 2)
    e = fe.sub(b, a)
    f = fe.sub(d, c)
    g = fe.add(d, c)
    h = fe.add(b, a)
    return PointArray(fe.mul(e, f), fe.mul(g, h), fe.mul(f, g), fe.mul(e, h))


def double(p: PointArray) -> PointArray:
    if use_pallas():
        from . import kernels

        return PointArray(*kernels.point_double(tuple(p)))
    n = _bucketable(*p)
    if n is not None:
        r = _double_jnp(_pad_pt(p, _bucket(n)))
        return PointArray(*[c[:, :n] for c in r])
    return _double_jnp(p)


@jax.jit
def _double_jnp(p: PointArray) -> PointArray:
    a = fe.sqr(p.x)
    b = fe.sqr(p.y)
    c = fe.mul_small(fe.sqr(p.z), 2)
    d = fe.neg(a)
    e = fe.sub(fe.sub(fe.sqr(fe.add(p.x, p.y)), a), b)
    g = fe.add(d, b)
    f = fe.sub(g, c)
    h = fe.sub(d, b)
    return PointArray(fe.mul(e, f), fe.mul(g, h), fe.mul(f, g), fe.mul(e, h))


def neg(p: PointArray) -> PointArray:
    return PointArray(fe.neg(p.x), p.y, p.z, fe.neg(p.t))


def select(cond: jnp.ndarray, p_true: PointArray, p_false: PointArray) -> PointArray:
    return PointArray(
        fe.select(cond, p_true.x, p_false.x),
        fe.select(cond, p_true.y, p_false.y),
        fe.select(cond, p_true.z, p_false.z),
        fe.select(cond, p_true.t, p_false.t),
    )


def eq(p: PointArray, q: PointArray) -> jnp.ndarray:
    """Batched ristretto equality (dalek ct_eq): X1Y2==Y1X2 | X1X2==Y1Y2."""
    n = _bucketable(*p, *q)
    if n is not None and not use_pallas():
        m = _bucket(n)
        pb = _pad_pt(p, m) if p.x.shape[-1] == n else p
        qb = _pad_pt(q, m) if q.x.shape[-1] == n else q
        return _eq_jnp(pb, qb)[:n]
    return _eq_jnp(p, q)


@jax.jit
def _eq_jnp(p: PointArray, q: PointArray) -> jnp.ndarray:
    return fe.eq(fe.mul(p.x, q.y), fe.mul(p.y, q.x)) | fe.eq(
        fe.mul(p.x, q.x), fe.mul(p.y, q.y)
    )


def scalar_mul(p: PointArray, k: jnp.ndarray) -> PointArray:
    """Per-element variable-base scalar mul, shared double-and-add loop.

    k: (16, *batch) uint32 limbs of canonical scalars (< l). On TPU the
    whole 256-step ladder runs inside one Pallas kernel (VMEM-resident).
    """
    if use_pallas():
        from . import kernels

        return PointArray(*kernels.scalar_mul(tuple(p), k))
    n = _bucketable(*p, k)
    if n is not None:
        m = _bucket(n)
        pb = _pad_pt(p, m) if p.x.shape[-1] == n else p
        kb = _pad_limbs(k, m) if k.shape[-1] == n else k
        r = _scalar_mul_jnp(pb, kb)
        return PointArray(*[c[:, :n] for c in r])
    return _scalar_mul_jnp(p, k)


@jax.jit
def _scalar_mul_jnp(p: PointArray, k: jnp.ndarray) -> PointArray:

    def body(i, state):
        acc, addend = state
        limb = jax.lax.dynamic_index_in_dim(k, i >> 4, axis=0, keepdims=False)
        bit = (limb >> (i & 15).astype(jnp.uint32)) & 1
        acc = select(bit == 1, add(acc, addend), acc)
        return acc, double(addend)

    acc0 = identity(p.batch_shape)
    acc0 = PointArray(*[jnp.broadcast_to(c, (16,) + tuple(p.batch_shape)) for c in acc0])
    acc, _ = jax.lax.fori_loop(
        0, 256, body, (acc0, p)
    )
    return acc


def compress(p: PointArray) -> jnp.ndarray:
    """Batched ristretto encode → canonical field limbs (16, *batch).

    Mirrors spec.ristretto.RistrettoPoint.compress; host converts limbs to
    bytes with fe.to_bytes_array.
    """
    if use_pallas():
        from . import kernels

        return kernels.compress(tuple(p))
    n = _bucketable(*p)
    if n is not None:
        return _compress_jnp(_pad_pt(p, _bucket(n)))[:, :n]
    return _compress_jnp(p)


@jax.jit
def _compress_jnp(p: PointArray) -> jnp.ndarray:
    X, Y, Z, T = p
    batch = X.shape[1:]
    u1 = fe.mul(fe.add(Z, Y), fe.sub(Z, Y))
    u2 = fe.mul(X, Y)
    _, inv_sqrt = fe.sqrt_ratio_m1(fe.ones(batch), fe.mul(u1, fe.sqr(u2)))
    den1 = fe.mul(inv_sqrt, u1)
    den2 = fe.mul(inv_sqrt, u2)
    z_inv = fe.mul(fe.mul(den1, den2), T)
    sqrt_m1 = fe.constant(SF.SQRT_M1, batch)
    ix0 = fe.mul(X, sqrt_m1)
    iy0 = fe.mul(Y, sqrt_m1)
    enchanted = fe.mul(den1, fe.constant(SF.INVSQRT_A_MINUS_D, batch))
    rotate = fe.is_negative(fe.mul(T, z_inv))
    x = fe.select(rotate, iy0, X)
    y = fe.select(rotate, ix0, Y)
    den_inv = fe.select(rotate, enchanted, den2)
    y = fe.select(fe.is_negative(fe.mul(x, z_inv)), fe.neg(y), y)
    s = fe.cabs(fe.mul(den_inv, fe.sub(Z, y)))
    return fe.canonicalize(s)


def decompress(s: jnp.ndarray) -> tuple[PointArray, jnp.ndarray]:
    """Batched ristretto decode from field limbs s (16, *batch).

    Returns (points, valid_mask). Canonicality of the byte encoding
    (s < p, non-negative) must be checked by the caller on the raw
    bytes/limbs; this checks the on-curve/torsion-free conditions.
    """
    if use_pallas():
        from . import kernels

        pt, valid = kernels.decompress(s)
        return PointArray(*pt), valid
    n = _bucketable(s)
    if n is not None:
        pt, valid = _decompress_jnp(_pad_limbs(s, _bucket(n)))
        return PointArray(*[c[:, :n] for c in pt]), valid[:n]
    return _decompress_jnp(s)


@jax.jit
def _decompress_jnp(s: jnp.ndarray) -> tuple[PointArray, jnp.ndarray]:
    batch = s.shape[1:]
    ss = fe.sqr(s)
    one = fe.ones(batch)
    u1 = fe.sub(one, ss)
    u2 = fe.add(one, ss)
    u2_sqr = fe.sqr(u2)
    d = fe.constant(SF.D, batch)
    v = fe.sub(fe.neg(fe.mul(d, fe.sqr(u1))), u2_sqr)
    was_square, inv_sqrt = fe.sqrt_ratio_m1(one, fe.mul(v, u2_sqr))
    den_x = fe.mul(inv_sqrt, u2)
    den_y = fe.mul(fe.mul(inv_sqrt, den_x), v)
    x = fe.cabs(fe.mul(fe.mul_small(s, 2), den_x))
    y = fe.mul(u1, den_y)
    t = fe.mul(x, y)
    valid = (
        was_square
        & ~fe.is_negative(t)
        & ~fe.is_zero(y)
        & ~fe.is_negative(s)
    )
    return PointArray(x, y, fe.canonicalize(jnp.broadcast_to(one, x.shape)), t), valid


@jax.jit
def elligator_map(t: jnp.ndarray) -> PointArray:
    """Batched RFC 9496 one-way MAP (dalek elligator_ristretto_flavor)."""
    batch = t.shape[1:]
    one = fe.ones(batch)
    d = fe.constant(SF.D, batch)
    r = fe.mul(fe.mul(fe.constant(SF.SQRT_M1, batch), t), t)
    u = fe.mul(fe.add(r, one), fe.constant(SF.ONE_MINUS_D_SQ, batch))
    neg_one = fe.neg(one)
    v = fe.mul(fe.sub(neg_one, fe.mul(r, d)), fe.add(r, d))
    was_square, s = fe.sqrt_ratio_m1(u, v)
    s_prime = fe.neg(fe.cabs(fe.mul(s, t)))
    s = fe.select(was_square, s, s_prime)
    c = fe.select(was_square, neg_one, r)
    n = fe.sub(
        fe.mul(fe.mul(c, fe.sub(r, one)), fe.constant(SF.D_MINUS_ONE_SQ, batch)), v
    )
    w0 = fe.mul(fe.mul_small(s, 2), v)
    w1 = fe.mul(n, fe.constant(SF.SQRT_AD_MINUS_ONE, batch))
    ssq = fe.sqr(s)
    w2 = fe.sub(one, ssq)
    w3 = fe.add(one, ssq)
    return PointArray(fe.mul(w0, w3), fe.mul(w2, w1), fe.mul(w1, w3), fe.mul(w0, w2))


def from_uniform_bytes(data: np.ndarray) -> PointArray:
    """(N, 64) uint8 → batched RistrettoPoint::from_uniform_bytes.

    Used to derive BulletproofGens on-device: the SHAKE-256 XOF streams come
    from the host (spec.generators), the two Elligator maps + add run
    batched on TPU (replaces bulletproofs generators.rs chains).
    """
    data = np.asarray(data, dtype=np.uint8).reshape(-1, 64)
    r1 = jnp.asarray(fe.from_bytes_array(np.ascontiguousarray(data[:, :32])))
    r2 = jnp.asarray(fe.from_bytes_array(np.ascontiguousarray(data[:, 32:])))
    return add(elligator_map(r1), elligator_map(r2))


def compress_to_bytes(p: PointArray) -> np.ndarray:
    """Host helper: batched encode → (N, 32) uint8."""
    return fe.to_bytes_array(compress(p))


@jax.jit
def _tree_sum_pow2(p: PointArray) -> PointArray:
    """Hillis-Steele reduction over the LAST axis (a power of two) with one
    compiled loop body: each iteration folds acc[i] += acc[i + stride] for
    i < stride, via a dynamic roll + masked select. log2(N) iterations of
    the same-shape `add` — one compile, log launches.
    """
    n = p.x.shape[-1]
    steps = int(np.log2(n))
    idx = jax.lax.broadcasted_iota(jnp.int32, p.x.shape[-1:], 0)

    def body(t, acc):
        stride = jnp.int32(n) >> (t + 1)
        gidx = jnp.clip(idx + stride, 0, n - 1)
        shifted = PointArray(
            jnp.take(acc.x, gidx, axis=-1),
            jnp.take(acc.y, gidx, axis=-1),
            jnp.take(acc.z, gidx, axis=-1),
            jnp.take(acc.t, gidx, axis=-1),
        )
        combined = add(acc, shifted)
        return select(idx < stride, combined, acc)

    acc = jax.lax.fori_loop(0, steps, body, p)
    return PointArray(acc.x[..., :1], acc.y[..., :1], acc.z[..., :1], acc.t[..., :1])


def tree_sum_groups(p: PointArray, group: int) -> PointArray:
    """Per-group point sums over contiguous groups of `group` lanes:
    (16, G·group) → (16, G). The chunk-batched prover's reduction
    primitive (all n_partition chunks' MSMs in one device call)."""
    if use_pallas():
        from . import kernels

        return PointArray(*kernels.tree_sum_groups(tuple(p), group))
    L = p.x.shape[-1]
    G = L // group
    rp = PointArray(*[c.reshape(16, G, group) for c in p])
    out = tree_sum(rp, axis=1)
    return PointArray(*[c.reshape(16, G) for c in out])


def tree_sum(p: PointArray, axis: int = 0) -> PointArray:
    """Sum a batch of points along a batch axis (log-depth, one compiled
    body) — the TPU-native substitute for rayon fold loops
    (pedersen_ops.rs:61-69). Pads to a power of two with the identity.
    """
    if use_pallas() and p.x.ndim == 2 and axis == 0:
        from . import kernels

        return PointArray(*kernels.tree_sum(tuple(p)))
    ax = axis + 1  # skip limb dim
    if ax != p.x.ndim - 1:
        # move target axis last
        perm = list(range(p.x.ndim))
        perm.append(perm.pop(ax))
        p = PointArray(*[jnp.transpose(c, perm) for c in p])
    n = p.x.shape[-1]
    m = 1 if n == 0 else 1 << (n - 1).bit_length()
    if m != n:
        ident = identity(p.x.shape[1:-1] + (m - n,))
        ident = PointArray(*[
            jnp.broadcast_to(c, p.x.shape[:-1] + (m - n,)) for c in ident
        ])
        p = PointArray(*[
            jnp.concatenate([a, b], axis=-1) for a, b in zip(p, ident)
        ])
    out = _tree_sum_pow2(p)
    if ax != out.x.ndim - 1:
        perm = list(range(out.x.ndim))
        perm.insert(ax, perm.pop(-1))
        out = PointArray(*[jnp.transpose(c, perm) for c in out])
    return out
