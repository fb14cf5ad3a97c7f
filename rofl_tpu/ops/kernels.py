"""Fused Pallas TPU kernels for the curve/scalar hot paths.

Why this module exists (measured on TPU v5e, scripts/calibrate_tpu.py):
the pure-jnp limb kernels in ops/fe.py run ~100x below the VPU compute
bound (fe.mul 0.06 G/s vs ~4.7 T uint32-ops/s raw) because every field op
materializes its (16, N) limbs through HBM (optimization barriers + pad /
stack layout ops), and XLA compile time explodes with graph fan-out
(122 s for a 10-mul chain). One fused Pallas kernel keeps the whole op
chain in VMEM: 41.5 G field-muls/s, bit-exact, 8 s compile
(scripts/proto_pallas.py).

Design:
  * A field element inside a kernel is a Python list of 16 (TILE,) uint32
    vectors (radix-2^16 limbs, same weakly-reduced representation and
    identical algorithms as ops/fe.py — bit-exact by construction).
  * A point is 4 such lists (extended twisted-Edwards X, Y, Z, T).
  * Public wrappers take/return the (16, N) uint32 arrays & PointArray
    used everywhere else. Every pallas_call runs at a CANONICAL lane
    count (pad to S_PAD, else chunks of K_CHUNK): Mosaic compiles per
    (kernel, block, grid) and a single remote compile costs 15-90 s with
    no parallelism, but identical-shape calls dedupe across jits and
    persist in the compilation cache — so the whole framework needs
    O(#kernels) compiles instead of O(#kernels x #workload-shapes).
    ops/curve.py & ops/sc.py route here on TPU.
  * Heavy sequential structure (256-bit double-and-add ladders, inversion
    chains) lives INSIDE kernels as fori_loops: one compiled body, zero
    HBM round-trips per step.

Replaces the AVX2 SIMD backend of curve25519-dalek-ng that the reference
builds on (rofl_crypto/Cargo.toml:21, SURVEY.md §2.1 L0).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec import field as SF
from ..spec import scalar as SSP

NLIMB = 16
MASK = np.uint32(0xFFFF)
U38 = np.uint32(38)
TILE = 1024  # lanes per block; (16, 1024) uint32 = 64 KiB per operand

def _interpret() -> bool:
    """Read per call (not at import) so conformance tests can flip
    ROFL_PALLAS=interp for just their own module."""
    return os.environ.get("ROFL_PALLAS", "").lower() == "interp"


# =============================================================================
# in-kernel field arithmetic (lists of (TILE,) uint32 vectors)
# =============================================================================


def _carry(limbs):
    out = []
    c = jnp.zeros_like(limbs[0])
    for k in range(NLIMB):
        v = limbs[k] + c
        out.append(v & MASK)
        c = v >> 16
    return out, c


def f_norm(limbs):
    """Carry-propagate limbs (< 2^27 each) to fully-carried < 2^256
    (ops/fe.py _normalize, minus the XLA fusion barrier)."""
    limbs, c = _carry(limbs)
    limbs[0] = limbs[0] + c * U38
    limbs, c = _carry(limbs)
    limbs[0] = limbs[0] + c * U38
    limbs, _ = _carry(limbs)
    return limbs


def f_mul(a, b):
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
    return f_norm(folded)


def f_sqr(a):
    return f_mul(a, a)


# 4p saturated limbwise (ops/fe.py _FOUR_P_SAT)
_FOUR_P = [0x1FFB4] + [0x1FFFE] * 15
_P_LIMBS = [(SF.P >> (16 * k)) & 0xFFFF for k in range(NLIMB)]


def f_add(a, b):
    return f_norm([a[k] + b[k] for k in range(NLIMB)])


def f_sub(a, b):
    return f_norm([a[k] + np.uint32(_FOUR_P[k]) - b[k] for k in range(NLIMB)])


def f_neg(a):
    return f_norm([np.uint32(_FOUR_P[k]) - a[k] for k in range(NLIMB)])


def f_mul_small(a, c: int):
    cc = np.uint32(c)
    return f_norm([a[k] * cc for k in range(NLIMB)])


def f_select(cond, a_true, a_false):
    return [jnp.where(cond, a_true[k], a_false[k]) for k in range(NLIMB)]


def f_const(v: int, ref):
    """Constant broadcast to the block shape of `ref` (a (TILE,) vector)."""
    v %= SF.P
    return [
        jnp.full_like(ref, np.uint32((v >> (16 * k)) & 0xFFFF))
        for k in range(NLIMB)
    ]


def f_canon(a):
    """Canonical representative in [0, p) (ops/fe.py canonicalize)."""
    for _ in range(2):
        diff = []
        borrow = jnp.zeros_like(a[0])
        for k in range(NLIMB):
            v = a[k] + np.uint32(0x10000) - np.uint32(_P_LIMBS[k]) - borrow
            diff.append(v & MASK)
            borrow = np.uint32(1) - (v >> 16)
        ge = borrow == 0
        a = [jnp.where(ge, diff[k], a[k]) for k in range(NLIMB)]
    return a


def f_eq(a, b):
    ca, cb = f_canon(a), f_canon(b)
    acc = ca[0] == cb[0]
    for k in range(1, NLIMB):
        acc = acc & (ca[k] == cb[k])
    return acc


def f_is_negative(a):
    return (f_canon(a)[0] & np.uint32(1)) == 1


def f_cabs(a):
    return f_select(f_is_negative(a), f_neg(a), a)


def f_is_zero(a):
    ca = f_canon(a)
    acc = ca[0] == 0
    for k in range(1, NLIMB):
        acc = acc & (ca[k] == 0)
    return acc


def _stack(limbs):
    # limbs are (1, T) rows; concatenate back to (16, T)
    return jnp.concatenate(limbs, axis=0)


def _unstack(arr):
    # keep every limb 2-D: Mosaic's vector layout inference crashes on
    # 1-D loop-carried values (layout_rank check), so rows stay (1, T)
    return [arr[k:k + 1, :] for k in range(NLIMB)]


def _sqr_n_loop(a, n: int):
    """n sequential squarings via fori_loop (one compiled body)."""
    if n <= 3:
        for _ in range(n):
            a = f_sqr(a)
        return a
    out = jax.lax.fori_loop(
        0, n, lambda _, x: _stack(f_sqr(_unstack(x))), _stack(a)
    )
    return _unstack(out)


def f_pow22501(x):
    """(x^(2^250-1), x^11) — shared prefix of inv and sqrt chains."""
    t0 = f_sqr(x)
    t1 = _sqr_n_loop(t0, 2)
    t2 = f_mul(x, t1)
    t3 = f_mul(t0, t2)
    t4 = f_sqr(t3)
    t5 = f_mul(t2, t4)
    t6 = f_mul(_sqr_n_loop(t5, 5), t5)
    t7 = f_mul(_sqr_n_loop(t6, 10), t6)
    t8 = f_mul(_sqr_n_loop(t7, 20), t7)
    t9 = f_mul(_sqr_n_loop(t8, 10), t6)
    t10 = f_mul(_sqr_n_loop(t9, 50), t9)
    t11 = f_mul(_sqr_n_loop(t10, 100), t10)
    t12 = f_mul(_sqr_n_loop(t11, 50), t9)
    return t12, t3


def f_inv(a):
    t12, t3 = f_pow22501(a)
    return f_mul(_sqr_n_loop(t12, 5), t3)


def f_pow_p58(a):
    t12, _ = f_pow22501(a)
    return f_mul(_sqr_n_loop(t12, 2), a)


def f_sqrt_ratio_m1(u, v):
    """Batched sqrt_ratio_i (ops/fe.py sqrt_ratio_m1)."""
    v3 = f_mul(f_sqr(v), v)
    v7 = f_mul(f_sqr(v3), v)
    r = f_mul(f_mul(u, v3), f_pow_p58(f_mul(u, v7)))
    check = f_mul(v, f_sqr(r))
    u_neg = f_neg(u)
    correct_sign = f_eq(check, u)
    flipped_sign = f_eq(check, u_neg)
    sqrt_m1 = f_const(SF.SQRT_M1, u[0])
    flipped_sign_i = f_eq(check, f_mul(u_neg, sqrt_m1))
    r = f_select(flipped_sign | flipped_sign_i, f_mul(r, sqrt_m1), r)
    r = f_cabs(r)
    return correct_sign | flipped_sign, r


# =============================================================================
# in-kernel point arithmetic (a point = 4 limb lists)
# =============================================================================


def p_add(p, q):
    """Unified extended addition add-2008-hwcd-3, a=-1 (ops/curve.py add)."""
    px, py, pz, pt = p
    qx, qy, qz, qt = q
    a = f_mul(f_sub(py, px), f_sub(qy, qx))
    b = f_mul(f_add(py, px), f_add(qy, qx))
    c = f_mul(f_mul(pt, f_const(SF.D2, pt[0])), qt)
    d = f_mul_small(f_mul(pz, qz), 2)
    e = f_sub(b, a)
    f = f_sub(d, c)
    g = f_add(d, c)
    h = f_add(b, a)
    return (f_mul(e, f), f_mul(g, h), f_mul(f, g), f_mul(e, h))


def p_double(p):
    px, py, pz, pt = p
    a = f_sqr(px)
    b = f_sqr(py)
    c = f_mul_small(f_sqr(pz), 2)
    d = f_neg(a)
    e = f_sub(f_sub(f_sqr(f_add(px, py)), a), b)
    g = f_add(d, b)
    f = f_sub(g, c)
    h = f_sub(d, b)
    return (f_mul(e, f), f_mul(g, h), f_mul(f, g), f_mul(e, h))


def p_select(cond, p_true, p_false):
    return tuple(
        f_select(cond, a, b) for a, b in zip(p_true, p_false)
    )


def p_identity(ref):
    zero = [jnp.zeros_like(ref) for _ in range(NLIMB)]
    one = [jnp.zeros_like(ref) for _ in range(NLIMB)]
    one[0] = jnp.ones_like(ref)
    return (list(zero), list(one), list(one), list(zero))


def p_stack(p):
    return jnp.stack([_stack(c) for c in p])  # (4, 16, TILE)


def p_unstack(arr):
    return tuple(_unstack(arr[i]) for i in range(4))


def _read_pt(refs):
    return tuple(_unstack(r[:, :]) for r in refs)


def _write_pt(refs, p):
    for r, c in zip(refs, p):
        r[:, :] = _stack(c)


# =============================================================================
# kernels + public wrappers
# =============================================================================


# Canonical-shape execution (round 3). Mosaic compiles per (kernel, block,
# grid) triple and a single compile through the remote tunnel costs
# 15-90 s with NO cross-compile parallelism — but identical-shape
# pallas_calls dedupe across jits and persist in the compilation cache
# (measured: a jit with two 65536-lane msm instances compiled in 24 s
# right after the first 65536 compile took 180 s). So every kernel runs at
# ONE canonical lane count: inputs pad to a multiple of K_CHUNK and the
# wrapper loops identical-shape calls, making the total number of Mosaic
# compiles O(#kernels) for the whole framework instead of O(#kernels x
# #workload-shapes). In interpreter mode (CPU conformance tests) padding
# to 32k lanes would make the interpreted kernels crawl, so the old
# tile-level padding is used there.
K_CHUNK = int(os.environ.get("ROFL_KERNEL_CHUNK", str(32768)))
S_PAD = int(os.environ.get("ROFL_KERNEL_SMALL", str(4096)))  # small canon


def _tile_for(n: int, cap: int = TILE) -> int:
    """Block width: capped, 128-aligned, pow2 below the cap."""
    if n >= cap:
        return cap
    b = -(-n // 128)
    return 128 * (1 << (b - 1).bit_length()) if b > 1 else 128


def _plan(n: int, tile_cap: int = TILE) -> tuple[int, int, int]:
    """(padded_total, chunk, tile) for a lane count n."""
    if _interpret():
        tile = _tile_for(n, tile_cap)
        m = -(-n // tile) * tile
        return m, m, tile
    if n <= S_PAD:
        return S_PAD, S_PAD, min(tile_cap, S_PAD)
    m = -(-n // K_CHUNK) * K_CHUNK
    return m, K_CHUNK, min(tile_cap, K_CHUNK)


def _pad_lanes_to(arr, m):
    n = arr.shape[-1]
    if m == n:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(0, m - n)]
    return jnp.pad(arr, pad)


def _pad_identity_to(c, coord_idx, m):
    """Pad point-coord lanes to m with identity coords (0,1,1,0)."""
    n = c.shape[-1]
    if m == n:
        return c
    fill = np.zeros((NLIMB, m - n), np.uint32)
    if coord_idx in (1, 2):  # y = z = 1
        fill[0] = 1
    return jnp.concatenate([c, jnp.asarray(fill)], axis=-1)


def _chunked_pallas(kernel, ins, in_rows, out_rows, tile_cap=TILE,
                    out_width=None):
    """Run `kernel` over canonical chunks of the padded lane axis.

    ins: arrays (rows_i, total) sharing the padded lane count; out_rows:
    row counts of the outputs; out_width: output lanes per input lane tile
    (128 for the reducing msm kernel, tile otherwise). Returns concatenated
    outputs at the padded lane count (caller slices)."""
    total = ins[0].shape[-1]
    chunk = total if _interpret() else min(total, K_CHUNK)
    tile = min(tile_cap, chunk)
    ow = out_width or tile
    nb = chunk // tile
    in_specs = [
        pl.BlockSpec((r, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        for r in in_rows
    ]
    out_specs = tuple(
        pl.BlockSpec((r, ow), lambda i: (0, i), memory_space=pltpu.VMEM)
        for r in out_rows
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((r, nb * ow), jnp.uint32) for r in out_rows
    )
    single = len(out_rows) == 1
    call = pl.pallas_call(
        kernel,
        out_shape=out_shape[0] if single else out_shape,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs[0] if single else out_specs,
        interpret=_interpret(),
    )
    outs = []
    for c0 in range(0, total, chunk):
        res = call(*[a[:, c0:c0 + chunk] for a in ins])
        outs.append((res,) if single else res)
    cat = tuple(
        jnp.concatenate([o[i] for o in outs], axis=-1)
        if len(outs) > 1 else outs[0][i]
        for i in range(len(out_rows))
    )
    return cat[0] if single else cat




def _pt_flat(p):
    """PointArray-like (x,y,z,t) of (16, ...) → tuple of (16, N) 2-D."""
    return tuple(c.reshape(NLIMB, -1) for c in p)


# -- point add / double / select-add -----------------------------------------


def _add_kernel(px, py, pz, pt, qx, qy, qz, qt, ox, oy, oz, ot):
    r = p_add(_read_pt((px, py, pz, pt)), _read_pt((qx, qy, qz, qt)))
    _write_pt((ox, oy, oz, ot), r)


def _double_kernel(px, py, pz, pt, ox, oy, oz, ot):
    r = p_double(_read_pt((px, py, pz, pt)))
    _write_pt((ox, oy, oz, ot), r)



@functools.partial(jax.jit, static_argnums=())
def point_add(p, q):
    """Batched point add on (x,y,z,t) tuples of (16, N) uint32."""
    shapes = jnp.broadcast_shapes(p[0].shape, q[0].shape)
    p = tuple(jnp.broadcast_to(c, shapes) for c in p)
    q = tuple(jnp.broadcast_to(c, shapes) for c in q)
    p = _pt_flat(p)
    q = _pt_flat(q)
    n = p[0].shape[-1]
    m, _, tile = _plan(n)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    qq = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(q))
    out = _chunked_pallas(_add_kernel, list(pp + qq), [NLIMB] * 8,
                          [NLIMB] * 4, tile_cap=tile)
    return tuple(c[:, :n].reshape(shapes) for c in out)


@functools.partial(jax.jit, static_argnums=())
def point_double(p):
    shapes = p[0].shape
    p = _pt_flat(p)
    n = p[0].shape[-1]
    m, _, tile = _plan(n)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    out = _chunked_pallas(_double_kernel, list(pp), [NLIMB] * 4,
                          [NLIMB] * 4, tile_cap=tile)
    return tuple(c[:, :n].reshape(shapes) for c in out)


# -- full variable-base scalar multiplication (256-bit ladder in-kernel) -----


def _as_lists(p):
    return tuple(list(c) for c in p)


def _scalar_mul_kernel(k, px, py, pz, pt, ox, oy, oz, ot):
    p0 = _read_pt((px, py, pz, pt))
    acc0 = p_identity(p0[0][0])

    def body(i, state):
        acc, addend = state
        limb = k[pl.ds(i >> 4, 1), :]
        bit = (limb >> (i & 15).astype(jnp.uint32)) & 1
        new_acc = p_select(bit == 1, p_add(acc, addend), acc)
        return _as_lists(new_acc), _as_lists(p_double(addend))

    acc, _ = jax.lax.fori_loop(
        0, 256, body, (_as_lists(acc0), _as_lists(p0))
    )
    _write_pt((ox, oy, oz, ot), acc)



def _make_smul_window_kernel(W: int):
    """W-bit windowed per-lane scalar mul: per lane precompute the 2^W-1
    small multiples (14 adds at W=4), then 256/W windows of W doublings +
    a select-tree lookup + ONE add. vs the 1-bit ladder: adds drop
    256 → 256/W + 2^W-2 while doublings stay 256 (they are per-lane, so
    Horner cannot share them) — ~1.5× fewer point-ops at W=4. VMEM bounds
    W exactly like the windowed MSM kernel (multiples live on the kernel
    stack), so blocks cap at 256 lanes."""
    assert 16 % W == 0
    n_win = 256 // W

    def kernel(k, px, py, pz, pt, ox, oy, oz, ot):
        P = _read_pt((px, py, pz, pt))
        ident = p_identity(P[0][0])
        M = [ident, P]
        for j in range(2, 1 << W):
            M.append(p_double(M[j // 2]) if j % 2 == 0
                     else p_add(M[j - 1], P))

        def body(t, acc_st):
            acc = p_unstack(acc_st)
            wi = n_win - 1 - t
            b = wi * W
            limb = k[pl.ds(b >> 4, 1), :]
            sh = (b & 15).astype(jnp.uint32)
            digit = (limb >> sh) & ((1 << W) - 1)
            cands = M
            for lvl in range(W):
                bit = (digit >> lvl) & 1
                cands = [p_select(bit == 1, cands[2 * i + 1], cands[2 * i])
                         for i in range(len(cands) // 2)]
            for _ in range(W):
                acc = p_double(acc)
            acc = p_add(acc, cands[0])
            return p_stack(tuple(list(c) for c in acc))

        acc0 = p_stack(p_identity(P[0][0]))
        acc = jax.lax.fori_loop(0, n_win, body, acc0)
        _write_pt((ox, oy, oz, ot), p_unstack(acc))

    return kernel


@functools.lru_cache(maxsize=4)
def _smul_window_kernel_cached(W: int):
    return _make_smul_window_kernel(W)


def _smul_kernel_and_tile():
    # W=1 default: the W=4 windowed variant measured only +3% on the v5e
    # (the 256 per-lane doublings dominate) while its kernel body costs
    # 2-4 min of Mosaic compile PER GLUE SHAPE and pushed the d=50k prove
    # over the TPU resource limit (RESULTS_r5.md) — not worth it.
    w = int(os.environ.get("ROFL_SMUL_W", "1"))
    if w <= 1:
        return _scalar_mul_kernel, 512
    return _smul_window_kernel_cached(w), 256


@functools.partial(jax.jit, static_argnums=())
def scalar_mul(p, k):
    """Per-lane variable-base scalar mul: windowed in-VMEM ladder
    (W=ROFL_SMUL_W, default 4; W=1 is the classic double-and-add)."""
    shapes = p[0].shape
    p = _pt_flat(p)
    n = p[0].shape[-1]
    k = jnp.broadcast_to(k.reshape(NLIMB, -1), (NLIMB, n))
    kern, cap = _smul_kernel_and_tile()
    m, _, tile = _plan(n, tile_cap=cap)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    kk = _pad_lanes_to(k, m)
    out = _chunked_pallas(kern, [kk, *pp], [NLIMB] * 5,
                          [NLIMB] * 4, tile_cap=tile)
    return tuple(c[:, :n].reshape(shapes) for c in out)


# -- block tree-sum (point reduction) -----------------------------------------


@functools.partial(jax.jit, static_argnums=())
def tree_sum(p):
    """Σ over the lane axis → single point as (16, 1) coords.

    Log-depth halving point_adds; every add runs at a canonical lane
    count, so the whole reduction ladder reuses the ONE compiled add
    kernel (total lane work ≈ n adds — same as a block-sum design, with
    zero extra kernel shapes)."""
    p = _pt_flat(p)
    n = p[0].shape[-1]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    p = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    w = m // 2
    while w >= 1:
        left = tuple(c[:, :w] for c in p)
        right = tuple(c[:, w:2 * w] for c in p)
        p = point_add(left, right)
        w //= 2
    return tuple(c[:, :1] for c in p)


def _halving_groups(point_add_fn, arrs, G, width, pair_shape):
    """Reduce contiguous groups of `width` (≤128, pow2) columns to 1 via
    halving point/scalar adds with XLA reshapes between kernel calls."""
    while width > 1:
        w = width // 2
        if pair_shape == 4:
            left = tuple(
                c.reshape(NLIMB, G, width)[:, :, :w].reshape(NLIMB, -1)
                for c in arrs)
            right = tuple(
                c.reshape(NLIMB, G, width)[:, :, w:].reshape(NLIMB, -1)
                for c in arrs)
            arrs = point_add_fn(left, right)
        else:
            left = arrs.reshape(NLIMB, G, width)[:, :, :w].reshape(NLIMB, -1)
            right = arrs.reshape(NLIMB, G, width)[:, :, w:].reshape(NLIMB, -1)
            arrs = point_add_fn(left, right)
        width = w
    return arrs


@functools.partial(jax.jit, static_argnums=(1,))
def tree_sum_groups(p, group: int):
    """Per-group point sums: lanes = G·group (group pow2) → (16, G)
    coords, group-major order preserved — halving point_adds at canonical
    shapes (see tree_sum)."""
    p = _pt_flat(p)
    L = p[0].shape[-1]
    assert L % group == 0 and group & (group - 1) == 0
    G = L // group
    return _halving_groups(point_add, p, G, group, 4)


@functools.partial(jax.jit, static_argnums=(1,))
def sc_sum_groups(a, group: int):
    """Per-group mod-l sums: (16, G·group) → (16, G)."""
    a = a.reshape(NLIMB, -1)
    L = a.shape[-1]
    assert L % group == 0 and group & (group - 1) == 0
    G = L // group
    return _halving_groups(sc_add, a, G, group, 1)


# -- ristretto compress / decompress ------------------------------------------


def _compress_kernel(px, py, pz, pt, o_ref):
    X, Y, Z, T = _read_pt((px, py, pz, pt))
    u1 = f_mul(f_add(Z, Y), f_sub(Z, Y))
    u2 = f_mul(X, Y)
    _, inv_sqrt = f_sqrt_ratio_m1(
        f_const(1, X[0]), f_mul(u1, f_sqr(u2))
    )
    den1 = f_mul(inv_sqrt, u1)
    den2 = f_mul(inv_sqrt, u2)
    z_inv = f_mul(f_mul(den1, den2), T)
    sqrt_m1 = f_const(SF.SQRT_M1, X[0])
    ix0 = f_mul(X, sqrt_m1)
    iy0 = f_mul(Y, sqrt_m1)
    enchanted = f_mul(den1, f_const(SF.INVSQRT_A_MINUS_D, X[0]))
    rotate = f_is_negative(f_mul(T, z_inv))
    x = f_select(rotate, iy0, X)
    y = f_select(rotate, ix0, Y)
    den_inv = f_select(rotate, enchanted, den2)
    y = f_select(f_is_negative(f_mul(x, z_inv)), f_neg(y), y)
    s = f_cabs(f_mul(den_inv, f_sub(Z, y)))
    o_ref[:, :] = _stack(f_canon(s))


@functools.partial(jax.jit, static_argnums=())
def compress(p):
    """Batched ristretto encode → canonical field limbs (16, N)."""
    shapes = p[0].shape
    p = _pt_flat(p)
    n = p[0].shape[-1]
    m, _, tile = _plan(n)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    out = _chunked_pallas(_compress_kernel, list(pp), [NLIMB] * 4,
                          [NLIMB], tile_cap=tile)
    return out[:, :n].reshape(shapes)


def _decompress_kernel(s_ref, ox, oy, oz, ot, ov):
    s = _unstack(s_ref[:, :])
    ss = f_sqr(s)
    one = f_const(1, s[0])
    u1 = f_sub(one, ss)
    u2 = f_add(one, ss)
    u2_sqr = f_sqr(u2)
    d = f_const(SF.D, s[0])
    v = f_sub(f_neg(f_mul(d, f_sqr(u1))), u2_sqr)
    was_square, inv_sqrt = f_sqrt_ratio_m1(one, f_mul(v, u2_sqr))
    den_x = f_mul(inv_sqrt, u2)
    den_y = f_mul(f_mul(inv_sqrt, den_x), v)
    x = f_cabs(f_mul(f_mul_small(s, 2), den_x))
    y = f_mul(u1, den_y)
    t = f_mul(x, y)
    valid = (
        was_square
        & ~f_is_negative(t)
        & ~f_is_zero(y)
        & ~f_is_negative(s)
    )
    _write_pt((ox, oy, oz, ot), (x, y, f_canon(one), t))
    ov[:, :] = jnp.broadcast_to(
        valid.astype(jnp.uint32), ov.shape
    )


@functools.partial(jax.jit, static_argnums=())
def decompress(s):
    """Batched ristretto decode from field limbs (16, N) →
    ((x,y,z,t), valid mask). Canonicality of the raw bytes is the caller's
    job (matches ops/curve.py decompress)."""
    shape = s.shape
    s = s.reshape(NLIMB, -1)
    n = s.shape[-1]
    m, _, tile = _plan(n)
    ss = _pad_lanes_to(s, m)
    out = _chunked_pallas(_decompress_kernel, [ss], [NLIMB],
                          [NLIMB] * 4 + [8], tile_cap=tile)
    pt = tuple(c[:, :n].reshape(shape) for c in out[:4])
    valid = out[4][0, :n].astype(jnp.bool_).reshape(shape[1:])
    return pt, valid


# -- bit-plane Horner MSM (the TPU-native Pippenger) ---------------------------
#
# Σ_i k_i·P_i = Σ_b 2^b · S_b with S_b = Σ_{i: bit_b(k_i)} P_i. The 253
# doublings are shared across ALL lanes (Horner over bit-planes), and each
# S_b is a masked tree reduction — fully vectorizable. This is exactly
# Pippenger with 1-bit windows: wider windows need per-lane scatter into
# bucket arrays, which TPU vregs cannot do (no cross-sublane scatter), and
# emulating the buckets with per-digit masked reductions costs w reductions
# per w-bit window — strictly worse than w=1. Point-op count per lane:
# ~(1 - 128/T) adds/bit ≈ 1.1 incl. the 128-wide Horner ops, vs the
# per-lane ladder's 2 (double+add)/bit. Replaces dalek's Pippenger
# (VERDICT r1 item 2; reference: curve25519-dalek-ng multiscalar_mul used
# by range_proof_vec/mod.rs:149-216 verify and bulletproofs prove).


def _msm_bitplane_kernel(k_ref, px, py, pz, pt, ox, oy, oz, ot):
    """Per-block partial MSM over the block's T lanes → a 128-wide partial
    accumulator (lane j holds Σ over i ≡ j mod 128); the host wrapper
    point-reduces the partials."""
    T = px.shape[-1]
    P = _read_pt((px, py, pz, pt))
    ident = p_identity(P[0][0])

    def body(t, acc_st):
        acc = p_unstack(acc_st)
        b = 252 - t
        limb = k_ref[pl.ds(b >> 4, 1), :]
        bit = (limb >> (b & 15).astype(jnp.uint32)) & 1
        sel = p_select(bit == 1, P, ident)
        w = T
        while w > 128:
            h = w // 2
            left = tuple([r[:, :h] for r in c] for c in sel)
            right = tuple([r[:, h:w] for r in c] for c in sel)
            sel = p_add(left, right)
            w = h
        acc = p_add(p_double(acc), sel)
        return p_stack(tuple(list(c) for c in acc))

    acc0 = p_stack(p_identity(P[0][0][:, :128]))
    acc = jax.lax.fori_loop(0, 253, body, acc0)
    _write_pt((ox, oy, oz, ot), p_unstack(acc))


def _make_msm_window_kernel(W: int):
    """W-bit windowed-Horner MSM partials ("Pippenger without buckets"):
    per lane, precompute M_j = j·P for j = 1..2^W-1, then ceil(256/W)
    windows of acc = 2^W·acc + Σ_lanes M_{digit}.

    Why this beats the 1-bit bit-plane kernel: the per-(term, window)
    cost is 2^W-1 coordinate SELECTS (a select is 64 where-ops ≈ 1% of a
    point add) + ONE share of the masked tree reduction, so reductions —
    the dominant cost — drop 253 → 256/W + (2^W-2)-amortized.  True
    bucketed Pippenger would need per-lane scatter, which TPU vregs
    cannot do; a binary select tree against precomputed multiples is the
    vector-machine equivalent.  W is VMEM-bounded: the 2^W-1 multiples ×
    4 coords × (16, T) u32 live on the kernel stack (w=4 at T=1024
    overflows the 16 MB scoped VMEM)."""
    assert 16 % W == 0, "window must not straddle the 16-bit limbs"
    n_win = 256 // W

    def kernel(k_ref, px, py, pz, pt, ox, oy, oz, ot):
        T = px.shape[-1]
        P = _read_pt((px, py, pz, pt))
        ident = p_identity(P[0][0])

        M = [ident, P]
        for j in range(2, 1 << W):
            M.append(p_double(M[j // 2]) if j % 2 == 0
                     else p_add(M[j - 1], P))

        def body(t, acc_st):
            acc = p_unstack(acc_st)
            wi = n_win - 1 - t
            b = wi * W
            limb_lo = k_ref[pl.ds(b >> 4, 1), :]
            sh = (b & 15).astype(jnp.uint32)
            digit = (limb_lo >> sh) & ((1 << W) - 1)
            cands = M
            for lvl in range(W):
                bit = (digit >> lvl) & 1
                cands = [p_select(bit == 1, cands[2 * i + 1], cands[2 * i])
                         for i in range(len(cands) // 2)]
            sel = cands[0]
            w = T
            while w > 128:
                h = w // 2
                left = tuple([r[:, :h] for r in c] for c in sel)
                right = tuple([r[:, h:w] for r in c] for c in sel)
                sel = p_add(left, right)
                w = h
            for _ in range(W):
                acc = p_double(acc)
            acc = p_add(acc, sel)
            return p_stack(tuple(list(c) for c in acc))

        acc0 = p_stack(p_identity(P[0][0][:, :128]))
        acc = jax.lax.fori_loop(0, n_win, body, acc0)
        _write_pt((ox, oy, oz, ot), p_unstack(acc))

    return kernel


def _msm_kernel():
    w = int(os.environ.get("ROFL_MSM_W", "2"))
    if w <= 1:
        return _msm_bitplane_kernel
    return _msm_window_kernel_cached(w)


def _msm_tile(tile: int) -> int:
    """Window kernels hold 2^W-1 multiples on the VMEM stack; w=4 at
    T=1024 needs ~31 MB (>16 MB scoped limit), so cap the block at 256
    lanes (~7.7 MB). Extra 128-wide partials cost only ~0.5 point-adds
    per lane in the host-side tree_sum — far below the 64 adds/lane the
    wider window saves."""
    w = int(os.environ.get("ROFL_MSM_W", "2"))
    return min(tile, int(os.environ.get("ROFL_MSM_TILE4", "256"))) if w >= 4 else tile


@functools.lru_cache(maxsize=4)
def _msm_window_kernel_cached(W: int):
    return _make_msm_window_kernel(W)


def _msm_partials(k, p, tile):
    """Canonical-chunk windowed MSM partials: (16, lanes) → (16, lanes/
    (tile/128)) per-block 128-wide partial sums, order-preserving."""
    return _chunked_pallas(_msm_kernel(), [k, *p], [NLIMB] * 5,
                           [NLIMB] * 4, tile_cap=tile, out_width=128)


@functools.partial(jax.jit, static_argnums=())
def msm_flat(p, k):
    """Σ k_i·P_i over all lanes → (16, 1) coords. Pads with identity points
    / zero scalars (a zero bit never selects, so padding is inert)."""
    p = _pt_flat(p)
    n = p[0].shape[-1]
    k = jnp.broadcast_to(k.reshape(NLIMB, -1), (NLIMB, n))
    m, _, tile = _plan(n)
    tile = _msm_tile(tile)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    kk = _pad_lanes_to(k, m)  # zero scalars on the pad
    out = _msm_partials(kk, pp, tile)
    return tree_sum(out)


@functools.partial(jax.jit, static_argnums=(2,))
def msm_groups(p, k, group: int):
    """Per-group MSMs over contiguous groups of `group` lanes:
    (16, G·group) → (16, G).

    group >= TILE: canonical-chunk bit-plane partials (blocks never
    straddle groups) + per-group halving reduction. Smaller groups fall
    back to the per-lane ladder + group reduction — both paths reuse only
    canonical kernel shapes."""
    p = _pt_flat(p)
    n = p[0].shape[-1]
    k = jnp.broadcast_to(k.reshape(NLIMB, -1), (NLIMB, n))
    assert group & (group - 1) == 0 and n % group == 0
    G = n // group
    if group >= TILE:
        m, _, tile = _plan(n)
        tile = _msm_tile(tile)
        pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
        kk = _pad_lanes_to(k, m)
        out = _msm_partials(kk, pp, tile)
        # real partials: first n/tile blocks x 128 lanes, group-contiguous
        w = (group // tile) * 128
        out = tuple(c[:, : G * w] for c in out)
        return _halving_groups(point_add, out, G, w, 4)
    prods = scalar_mul(p, k)
    return _halving_groups(point_add, prods, G, group, 4)


# -- shared-scalar multiplication (IPA G/H folds) ------------------------------


def _shared_mul_kernel(k, px, py, pz, pt, ox, oy, oz, ot):
    """acc = k · P per lane where k is ONE scalar shared by all lanes
    (16, 128)-broadcast input; adds are SKIPPED via lax.cond on the shared
    bit, so the expected cost is 256 doublings + ~128 adds."""
    p0 = _read_pt((px, py, pz, pt))
    acc0 = p_identity(p0[0][0])

    def body(i, state):
        acc, addend = state
        limb = k[i >> 4, 0]
        bit = (limb >> (i & 15).astype(jnp.uint32)) & 1
        acc = jax.lax.cond(
            bit == 1,
            lambda a, ad: _as_lists(p_add(a, ad)),
            lambda a, ad: a,
            acc, addend,
        )
        return acc, _as_lists(p_double(addend))

    acc, _ = jax.lax.fori_loop(
        0, 256, body, (_as_lists(acc0), _as_lists(p0))
    )
    _write_pt((ox, oy, oz, ot), acc)


@functools.partial(jax.jit, static_argnums=())
def shared_scalar_mul(p, k):
    """k·P_i for one scalar k (16,) or (16, 1) across all lanes."""
    shapes = p[0].shape
    p = _pt_flat(p)
    n = p[0].shape[-1]
    kk = jnp.broadcast_to(k.reshape(NLIMB, -1)[:, :1], (NLIMB, 128))
    m, chunk, tile = _plan(n, tile_cap=512)
    pp = tuple(_pad_identity_to(c, i, m) for i, c in enumerate(p))
    nb = chunk // tile
    kspec = pl.BlockSpec((NLIMB, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((NLIMB, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _shared_mul_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((NLIMB, chunk), jnp.uint32)
                        for _ in range(4)),
        grid=(nb,),
        in_specs=[kspec] + [spec] * 4,
        out_specs=tuple([spec] * 4),
        interpret=_interpret(),
    )
    outs = [call(kk, *[c[:, c0:c0 + chunk] for c in pp])
            for c0 in range(0, m, chunk)]
    out = tuple(
        jnp.concatenate([o[i] for o in outs], axis=-1)
        if len(outs) > 1 else outs[0][i] for i in range(4)
    )
    return tuple(c[:, :n].reshape(shapes) for c in out)


# =============================================================================
# scalar field (mod l) kernels
# =============================================================================

_L = SSP.L
_DELTA = _L - 2 ** 252
_DELTA_LIMBS = [(int(_DELTA) >> (16 * k)) & 0xFFFF for k in range(8)]
_L_LIMBS16 = [(_L >> (16 * k)) & 0xFFFF for k in range(NLIMB)]


def _s_carry(limbs):
    out = []
    c = jnp.zeros_like(limbs[0])
    for v in limbs:
        v = v + c
        out.append(v & MASK)
        c = v >> 16
    out.append(c & MASK)
    out.append(c >> 16)
    if _interpret():  # XLA:CPU fusion barrier (see f_norm)
        out = list(jax.lax.optimization_barrier(tuple(out)))
    return out


def _s_mul_limbs(a, b_const):
    na, nb = len(a), len(b_const)
    ncols = na + nb - 1
    lo = [None] * ncols
    hi = [None] * ncols
    for j, bc in enumerate(b_const):
        if int(bc) == 0:
            continue
        c = np.uint32(int(bc))
        for i in range(na):
            p = a[i] * c
            k = i + j
            plo, phi = p & MASK, p >> 16
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
    return _s_carry(cols)


def _s_const_minus(limbs, big: int):
    n_sub = len(limbs)
    rem = big - (2 ** (16 * n_sub) - 1)
    assert rem >= 0
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
        term = np.uint32(sat) + zero
        if k < n_sub:
            term = term - limbs[k]
        out.append(term)
    return _s_carry(out)


def _s_split_252(limbs):
    low = list(limbs[:15]) + [limbs[15] & np.uint32(0x0FFF)]
    n = len(limbs)
    hi = []
    for k in range(n - 15):
        v = limbs[15 + k] >> 12
        if 16 + k < n:
            v = v | ((limbs[16 + k] & np.uint32(0x0FFF)) << 4)
        hi.append(v)
    return low, hi


def _s_add_lists(a, b):
    n = max(len(a), len(b))
    zero = jnp.zeros_like(a[0])
    out = [
        (a[k] if k < len(a) else zero) + (b[k] if k < len(b) else zero)
        for k in range(n)
    ]
    return _s_carry(out)


def _s_trim(limbs, bits: int):
    return limbs[: (bits + 15) // 16]


def _s_fold_once(limbs, hi_bits: int, k_mult: int):
    low, hi = _s_split_252(limbs)
    hi = _s_trim(hi, hi_bits)
    prod = _s_mul_limbs(hi, _DELTA_LIMBS)
    prod = _s_trim(prod, hi_bits + 125)
    t = _s_const_minus(prod, k_mult * _L)
    return _s_add_lists(low, t)


def _s_cond_sub_l(limbs):
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for k in range(NLIMB):
        v = limbs[k] + np.uint32(0x10000) - np.uint32(_L_LIMBS16[k]) - borrow
        diff.append(v & MASK)
        borrow = np.uint32(1) - (v >> 16)
    ge = borrow == 0
    return [jnp.where(ge, diff[k], limbs[k]) for k in range(NLIMB)]


def _s_canon(limbs, n_subs: int):
    limbs = limbs[:NLIMB] + [jnp.zeros_like(limbs[0])] * max(
        0, NLIMB - len(limbs)
    )
    for _ in range(n_subs):
        limbs = _s_cond_sub_l(limbs)
    return limbs


def _s_reduce_512(limbs):
    v1 = _s_fold_once(_s_trim(limbs, 513), hi_bits=260, k_mult=1 << 149)
    v2 = _s_fold_once(_s_trim(v1, 402), hi_bits=150, k_mult=1 << 36)
    v3 = _s_fold_once(_s_trim(v2, 290), hi_bits=38, k_mult=1)
    return _s_canon(_s_trim(v3, 254), 3)


def s_mul(a, b):
    """mod-l product of canonical 16-limb lists (ops/sc.py mul)."""
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
    prod = _s_carry(cols)
    return _s_reduce_512(prod)


def s_add(a, b):
    s = _s_carry([a[k] + b[k] for k in range(NLIMB)])
    return _s_canon(_s_trim(s, 253), 1)


def _s_l_minus(b):
    out = []
    borrow = jnp.zeros_like(b[0])
    for k in range(NLIMB):
        v = np.uint32(_L_LIMBS16[k] + 0x10000) - b[k] - borrow
        out.append(v & MASK)
        borrow = np.uint32(1) - (v >> 16)
    return out


def s_sub(a, b):
    s = _s_add_lists([a[k] for k in range(NLIMB)], _s_l_minus(b))
    return _s_canon(_s_trim(s, 254), 2)


def _sc_mul_kernel(a_ref, b_ref, o_ref):
    a = _unstack(a_ref[:, :])
    b = _unstack(b_ref[:, :])
    o_ref[:, :] = _stack(s_mul(a, b))


@functools.partial(jax.jit, static_argnums=())
def sc_mul(a, b):
    """(16, N) x (16, N) → (16, N) canonical mod-l product."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(NLIMB, -1)
    b = jnp.broadcast_to(b, shape).reshape(NLIMB, -1)
    n = a.shape[-1]
    m, _, tile = _plan(n)
    out = _chunked_pallas(_sc_mul_kernel,
                          [_pad_lanes_to(a, m), _pad_lanes_to(b, m)],
                          [NLIMB] * 2, [NLIMB], tile_cap=tile)
    return out[:, :n].reshape(shape)


def _sc_reduce_wide_kernel(b_ref, o_ref):
    """(64, T) LE byte columns → canonical scalars (Scalar::
    from_bytes_mod_order_wide)."""
    limbs = [
        b_ref[2 * k:2 * k + 1, :] | (b_ref[2 * k + 1:2 * k + 2, :] << 8)
        for k in range(32)
    ]
    o_ref[:, :] = _stack(_s_reduce_512(limbs))


@functools.partial(jax.jit, static_argnums=())
def sc_reduce_wide(byte_cols):
    """(64, N) uint32 byte columns → (16, N) canonical scalars."""
    n = byte_cols.shape[-1]
    m, _, tile = _plan(n)
    out = _chunked_pallas(_sc_reduce_wide_kernel,
                          [_pad_lanes_to(byte_cols, m)],
                          [64], [NLIMB], tile_cap=tile)
    return out[:, :n]


def _sc_sub_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = _stack(s_sub(_unstack(a_ref[:, :]), _unstack(b_ref[:, :])))


@functools.partial(jax.jit, static_argnums=())
def sc_sub(a, b):
    """(16, N) - (16, N) mod l (canonical inputs)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(NLIMB, -1)
    b = jnp.broadcast_to(b, shape).reshape(NLIMB, -1)
    n = a.shape[-1]
    m, _, tile = _plan(n)
    out = _chunked_pallas(_sc_sub_kernel,
                          [_pad_lanes_to(a, m), _pad_lanes_to(b, m)],
                          [NLIMB] * 2, [NLIMB], tile_cap=tile)
    return out[:, :n].reshape(shape)



def _sc_add_kernel(a_ref, b_ref, o_ref):
    o_ref[:, :] = _stack(s_add(_unstack(a_ref[:, :]), _unstack(b_ref[:, :])))


@functools.partial(jax.jit, static_argnums=())
def sc_add(a, b):
    """(16, N) + (16, N) mod l."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(NLIMB, -1)
    b = jnp.broadcast_to(b, shape).reshape(NLIMB, -1)
    n = a.shape[-1]
    m, _, tile = _plan(n)
    out = _chunked_pallas(_sc_add_kernel,
                          [_pad_lanes_to(a, m), _pad_lanes_to(b, m)],
                          [NLIMB] * 2, [NLIMB], tile_cap=tile)
    return out[:, :n].reshape(shape)


@functools.partial(jax.jit, static_argnums=())
def sc_sum(a):
    """Σ mod l over the lane axis of (16, N) canonical scalars → (16, 1):
    halving sc_adds at canonical shapes (0 is the additive identity)."""
    a = a.reshape(NLIMB, -1)
    n = a.shape[-1]
    m = 1 << (n - 1).bit_length() if n > 1 else 1
    a = _pad_lanes_to(a, m)
    w = m // 2
    while w >= 1:
        a = sc_add(a[:, :w], a[:, w:2 * w])
        w //= 2
    return a[:, :1]
