"""Baby-step giant-step discrete log on device — replaces bsgs32.rs.

The reference uses a hashbrown HashMap of compressed points → u16
(bsgs32.rs:14-34) walked point-at-a-time under rayon. TPU-native version:
the table is a SORTED array of compressed-point keys ((m+1, 8) uint32) with
a parallel value array; lookups are branch-free batched binary searches
(log2(m) fixed steps), and the giant-step walk (cur -= mG, bsgs32.rs:48-58)
is a static unroll of batched point adds with masked result capture. The
negative fallback (bsgs32.rs:64-73) searches -M in the same pass.

Table layout/semantics match BSGSTable::new(m): entries for 0..m inclusive,
giant step m, value = i*m + pow, default max_it = 2^n_bits / m.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, fe
from .curve import PointArray
from ..spec import ristretto as SR
from ..spec import scalar as SS


def _limbs_to_keys(limbs: jnp.ndarray) -> jnp.ndarray:
    """(16, N) canonical field limbs → (8, N) uint32 keys (lexicographic
    order on the key tuple, most-significant component first)."""
    ks = [limbs[2 * j] | (limbs[2 * j + 1] << 16) for j in range(8)]
    return jnp.stack(ks[::-1])  # big-end first for simple ordering


@lru_cache(maxsize=4)
def build_table(m: int):
    """(sorted_keys (m+1, 8) np.uint32, values (m+1,) np.uint32, mG point).

    Built on device: k*G for k in 0..m via one fixed-base multiply, then
    one batched compress.  The sorted table is memoized on DISK next to
    the XLA compile cache: it is a pure function of m (the reference
    rebuilds it at server start, bsgs32.rs:36-38 — ~57 s of device work
    per process on a small CPU host, so caching it is the same trade as
    caching compiled executables).
    """
    mG = SR.BASEPOINT.scalar_mul(m)
    cache_path = None
    try:
        from ..utils.cache import cache_dir_for
        import os

        cdir = cache_dir_for("tables")
        os.makedirs(cdir, exist_ok=True)
        cache_path = os.path.join(cdir, f"bsgs_{m}.npz")
        if os.path.exists(cache_path):
            z = np.load(cache_path)
            return z["keys"], z["values"], mG
    except Exception:
        cache_path = None

    # k·G for k in 0..m via one fixed-base multiply over a static pow2
    # batch (compile-friendly: reuses the commitment kernel's shapes).
    from ..crypto import pedersen

    ks = np.arange(m, dtype=np.int64)
    k_limbs = np.zeros((16, m), dtype=np.uint32)
    k_limbs[0] = ks & 0xFFFF
    k_limbs[1] = (ks >> 16) & 0xFFFF
    tab = pedersen.base_B().mul(jnp.asarray(k_limbs))
    last = curve.pack_points([mG])
    tab = PointArray(
        jnp.concatenate([tab.x, last.x], axis=1),
        jnp.concatenate([tab.y, last.y], axis=1),
        jnp.concatenate([tab.z, last.z], axis=1),
        jnp.concatenate([tab.t, last.t], axis=1),
    )

    keys = np.asarray(_limbs_to_keys(curve.compress(tab)))  # (8, m+1)
    values = np.arange(m + 1, dtype=np.uint32)
    order = np.lexsort(keys[::-1])  # sort by key tuple, keys[0] most-significant
    keys_sorted = keys[:, order].T.copy()  # (m+1, 8)
    values_sorted = values[order]
    if cache_path:
        try:
            np.savez(cache_path, keys=keys_sorted, values=values_sorted)
        except Exception:
            pass
    return keys_sorted, values_sorted, mG


def _lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a < b lexicographically; a, b: (8, N) uint32, index 0 most-significant."""
    lt = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    decided = jnp.zeros(a.shape[1:], dtype=jnp.bool_)
    for j in range(8):
        lt = jnp.where(~decided & (a[j] < b[j]), True, lt)
        decided = decided | (a[j] != b[j])
    return lt


def _binary_search(table_keys: jnp.ndarray, query: jnp.ndarray):
    """table_keys (M, 8) sorted; query (8, N) → (idx (N,), hit (N,))."""
    M = table_keys.shape[0]
    n_steps = int(np.ceil(np.log2(max(M, 2)))) + 1
    lo = jnp.zeros(query.shape[1:], dtype=jnp.int32)
    hi = jnp.full(query.shape[1:], M, dtype=jnp.int32)  # exclusive
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        mid_keys = jnp.take(table_keys, mid, axis=0, mode="clip").T  # (8, N)
        go_right = _lex_less(mid_keys, query)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        # fusion barrier: without it XLA:CPU fuses all log2(M) dependent
        # gather steps into one fusion whose emitter re-computes the whole
        # predecessor chain per element — exponential in steps (measured
        # 5 s for a 17-step search whose ops are each <0.1 ms)
        lo, hi = jax.lax.optimization_barrier((lo, hi))
    idx = jnp.clip(lo, 0, M - 1)
    found_keys = jnp.take(table_keys, idx, axis=0).T
    hit = jnp.all(found_keys == query, axis=0)
    return idx, hit


def solve_with_table(
    table_keys: jnp.ndarray,
    table_vals: jnp.ndarray,
    neg_mG: PointArray,
    points: PointArray,
    m: int,
    max_it: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The BSGS walk with the table as an OPERAND (not a baked constant).

    Keeping the (m+1, 8) table out of the traced graph matters twice: the
    jit cache hits across calls (a baked 2 MB constant re-traces and
    re-hashes every time — measured 215 s/call on the virtual-CPU mesh),
    and shard_map callers can mark it replicated explicitly."""

    def walk(start: PointArray):
        n = start.batch_shape
        found = jnp.zeros(n, dtype=jnp.bool_)
        value = jnp.zeros(n, dtype=jnp.uint32)
        cur = start
        for i in range(max_it):
            enc = curve.compress(cur)
            idx, hit = _binary_search(table_keys, _limbs_to_keys(enc))
            vals = jnp.take(table_vals, idx)
            new = hit & ~found
            value = jnp.where(new, jnp.uint32(i * m) + vals, value)
            found = found | hit
            if i + 1 < max_it:
                cur = curve.add(cur, neg_mG)
                # same XLA:CPU anti-fusion guard as _binary_search
                value, found, cx, cy, cz, ct = jax.lax.optimization_barrier(
                    (value, found, cur.x, cur.y, cur.z, cur.t))
                cur = PointArray(cx, cy, cz, ct)
        return value, found

    pos_val, pos_found = walk(points)
    neg_val, neg_found = walk(curve.neg(points))

    # scalar = pos_val if pos_found else -neg_val (mod l)
    from . import sc

    pos_limbs = jnp.zeros((16,) + tuple(points.batch_shape), dtype=jnp.uint32)
    pos_limbs = pos_limbs.at[0].set(pos_val & 0xFFFF).at[1].set(pos_val >> 16)
    neg_limbs = jnp.zeros_like(pos_limbs)
    neg_limbs = neg_limbs.at[0].set(neg_val & 0xFFFF).at[1].set(neg_val >> 16)
    neg_scalar = sc.neg(neg_limbs)
    use_pos = pos_found
    out = jnp.where(use_pos[None], pos_limbs, neg_scalar)
    ok = pos_found | neg_found
    return out, ok


@lru_cache(maxsize=8)
def _solve_jit(m: int, max_it: int):
    from functools import partial as _partial

    def run(table_keys, table_vals, neg_coords, pt_coords):
        return solve_with_table(
            table_keys, table_vals, PointArray(*neg_coords),
            PointArray(*pt_coords), m, max_it)

    return jax.jit(run)


def neg_mG_coords(m: int):
    """-mG as a (16, 1)-coord tuple (host spec math; tiny)."""
    mG = SR.BASEPOINT.scalar_mul(m)
    p = curve.pack_points([-mG])
    return (p.x, p.y, p.z, p.t)


def solve_discrete_log(
    points: PointArray,
    m: int,
    n_bits: int,
    max_it: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched solve_discrete_log_with_neg (bsgs32.rs:48-73).

    Returns (values (16, N) scalar limbs mod l, ok (N,) bool). Values are
    i*m + pow for the positive walk, l - (i*m + pow) for the negative
    fallback, exactly like the reference's Scalar conversion.
    """
    keys_np, vals_np, _mG_spec = build_table(m)
    if max_it is None:
        max_it = max(1, (1 << n_bits) // m)
    return _solve_jit(m, max_it)(
        jnp.asarray(keys_np), jnp.asarray(vals_np),
        neg_mG_coords(m), tuple(points))
