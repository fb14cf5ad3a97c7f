"""Fixed-base scalar multiplication via windowed lookup tables.

TPU-native replacement for dalek's per-call double-and-add in Pedersen /
ElGamal commitments (pedersen_ops.rs:9-25, el_gamal.rs:57-69): for a base P
precompute T[w][d] = d * 2^(8w) * P for 32 windows x 256 digits; a batch of
scalar muls is then 32 gathers + 31 batched point adds with NO doublings —
pure VPU work with perfect lane utilization, no data-dependent control flow.

Table build cost is 16 batched adds (doubling construction) done once per
base on device; tables live in HBM (32*256 points = 2 MB/base).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, fe
from .curve import PointArray

N_WINDOWS = 32
WINDOW_BITS = 8


def build_table(base: PointArray) -> PointArray:
    """Table (16, 32, 256) per coord: T[w, d] = d * 2^(8w) * base.

    Doubling construction: the digit axis grows by powers of two
    ([0..m) ∪ ([0..m) + m·2^(8w)·P)), the window axis by 8 doublings.
    """
    # First build per-window base points 2^(8w) * base: 31*8 doublings.
    window_bases = [base]
    cur = base
    for _ in range(N_WINDOWS - 1):
        for _ in range(WINDOW_BITS):
            cur = curve.double(cur)
        window_bases.append(cur)
    wb = PointArray(
        jnp.concatenate([p.x for p in window_bases], axis=1),
        jnp.concatenate([p.y for p in window_bases], axis=1),
        jnp.concatenate([p.z for p in window_bases], axis=1),
        jnp.concatenate([p.t for p in window_bases], axis=1),
    )  # (16, 32)

    # digits table, built at FULL static shape (16, 32, 256) so the whole
    # construction compiles once: 8 masked doubling steps
    # T[d] = T[d - 2^k] + 2^k·window_base for d in [2^k, 2^(k+1)).
    tab0 = curve.identity((N_WINDOWS, 256))
    tab0 = PointArray(*[jnp.broadcast_to(c, (16, N_WINDOWS, 256)) for c in tab0])
    step0 = PointArray(
        wb.x[:, :, None], wb.y[:, :, None], wb.z[:, :, None], wb.t[:, :, None]
    )  # m · window_base, starts at m=1
    step0 = PointArray(*[jnp.broadcast_to(c, (16, N_WINDOWS, 1)) for c in step0])
    digit_idx = jnp.arange(256)[None, :]

    def body(k, state):
        tab, step = state
        m = jnp.int32(1) << k
        rolled = PointArray(
            jnp.roll(tab.x, m, axis=2), jnp.roll(tab.y, m, axis=2),
            jnp.roll(tab.z, m, axis=2), jnp.roll(tab.t, m, axis=2),
        )
        shifted = curve.add(rolled, step)
        in_range = (digit_idx >= m) & (digit_idx < 2 * m)
        tab = curve.select(
            jnp.broadcast_to(in_range, (N_WINDOWS, 256)), shifted, tab
        )
        return tab, curve.add(step, step)

    tab, _ = jax.lax.fori_loop(0, 8, body, (tab0, step0))
    return tab  # coords shaped (16, 32, 256)


def _digits(scalars: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [scalars[k >> 1] >> 8 if k & 1 else scalars[k >> 1] & 0xFF
         for k in range(N_WINDOWS)]
    ).astype(jnp.int32)  # (32, N)


@jax.jit
def _mul_gather(table: PointArray, scalars: jnp.ndarray) -> PointArray:
    """Gather formulation (CPU: XLA:CPU lowers minor-dim gathers well)."""
    digits = _digits(scalars)

    def body(w, acc):
        d = digits[w]
        tx = jax.lax.dynamic_index_in_dim(table.x, w, axis=1, keepdims=False)
        ty = jax.lax.dynamic_index_in_dim(table.y, w, axis=1, keepdims=False)
        tz = jax.lax.dynamic_index_in_dim(table.z, w, axis=1, keepdims=False)
        tt = jax.lax.dynamic_index_in_dim(table.t, w, axis=1, keepdims=False)
        entry = PointArray(
            jnp.take(tx, d, axis=1), jnp.take(ty, d, axis=1),
            jnp.take(tz, d, axis=1), jnp.take(tt, d, axis=1),
        )
        return curve.add(acc, entry)

    n = scalars.shape[1]
    acc0 = curve.identity((n,))
    acc0 = PointArray(*[jnp.broadcast_to(c, (16, n)) for c in acc0])
    return jax.lax.fori_loop(0, N_WINDOWS, body, acc0)


@jax.jit
def _mul_mxu(table: PointArray, scalars: jnp.ndarray) -> PointArray:
    """MXU formulation: TPUs have no per-lane gather, so each window's
    digit lookup is a one-hot fp32 matmul (N, 256) @ (256, 64) over the
    window's table slice (16 limbs × 4 coords). Exact: table limbs
    < 2^16 fit the fp32 mantissa and a one-hot row sums one product.
    The 31 batched accumulate adds ride the usual Pallas point-add."""
    digits = _digits(scalars)
    n = scalars.shape[1]
    # (32, 256, 64) fp32: window-major digit tables, limbs×coords packed
    tab_f = jnp.stack([table.x, table.y, table.z, table.t], axis=-1)
    tab_f = tab_f.transpose(1, 2, 0, 3).reshape(
        N_WINDOWS, 256, 64).astype(jnp.float32)

    def body(w, acc):
        oh = jax.nn.one_hot(digits[w], 256, dtype=jnp.float32)   # (N, 256)
        tw = jax.lax.dynamic_index_in_dim(tab_f, w, axis=0, keepdims=False)
        ent = jax.lax.dot(oh, tw,
                          precision=jax.lax.Precision.HIGHEST)   # (N, 64)
        ent = ent.astype(jnp.uint32).reshape(n, 16, 4)
        entry = PointArray(*(ent[:, :, c].T for c in range(4)))
        return curve.add(acc, entry)

    acc0 = curve.identity((n,))
    acc0 = PointArray(*[jnp.broadcast_to(c, (16, n)) for c in acc0])
    return jax.lax.fori_loop(0, N_WINDOWS, body, acc0)


def mul(table: PointArray, scalars: jnp.ndarray) -> PointArray:
    """Batched fixed-base scalar mul: scalars (16, N) canonical → points.

    One fori_loop over 32 windows (single compiled body): look up the
    window's digit entry per element (MXU one-hot matmul on TPU, gather
    on CPU), accumulate with one batched add."""
    from .dispatch import use_pallas

    return (_mul_mxu if use_pallas() else _mul_gather)(table, scalars)


class FixedBase:
    """A base point with its device table, built lazily and cached."""

    def __init__(self, spec_point):
        self.spec_point = spec_point
        self._table = None

    @property
    def table(self) -> PointArray:
        if self._table is None:
            self._table = jax.tree.map(
                lambda x: jax.device_put(x), build_table(curve.pack_points([self.spec_point]))
            )
        return self._table

    def mul(self, scalars: jnp.ndarray) -> PointArray:
        return mul(self.table, scalars)
