"""Multi-scalar multiplication — the TPU-native Pippenger.

On TPU this routes to the bit-plane Horner kernel (ops/kernels.py
msm_flat/msm_groups): Σ k_i·P_i = Σ_b 2^b·S_b where each bit-plane sum S_b
is a masked tree reduction and the 253 doublings are shared across ALL
terms. That is Pippenger with 1-bit windows — the widest window a vector
machine with no cross-lane scatter can bucket without paying one masked
reduction per digit value — at ~1.1 point-ops per term-bit vs the per-lane
ladder's 2. Replaces dalek's bucketed Pippenger, which the reference's
verify throughput comes from (range_proof_vec/mod.rs:149-216 →
RangeProof::verify_multiple → curve25519-dalek-ng multiscalar_mul).

On CPU (tests / virtual mesh) the batched ladder + log-depth tree sum is
used instead; both paths are bit-exact.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import curve
from .curve import PointArray
from .dispatch import use_pallas


def msm(points: PointArray, scalars: jnp.ndarray) -> PointArray:
    """Σ scalars_i · points_i over the last batch axis → single point (16, 1)."""
    if use_pallas():
        from . import kernels

        return PointArray(*kernels.msm_flat(tuple(points), scalars))
    prods = curve.scalar_mul(points, scalars)
    return curve.tree_sum(prods)


def msm_grouped(points: PointArray, scalars: jnp.ndarray,
                group: int) -> PointArray:
    """Per-group MSMs over contiguous groups of `group` lanes:
    (16, G·group) → (16, G). The chunk-batched prover's primitive (all
    n_partition chunks' A/S/L/R MSMs in one device call)."""
    if use_pallas() and group >= 128 and group & (group - 1) == 0:
        from . import kernels

        return PointArray(*kernels.msm_groups(tuple(points), scalars, group))
    return curve.tree_sum_groups(curve.scalar_mul(points, scalars), group)


def msm_with_extra(points: PointArray, scalars: jnp.ndarray,
                   extra: PointArray) -> PointArray:
    """MSM plus one extra precomputed term (e.g. c_L·Q in IPA rounds)."""
    return curve.add(msm(points, scalars), extra)
