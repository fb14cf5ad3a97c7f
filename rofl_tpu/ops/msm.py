"""Multi-scalar multiplication. Interface point for MSM strategies.

Current implementation: batched per-element double-and-add (curve.scalar_mul,
shared 256-iteration loop over the whole batch) + log-depth tree reduction.
Correct and fully batched; the Pippenger bucket/segmented-scan kernel will
slot in behind the same signature (SURVEY.md §7 step 3, BASELINE.json
north star: bucket sums reduced via psum across chips).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import curve
from .curve import PointArray


def msm(points: PointArray, scalars: jnp.ndarray) -> PointArray:
    """Σ scalars_i · points_i over the last batch axis → single point (16, 1)."""
    prods = curve.scalar_mul(points, scalars)
    return curve.tree_sum(prods)


def msm_with_extra(points: PointArray, scalars: jnp.ndarray,
                   extra: PointArray) -> PointArray:
    """MSM plus one extra precomputed term (e.g. c_L·Q in IPA rounds)."""
    return curve.add(msm(points, scalars), extra)
