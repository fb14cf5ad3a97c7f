"""Intrinsic-dimension training: optimize in a random low-dim subspace.

The reference's model files are "intrinsic" variants (models/*.txt: mnist 5k,
cifar_lenet5 12k, resnet18 25k..55k) following Li et al. '18 as used by
pps-lab/fl-analysis: full parameters θ = θ0 + P·z with a FIXED random
projection P (D×d) and the FL update is the d-dim vector z.

TPU-native design: P is never materialized in HBM as a whole — it is a
deterministic seeded random operator applied block-wise (fold_in per block),
so projecting costs one pass of small matmuls (MXU) and memory stays O(D).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 1 << 16


@partial(jax.jit, static_argnums=(1, 2))
def project(z: jnp.ndarray, D: int, seed: int) -> jnp.ndarray:
    """θ-offset = P·z for the seeded random projection P (D×d), blockwise.

    P rows are N(0, 1/sqrt(d)) from fold_in(seed, block) — regenerated on
    the fly each call (recompute beats storing a D×d matrix).
    """
    d = z.shape[0]
    n_blocks = (D + BLOCK - 1) // BLOCK
    scale = 1.0 / jnp.sqrt(jnp.float32(d))

    def block_fn(b, out):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), b)
        P_blk = jax.random.normal(key, (BLOCK, d), jnp.float32) * scale
        vals = P_blk @ z
        return jax.lax.dynamic_update_slice(out, vals, (b * BLOCK,))

    out = jnp.zeros(n_blocks * BLOCK, jnp.float32)
    out = jax.lax.fori_loop(0, n_blocks, block_fn, out)
    return out[:D]


@partial(jax.jit, static_argnums=(1, 2))
def project_transpose(g: jnp.ndarray, d: int, seed: int) -> jnp.ndarray:
    """Pᵀ·g — the backward pass of `project` (chain rule for z)."""
    D = g.shape[0]
    n_blocks = (D + BLOCK - 1) // BLOCK
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    g_pad = jnp.pad(g, (0, n_blocks * BLOCK - D))

    def block_fn(b, acc):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), b)
        P_blk = jax.random.normal(key, (BLOCK, d), jnp.float32) * scale
        seg = jax.lax.dynamic_slice(g_pad, (b * BLOCK,), (BLOCK,))
        return acc + P_blk.T @ seg

    return jax.lax.fori_loop(0, n_blocks, block_fn, jnp.zeros(d, jnp.float32))


class IntrinsicWrapper:
    """Wraps a flatten/unflatten-able model: exposes the d-dim z-space as
    the FL parameter vector while the device computes in full θ-space."""

    def __init__(self, theta0_flat: jnp.ndarray, intrinsic_dim: int, seed: int = 0):
        self.theta0 = jnp.asarray(theta0_flat)
        self.D = int(self.theta0.shape[0])
        self.d = intrinsic_dim
        self.seed = seed

    def theta(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.theta0 + project(z, self.D, self.seed)

    def grad_z(self, grad_theta: jnp.ndarray) -> jnp.ndarray:
        return project_transpose(grad_theta, self.d, self.seed)
