"""Device-mesh parallelism for the secure-aggregation data plane.

Axes (SURVEY.md §2.5 — the reference's parallelism is rayon/tokio on CPUs;
here it becomes SPMD over a jax Mesh):

  'client' — data-parallel across FL clients (each device slice holds some
             clients' training + proving work; server-side aggregation
             reduces over this axis with collectives)
  'param'  — the parameter-vector dimension d: commitments/proof vectors
             shard over lanes of this axis (the reference chunks with rayon
             + n_partition; BASELINE.json north star shards points/scalars
             per chip with psum'd bucket reductions)

The crypto kernels are pure jnp on (16, N) arrays, so sharding N over
'param' partitions them automatically under jit; cross-client point sums
use all_gather over 'client' (point addition is a group op, not jnp.sum,
so reductions gather + tree-add locally).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


def make_mesh(n_client: int, n_param: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_client * n_param, "not enough devices"
    grid = devices[: n_client * n_param].reshape(n_client, n_param)
    return Mesh(grid, ("client", "param"))


def shard_vector(mesh: Mesh, limbs: jnp.ndarray) -> jnp.ndarray:
    """Shard a (16, N) limb vector over the 'param' axis (replicated over
    'client')."""
    return jax.device_put(
        limbs, NamedSharding(mesh, PSpec(None, "param"))
    )


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, PSpec()))
