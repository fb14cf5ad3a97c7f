"""Device-mesh parallelism for the secure-aggregation data plane.

Axes (SURVEY.md §2.5 — the reference's parallelism is rayon/tokio on CPUs;
here it becomes SPMD over a jax Mesh):

  'client' — data-parallel across FL clients (commitment/proof batches per
             client; server-side aggregation reduces over this axis)
  'param'  — the parameter-vector dimension d: commitments, Σ-protocol
             lanes, MSM terms and BSGS walks shard over lanes of this axis
             (the reference chunks with rayon + n_partition,
             range_proof_vec/mod.rs:53-78; BASELINE.json's north star
             shards points/scalars per chip)

The crypto kernels are elementwise over (16, N) lanes, so sharding N over
'param' partitions them automatically; the only cross-device steps are the
REDUCTIONS (MSM partial sums, ElGamal accumulation). Point addition is a
group op, not jnp.sum, so reductions all_gather the per-device partial
POINTS (4×16 limbs each — bytes, not the sharded vectors) and tree-add
them locally; everything stays inside one jit so XLA schedules the
collectives on ICI.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

try:
    from jax import shard_map as _shard_map  # jax >= 0.8 (check_vma kwarg)

    def shard_map(f=None, **kw):
        kw["check_vma"] = kw.pop("check_rep", True)
        return _shard_map(f, **kw) if f is not None else _shard_map(**kw)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import curve, msm as msm_mod, sc
from ..ops.curve import PointArray


def make_mesh(n_client: int, n_param: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_client * n_param, "not enough devices"
    grid = devices[: n_client * n_param].reshape(n_client, n_param)
    return Mesh(grid, ("client", "param"))


def param_mesh(n_param: int | None = None, devices=None) -> Mesh:
    """1×N mesh with only the 'param' axis (pure d-sharding)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_param = n_param or devices.size
    return Mesh(devices[:n_param].reshape(1, n_param), ("client", "param"))


def shard_vector(mesh: Mesh, limbs: jnp.ndarray) -> jnp.ndarray:
    """Shard a (16, N) limb vector over the 'param' axis (replicated over
    'client')."""
    return jax.device_put(
        limbs, NamedSharding(mesh, PSpec(None, "param"))
    )


def shard_points(mesh: Mesh, p: PointArray) -> PointArray:
    sh = NamedSharding(mesh, PSpec(None, "param"))
    return PointArray(*[jax.device_put(c, sh) for c in p])


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, PSpec()))


# -- sharded reductions -------------------------------------------------------


def _gather_tree_add(p: PointArray, axis_name: str) -> PointArray:
    """All-gather per-device partial points and tree-add locally — the
    group-op analogue of psum (point addition can't ride a psum)."""
    gathered = PointArray(*[
        jax.lax.all_gather(c, axis_name, axis=1, tiled=True) for c in p
    ])
    return curve.tree_sum(gathered, axis=0)


def sharded_msm(mesh: Mesh, points: PointArray, scalars: jnp.ndarray
                ) -> PointArray:
    """Σ k_i·P_i with the i axis sharded over 'param': local MSM per
    device, all_gather of the single-point partials, local tree-add.
    Result is replicated (16, 1) coords. Lanes are padded to a multiple of
    the 'param' axis with identity points / zero scalars (inert terms)."""
    n = points.x.shape[-1]
    n_param = mesh.shape["param"]
    if n % n_param:
        m = -(-n // n_param) * n_param
        zero = jnp.zeros((16, m - n), jnp.uint32)
        one = zero.at[0].set(1)
        points = PointArray(
            jnp.concatenate([points.x, zero], axis=1),
            jnp.concatenate([points.y, one], axis=1),
            jnp.concatenate([points.z, one], axis=1),
            jnp.concatenate([points.t, zero], axis=1),
        )
        scalars = jnp.pad(scalars, ((0, 0), (0, m - n)))

    return PointArray(*_sharded_msm_fn(mesh)(tuple(points), scalars))


@lru_cache(maxsize=16)
def _sharded_msm_fn(mesh: Mesh):
    # jit around shard_map is REQUIRED: un-jitted shard_map evaluates
    # eagerly, one tiny per-device executable per primitive (measured
    # ~5000 compiles / >100 s per call on the virtual mesh)
    @partial(
        shard_map, mesh=mesh,
        in_specs=(
            (PSpec(None, "param"),) * 4,
            PSpec(None, "param"),
        ),
        out_specs=(PSpec(None, None),) * 4,
        check_rep=False,
    )
    def _run(pts, scal):
        part = msm_mod.msm(PointArray(*pts), scal)
        return tuple(_gather_tree_add(part, "param"))

    return jax.jit(_run)


def sharded_msm_grouped(mesh: Mesh, points: PointArray,
                        scalars: jnp.ndarray, group: int) -> PointArray:
    """Per-group MSMs with the GROUP axis sharded over 'param':
    (16, G·group) → (16, G).  This is the PROVE-path primitive (VERDICT r3
    item 6): the chunk-batched Bulletproofs prover's A/S and IPA L/R MSMs
    are per-chunk reductions, so distributing whole chunks across devices
    needs no collective at all — the reference's rayon-chunk parallelism
    (range_proof_vec/mod.rs:53-78) mapped onto the mesh.  Falls back to
    the local kernel when G doesn't divide over the axis."""
    L = scalars.shape[-1]
    G = L // group
    n_param = mesh.shape["param"]
    if G % n_param or G == 0:
        return msm_mod.msm_grouped(points, scalars, group)

    out = PointArray(*_sharded_msm_grouped_fn(mesh, group)(
        tuple(points), scalars))
    # gather the small (16, G) result so the host transcript step that
    # follows (compress + Merlin absorb) reads one device's copy
    return PointArray(*[jax.device_put(c, NamedSharding(mesh, PSpec()))
                        for c in out])


def sharded_tree_sum_groups(mesh: Mesh, p: PointArray,
                            group: int) -> PointArray:
    """Per-group point sums with the group axis sharded over 'param'
    ((16, G·group) → (16, G)) — the prover's A-term reduction."""
    L = p.x.shape[-1]
    G = L // group
    n_param = mesh.shape["param"]
    if G % n_param or G == 0:
        return curve.tree_sum_groups(p, group)

    out = PointArray(*_sharded_tsg_fn(mesh, group)(tuple(p)))
    return PointArray(*[jax.device_put(c, NamedSharding(mesh, PSpec()))
                        for c in out])


@lru_cache(maxsize=32)
def _sharded_msm_grouped_fn(mesh: Mesh, group: int):
    @partial(
        shard_map, mesh=mesh,
        in_specs=((PSpec(None, "param"),) * 4, PSpec(None, "param")),
        out_specs=(PSpec(None, "param"),) * 4,
        check_rep=False,
    )
    def _run(pts, scal):
        return tuple(msm_mod.msm_grouped(PointArray(*pts), scal, group))

    return jax.jit(_run)


@lru_cache(maxsize=32)
def _sharded_tsg_fn(mesh: Mesh, group: int):
    @partial(
        shard_map, mesh=mesh,
        in_specs=((PSpec(None, "param"),) * 4,),
        out_specs=(PSpec(None, "param"),) * 4,
        check_rep=False,
    )
    def _run(pts):
        return tuple(curve.tree_sum_groups(PointArray(*pts), group))

    return jax.jit(_run)


def sharded_commit(mesh: Mesh, table: PointArray, scalars: jnp.ndarray
                   ) -> PointArray:
    """Fixed-base commit lanes sharded over 'param' (table replicated);
    pure elementwise — no collectives."""
    return PointArray(*_sharded_commit_fn(mesh)(tuple(table), scalars))


@lru_cache(maxsize=16)
def _sharded_commit_fn(mesh: Mesh):
    from ..ops import fixed_base

    @partial(
        shard_map, mesh=mesh,
        in_specs=((PSpec(),) * 4, PSpec(None, "param")),
        out_specs=(PSpec(None, "param"),) * 4,
        check_rep=False,
    )
    def _run(tab, scal):
        return tuple(fixed_base.mul(PointArray(*tab), scal))

    return jax.jit(_run)


def sharded_pair_add(mesh: Mesh, a, b):
    """Elementwise homomorphic accumulate of 'param'-sharded ElGamal pair
    arrays ((L, R) PointArrays) — add_rp_vec_vec under sharding."""
    L, R = _sharded_pair_add_fn(mesh)(
        tuple(a.L), tuple(a.R), tuple(b.L), tuple(b.R))
    return type(a)(PointArray(*L), PointArray(*R))


@lru_cache(maxsize=16)
def _sharded_pair_add_fn(mesh: Mesh):
    spec = (PSpec(None, "param"),) * 4

    @partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec),
        check_rep=False,
    )
    def _run(aL, aR, bL, bR):
        return (
            tuple(curve.add(PointArray(*aL), PointArray(*bL))),
            tuple(curve.add(PointArray(*aR), PointArray(*bR))),
        )

    return jax.jit(_run)


@lru_cache(maxsize=8)
def _sharded_bsgs_fn(mesh: Mesh, table_m: int, max_it: int):
    """Cached shard_map walk — the TABLE IS AN OPERAND (replicated spec),
    not a baked constant: re-creating the closure per call re-traced a
    2 MB-constant graph every time (measured 215 s/call warm on the
    virtual-CPU mesh; VERDICT r3 item 2's long pole)."""
    from ..ops import bsgs

    @partial(
        shard_map, mesh=mesh,
        in_specs=(PSpec(), PSpec(), (PSpec(),) * 4,
                  (PSpec(None, "param"),) * 4),
        out_specs=(PSpec(None, "param"), PSpec("param")),
        check_rep=False,
    )
    def _run(tk, tv, neg_coords, pts):
        return bsgs.solve_with_table(
            tk, tv, PointArray(*neg_coords), PointArray(*pts),
            table_m, max_it)

    return jax.jit(_run)


def sharded_bsgs(mesh: Mesh, points: PointArray, table_m: int, n_bits: int):
    """BSGS extraction with the point lanes sharded over 'param' — each
    device walks its own lanes against the replicated table (the walk is
    elementwise; no collectives)."""
    from ..ops import bsgs

    keys_np, vals_np, _ = bsgs.build_table(table_m)  # host side, disk-cached
    max_it = max(1, (1 << n_bits) // table_m)
    run = _sharded_bsgs_fn(mesh, table_m, max_it)
    return run(jnp.asarray(keys_np), jnp.asarray(vals_np),
               bsgs.neg_mG_coords(table_m), tuple(points))
