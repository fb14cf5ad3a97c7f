"""Pedersen / ElGamal commitment vectors on device.

Replaces rofl_crypto pedersen_ops.rs (rayon loops → batched fixed-base
kernels) and rand_proof/el_gamal.rs (ElGamalGens/ElGamalPair):

  commit(m, r)        = (B^m · H^r, B^r)      el_gamal.rs:57-62
  complete_existing   = (C_m, B^r)            el_gamal.rs:64-69
  pedersen(m, r)      = B^m · H^r             bulletproofs PedersenGens
  add pairs           = elementwise group add  pedersen_ops.rs:61-69
  cancelling blindings: n_vec vectors of scalars whose elementwise sum ≡ 0
                        (the secure-aggregation trick, pedersen_ops.rs:110-122)

B = ristretto basepoint; H = B_blinding = sha3-512 hash-to-group of B's
encoding (el_gamal.rs:31-40). Batch layout: (16, N) limbs / PointArray.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import curve, fixed_base
from ..ops.curve import PointArray
from ..spec import generators as G
from ..spec import scalar as SS


class ElGamalPairArray(NamedTuple):
    """Batched ElGamal pairs (L, R); R carries the blinding for the
    sum-of-blindings-is-zero aggregation check (el_gamal.rs:101-103)."""

    L: PointArray
    R: PointArray


@lru_cache(maxsize=None)
def base_B() -> fixed_base.FixedBase:
    return fixed_base.FixedBase(G.pedersen_B())


@lru_cache(maxsize=None)
def base_H() -> fixed_base.FixedBase:
    return fixed_base.FixedBase(G.pedersen_B_blinding())


def pedersen_commit(values: jnp.ndarray, blindings: jnp.ndarray) -> PointArray:
    """B^m · H^r batched: 2 fixed-base muls + 1 add per element."""
    return curve.add(base_B().mul(values), base_H().mul(blindings))


def pedersen_commit_no_blinding(values: jnp.ndarray) -> PointArray:
    return base_B().mul(values)


def elgamal_commit(values: jnp.ndarray, blindings: jnp.ndarray) -> ElGamalPairArray:
    return ElGamalPairArray(
        L=pedersen_commit(values, blindings),
        R=base_B().mul(blindings),
    )


def elgamal_complete_existing(
    pedersen_points: PointArray, blindings: jnp.ndarray
) -> ElGamalPairArray:
    return ElGamalPairArray(L=pedersen_points, R=base_B().mul(blindings))


def add_pairs(a: ElGamalPairArray, b: ElGamalPairArray) -> ElGamalPairArray:
    return ElGamalPairArray(curve.add(a.L, b.L), curve.add(a.R, b.R))


def sum_pairs(pairs: ElGamalPairArray, axis: int = 0) -> ElGamalPairArray:
    return ElGamalPairArray(
        curve.tree_sum(pairs.L, axis=axis), curve.tree_sum(pairs.R, axis=axis)
    )


def right_elem_is_unity(pairs: ElGamalPairArray) -> jnp.ndarray:
    """Check R == basepoint per element — the reference's 'blindings
    cancelled' test before extraction (el_gamal.rs:101-103, params.rs:128).

    NOTE (faithful to reference): unity here is the BASEPOINT, not the
    identity; with truly cancelling blindings (sum ≡ 0) R = B^0 = identity,
    and the reference's server extract() actually checks
    `!right_elem_is_unity` … it accepts when R is not the basepoint. We
    expose both predicates; the protocol layer mirrors params.rs:126-147.
    """
    bp = curve.basepoint(pairs.R.batch_shape)
    return curve.eq(pairs.R, bp)


def right_elem_is_identity(pairs: ElGamalPairArray) -> jnp.ndarray:
    ident = curve.identity(pairs.R.batch_shape)
    return curve.eq(pairs.R, ident)


# -- blinding generation (host-side secrets) --------------------------------


def rnd_scalar_limbs(n: int, rng: np.random.Generator):
    """Uniform scalars mod l: 64 uniform bytes reduced wide, like
    Scalar::random (pedersen_ops.rs rnd_scalar_vec).

    TPU path: the 64 bytes per lane are generated ON DEVICE by a keyed
    Keccak-f[1600] XOF in counter mode (one batched permutation for all
    lanes; key = 32 bytes drawn from the caller's rng), then wide-reduced
    in the mod-l kernel. Shipping host randomness was the round-4 prove
    pole: (n, 64) bytes as uint32 columns is 128 B/scalar through the
    device tunnel — 134 MB (≈9 s) for one s_L/s_R draw at nm = 2^19.
    Deterministic per rng seed (the key is the only entropy), so
    same-seed reruns stay bit-identical. CPU path keeps the host spec
    sampler (the virtual-mesh tests never move enough bytes to care)."""
    from ..ops import sc
    from ..ops.dispatch import use_pallas

    if use_pallas():
        key = jnp.asarray(
            np.frombuffer(rng.bytes(32), np.uint8).astype(np.uint32))
        return sc.reduce_wide_bytes(_xof_byte_cols(key, n))
    raw = rng.integers(0, 256, size=(n, 64), dtype=np.uint8)
    return sc.from_bytes_wide_array(raw)


@lru_cache(maxsize=1)
def _xof_fn():
    from functools import partial

    import jax

    from ..ops.keccak_batch import keccak_f1600

    @partial(jax.jit, static_argnums=(1,))
    def f(key_bytes: jnp.ndarray, n: int) -> jnp.ndarray:
        """(32,) uint32 key byte values + static lane count → (64, n)
        uint32 byte columns: one Keccak-f[1600] of
        state = key ‖ counter ‖ domain-const per lane."""
        key_words = jnp.zeros((8,), jnp.uint32)
        for k in range(8):
            w = (key_bytes[4 * k]
                 | (key_bytes[4 * k + 1] << 8)
                 | (key_bytes[4 * k + 2] << 16)
                 | (key_bytes[4 * k + 3] << 24))
            key_words = key_words.at[k].set(w)
        state = jnp.zeros((50, n), jnp.uint32)
        for k in range(8):  # lanes 0..3 = key
            state = state.at[k].set(jnp.broadcast_to(key_words[k], (n,)))
        ctr = jnp.arange(n, dtype=jnp.uint32)
        state = state.at[8].set(ctr)                       # lane 4 lo
        state = state.at[10].set(jnp.full((n,), np.uint32(0x4C464F52)))
        state = state.at[11].set(jnp.full((n,), np.uint32(0x01)))
        out = keccak_f1600(state)
        return jnp.stack(
            [(out[k // 4] >> np.uint32(8 * (k % 4))) & np.uint32(0xFF)
             for k in range(64)])

    return f


def _xof_byte_cols(key_bytes: jnp.ndarray, n: int) -> jnp.ndarray:
    return _xof_fn()(key_bytes, n)


def cancelling_scalar_limbs(
    n_vec: int, n_dim: int, rng: np.random.Generator
) -> list[np.ndarray]:
    """n_vec scalar vectors with elementwise sum ≡ 0 (mod l)
    (pedersen_ops.rs:110-122): first n-1 random, last = -(sum)."""
    vecs = [rnd_scalar_limbs(n_dim, rng) for _ in range(n_vec - 1)]
    total = np.zeros(n_dim, dtype=object)
    for v in vecs:
        from ..ops import sc

        ints = sc.unpack_scalars(v)
        for i, x in enumerate(ints):
            total[i] = (int(total[i]) + x) % SS.L
    from ..ops import sc

    last = sc.pack_scalars([(-int(t)) % SS.L for t in total])
    return vecs + [last]
