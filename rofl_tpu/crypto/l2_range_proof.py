"""L2-norm range proof — semantics of l2_range_proof_vec/mod.rs.

One single-value Bulletproof over the summed square Σ mᵢ² with summed
blinding: compute the sum in scalar space (mod.rs:37-42), cross-check
against the float sum ×2^frac to catch fixed-point overflow (44-58), check
the L2 clip bound (60-64), then prove ONE range proof (transcript
"L2RangeProof", gens BulletproofGens(64, 1) — a chain prefix, identical to
gens(prove_range, 1)) over the low n_bits of the sum.
"""

from __future__ import annotations

import numpy as np

from ..spec import scalar as SS
from ..spec.merlin import Transcript
from ..spec.ristretto import RistrettoPoint
from . import range_proof as RP
from .fp_codec import FpConfig


class L2NormError(ValueError):
    pass


class L2OverflowError(ValueError):
    pass


def squared_sum_scalar(values_clipped, fp: FpConfig) -> int:
    """Σ f32_to_scalar(x)² in the scalar field.

    Vectorized: (l − mag)² ≡ mag² (mod l), so the signed encoding drops out
    and the sum is Σ mag² over the uint64 magnitudes (exact in uint64 for
    n_bits ≤ 16 and any realistic d; bigint fallback for wider configs)."""
    bits = fp.f32_to_bits(np.asarray(values_clipped, np.float32))
    if 2 * fp.n_bits + max(1, int(bits.size).bit_length()) <= 64:
        return int(np.sum(bits * bits, dtype=np.uint64)) % SS.L
    obj = bits.astype(object)
    return int(np.sum(obj * obj)) % SS.L


def check_l2(values_clipped, fp: FpConfig, prove_range: int) -> int:
    """Overflow + bound checks (mod.rs:44-64); returns the sum scalar."""
    values_clipped = np.asarray(values_clipped, np.float32)
    val = squared_sum_scalar(values_clipped, fp)
    shift = np.float32(1 << fp.n_frac)
    # float cross-check: decode(encode(x))² × 2^frac summed SEQUENTIALLY in
    # f32 (the reference's fold order, mod.rs:44-58 — pairwise np.sum would
    # round differently at the overflow boundary)
    bits = fp.f32_to_bits(values_clipped)
    neg = (values_clipped < 0) & (bits != 0)
    dec = np.where(neg, -(bits.astype(np.float64)), bits.astype(np.float64))
    dec = (dec / fp.scale).astype(np.float32)
    terms = (dec * dec * shift).astype(np.float32)
    val_float = np.float32(0)
    for x in terms:
        val_float = np.float32(val_float + x)
    got = np.float32(fp.scalar_to_f32(val))
    if abs(float(got) - float(val_float)) > np.finfo(np.float32).eps:
        raise L2OverflowError(f"fixed-point overflow: {got} != {val_float}")
    if float(got) > fp.l2_clip_bound(prove_range):
        raise L2NormError(f"L2 norm out of range: {got}")
    return val


def create_rangeproof_l2(
    values_clipped,
    blindings,
    fp: FpConfig,
    prove_range: int,
    rng: np.random.Generator,
) -> tuple[RP.RangeProof, RistrettoPoint]:
    """create_rangeproof_l2 (mod.rs:15-140) → (proof, sum-square commit).

    blindings: (16, d) uint32 scalar limbs or list[int]; the blinding sum
    is reduced on device for the limb form (one sum, no host bigints)."""
    values_clipped = np.asarray(values_clipped, np.float32)
    if isinstance(blindings, (list, tuple)):
        if len(values_clipped) != len(blindings):
            raise ValueError("wrong number of blinding factors")
        blinding_sum = sum(int(b) for b in blindings) % SS.L
    else:
        import jax.numpy as jnp

        from ..ops import sc

        limbs = np.asarray(blindings)
        if limbs.shape[1] != len(values_clipped):
            raise ValueError("wrong number of blinding factors")
        # sum_reduce (not sum_reduce_groups with group=d): the grouped
        # Pallas kernel requires pow2 groups, but model dimension d is
        # arbitrary; sc_sum zero-pads any lane count.
        total = sc.sum_reduce(jnp.asarray(limbs))
        blinding_sum = sc.unpack_scalars(np.asarray(total))[0]
    if RP and _is_out_of_range(values_clipped, fp, prove_range):
        raise ValueError("value out of range")
    val = check_l2(values_clipped, fp, prove_range)
    # low n_bits of the scalar (read_from_bytes semantics, mod.rs:71-75)
    value_u64 = int.from_bytes(
        SS.to_bytes(val)[: (fp.n_bits + 7) // 8], "little"
    ) & fp.max_bits

    t = Transcript(b"L2RangeProof")
    proof, v_bytes, _V = RP.prove_multiple(
        t, [value_u64], [blinding_sum], prove_range, rng)
    from ..spec import ristretto as SR

    commit = SR.decompress(v_bytes[0])
    if commit is None:
        raise ValueError("bad commitment")
    return proof, commit


def verify_rangeproof_l2(
    proof: RP.RangeProof,
    commit: RistrettoPoint,
    prove_range: int,
    rng: np.random.Generator,
) -> bool:
    """verify_rangeproof_l2 (mod.rs:185-253): single-commitment verify."""
    t = Transcript(b"L2RangeProof")
    return RP.verify_multiple(t, proof, [commit.compress()], prove_range, rng)


def _is_out_of_range(values, fp: FpConfig, prove_range: int) -> bool:
    lo, hi = fp.clip_bounds(prove_range)
    v = np.asarray(values, np.float32)
    return bool(np.any((v < lo) | (v > hi)))
