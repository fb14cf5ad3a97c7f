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
    """Σ f32_to_scalar(x)² in the scalar field."""
    acc = 0
    for s in fp.f32_to_scalars(np.asarray(values_clipped, np.float32)):
        acc = (acc + s * s) % SS.L
    return acc


def check_l2(values_clipped, fp: FpConfig, prove_range: int) -> int:
    """Overflow + bound checks (mod.rs:44-64); returns the sum scalar."""
    values_clipped = np.asarray(values_clipped, np.float32)
    val = squared_sum_scalar(values_clipped, fp)
    shift = float(1 << fp.n_frac)
    # float cross-check: decode(encode(x))² × 2^frac summed in f32
    dec = fp.scalars_to_f32(fp.f32_to_scalars(values_clipped))
    val_float = np.float32(0)
    for x in dec:
        val_float = np.float32(val_float + np.float32(x) * np.float32(x) * np.float32(shift))
    got = np.float32(fp.scalar_to_f32(val))
    if abs(float(got) - float(val_float)) > np.finfo(np.float32).eps:
        raise L2OverflowError(f"fixed-point overflow: {got} != {val_float}")
    if float(got) > fp.l2_clip_bound(prove_range):
        raise L2NormError(f"L2 norm out of range: {got}")
    return val


def create_rangeproof_l2(
    values_clipped,
    blindings: list[int],
    fp: FpConfig,
    prove_range: int,
    rng: np.random.Generator,
) -> tuple[RP.RangeProof, RistrettoPoint]:
    """create_rangeproof_l2 (mod.rs:15-140) → (proof, sum-square commit)."""
    values_clipped = np.asarray(values_clipped, np.float32)
    if len(values_clipped) != len(blindings):
        raise ValueError("wrong number of blinding factors")
    if RP and _is_out_of_range(values_clipped, fp, prove_range):
        raise ValueError("value out of range")
    val = check_l2(values_clipped, fp, prove_range)
    # low n_bits of the scalar (read_from_bytes semantics, mod.rs:71-75)
    value_u64 = int.from_bytes(
        SS.to_bytes(val)[: (fp.n_bits + 7) // 8], "little"
    ) & fp.max_bits
    blinding_sum = sum(blindings) % SS.L

    t = Transcript(b"L2RangeProof")
    proof, v_bytes = RP.prove_multiple(t, [value_u64], [blinding_sum], prove_range, rng)
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
