"""L∞ range-proof vector pipeline — semantics of range_proof_vec/mod.rs.

Pipeline (create, mod.rs:16-102): clip-check → shift each value by
+2^(range-1) (making the symmetric range non-negative) → pad to pow2 with
zeros → split into n_partition chunks → one aggregated Bulletproof per chunk
(fresh Transcript::new(b"RangeProof") each, mod.rs:124) → un-shift the
returned commitments by commit(-offset, 0).

Verify (mod.rs:149-216): re-shift commitments by +offset, pad with
commit(0,0) (= identity), chunk, verify each aggregated proof.
"""

from __future__ import annotations

import numpy as np

from ..ops import curve
from ..spec import generators as G
from ..spec import scalar as SS
from ..spec.merlin import Transcript
from ..spec.ristretto import RistrettoPoint
from . import range_proof as RP
from .fp_codec import FpConfig


def next_pow2(val: int) -> int:
    if val <= 1:
        return 1
    return 1 << (val - 1).bit_length()


def clip_f32_to_range_vec(values, fp: FpConfig, prove_range: int) -> np.ndarray:
    lo, hi = fp.clip_bounds(prove_range)
    return np.clip(np.asarray(values, np.float32), lo, hi)


def is_out_of_range(values, fp: FpConfig, prove_range: int) -> bool:
    lo, hi = fp.clip_bounds(prove_range)
    v = np.asarray(values, np.float32)
    return bool(np.any((v < lo) | (v > hi)))


def shifted_fixed_values(values, fp: FpConfig, prove_range: int) -> list[int]:
    """f32 → shifted fixed-point integers: low n_bits of
    (f32_to_scalar(x) + 2^(range-1)) (mod.rs:36-43: scalar add then
    read_from_bytes truncation to URawFix)."""
    offset = 1 << (prove_range - 1)
    out = []
    for s in fp.f32_to_scalars(values):
        shifted = (s + offset) % SS.L
        out.append(int.from_bytes(SS.to_bytes(shifted)[: (fp.n_bits + 7) // 8],
                                  "little") & fp.max_bits)
    return out


def create_rangeproof(
    values_clipped,
    blindings: list[int],
    fp: FpConfig,
    prove_range: int,
    n_partition: int,
    rng: np.random.Generator,
) -> tuple[list[RP.RangeProof], list[RistrettoPoint]]:
    """create_rangeproof (mod.rs:16-102) → (proofs, unshifted commitments)."""
    values_clipped = np.asarray(values_clipped, np.float32)
    if len(values_clipped) != len(blindings):
        raise ValueError("wrong number of blinding factors")
    if is_out_of_range(values_clipped, fp, prove_range):
        raise ValueError("value out of range")

    shifted = shifted_fixed_values(values_clipped, fp, prove_range)
    ext_len = next_pow2(len(shifted))
    shifted_ext = shifted + [0] * (ext_len - len(shifted))
    blind_ext = list(blindings) + [0] * (ext_len - len(blindings))

    n_chunks = min(ext_len, n_partition)
    chunk = ext_len // n_chunks

    proofs: list[RP.RangeProof] = []
    commits_shifted: list[bytes] = []
    if n_chunks > 1 and n_chunks & (n_chunks - 1) == 0:
        # chunk-batched prover: all chunks' rounds run as one device flow
        transcripts = [Transcript(b"RangeProof") for _ in range(n_chunks)]
        values_chunks = [shifted_ext[c * chunk:(c + 1) * chunk]
                         for c in range(n_chunks)]
        blinds_chunks = [blind_ext[c * chunk:(c + 1) * chunk]
                         for c in range(n_chunks)]
        proofs, v_chunks = RP.prove_multiple_batch(
            transcripts, values_chunks, blinds_chunks, prove_range, rng)
        for vbs in v_chunks:
            commits_shifted.extend(vbs)
    else:
        for c in range(n_chunks):
            t = Transcript(b"RangeProof")
            proof, v_bytes = RP.prove_multiple(
                t,
                shifted_ext[c * chunk:(c + 1) * chunk],
                blind_ext[c * chunk:(c + 1) * chunk],
                prove_range,
                rng,
            )
            proofs.append(proof)
            commits_shifted.extend(v_bytes)

    # downshift: commit(-offset, 0) added to each (only the original length)
    offset = 1 << (prove_range - 1)
    inv_offset = G.pedersen_B().scalar_mul(SS.L - offset)
    out_points = []
    from ..spec import ristretto as SR

    for vb in commits_shifted[: len(values_clipped)]:
        pt = SR.decompress(vb)
        if pt is None:
            raise ValueError("bad commitment")
        out_points.append(pt + inv_offset)
    return proofs, out_points


def verify_rangeproof(
    proofs: list[RP.RangeProof],
    commits: list[RistrettoPoint],
    fp: FpConfig,
    prove_range: int,
    rng: np.random.Generator,
    mesh=None,
) -> bool:
    """verify_rangeproof (mod.rs:149-216)."""
    offset = 1 << (prove_range - 1)
    offset_pt = G.pedersen_B().scalar_mul(offset)
    shifted = [c + offset_pt for c in commits]
    ext_len = next_pow2(len(shifted))
    from ..spec import ristretto as SR

    shifted += [SR.identity()] * (ext_len - len(shifted))
    chunk = ext_len // len(proofs)
    items = []
    for c, proof in enumerate(proofs):
        t = Transcript(b"RangeProof")
        v_bytes = [p.compress() for p in shifted[c * chunk:(c + 1) * chunk]]
        items.append((t, proof, v_bytes))
    # all chunks verify as ONE random-linear-combination mega-MSM (the
    # reference loops verify_multiple per chunk); with a mesh the MSM
    # shards its terms over the 'param' axis
    return RP.verify_multiple_batch(items, prove_range, rng, mesh=mesh)
