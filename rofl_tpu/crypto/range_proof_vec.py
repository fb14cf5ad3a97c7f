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


def shifted_fixed_values(values, fp: FpConfig, prove_range: int) -> np.ndarray:
    """f32 → shifted fixed-point integers: low n_bits of
    (f32_to_scalar(x) + 2^(range-1)) (mod.rs:36-43: scalar add then
    read_from_bytes truncation to URawFix). Vectorized: the low 64 bits of
    (l - mag + offset) equal (l mod 2^64) - mag + offset under uint64
    wrap-around, so no per-element bigints are needed (n_bits <= 64)."""
    v = np.asarray(values, np.float32)
    bits = fp.f32_to_bits(v)                       # (d,) uint64 magnitudes
    offset = np.uint64(1 << (prove_range - 1))
    neg = (v < 0) & (bits != 0)
    l_lo64 = np.uint64(SS.L & 0xFFFFFFFFFFFFFFFF)
    pos = bits + offset
    with np.errstate(over="ignore"):
        # (l - bits + offset) mod l: when bits <= offset the sum wraps past
        # l and reduces to offset - bits; otherwise take the low 64 bits of
        # l - bits + offset (exact under uint64 wrap-around)
        negv = np.where(bits <= offset, offset - bits,
                        l_lo64 - bits + offset)
    return np.where(neg, negv, pos) & np.uint64(fp.max_bits)


def _broadcast_point(p: RistrettoPoint, n: int) -> curve.PointArray:
    """One spec point → device PointArray broadcast to n lanes."""
    pa = curve.pack_points([p])
    import jax.numpy as jnp

    return curve.PointArray(*[jnp.broadcast_to(c, (16, n)) for c in pa])


def create_rangeproof(
    values_clipped,
    blindings,
    fp: FpConfig,
    prove_range: int,
    n_partition: int,
    rng: np.random.Generator,
    mesh=None,
) -> tuple[list[RP.RangeProof], curve.PointArray]:
    """create_rangeproof (mod.rs:16-102) → (proofs, unshifted commitments).

    blindings: (16, d) uint32 scalar limbs (device layout) or list[int].
    Commitments are returned as a device PointArray; the −offset un-shift
    (mod.rs:95-101) is one batched device add, not a host point loop.
    With a mesh, the chunk-batched prover's A/S and IPA L/R MSMs shard
    whole chunks over the 'param' axis (proofs are byte-identical).
    """
    import jax.numpy as jnp

    from ..ops import sc

    values_clipped = np.asarray(values_clipped, np.float32)
    d = len(values_clipped)
    if isinstance(blindings, (list, tuple)):
        blind_limbs = sc.pack_scalars(blindings)
    else:
        blind_limbs = np.asarray(blindings)
    if blind_limbs.shape[1] != d:
        raise ValueError("wrong number of blinding factors")
    if is_out_of_range(values_clipped, fp, prove_range):
        raise ValueError("value out of range")

    shifted = shifted_fixed_values(values_clipped, fp, prove_range)
    ext_len = next_pow2(d)
    shifted_ext = np.zeros(ext_len, np.uint64)
    shifted_ext[:d] = shifted
    blind_ext = np.zeros((16, ext_len), np.uint32)
    blind_ext[:, :d] = blind_limbs

    n_chunks = min(ext_len, n_partition)
    chunk = ext_len // n_chunks

    proofs: list[RP.RangeProof] = []
    if n_chunks > 1 and n_chunks & (n_chunks - 1) == 0:
        # chunk-batched prover: all chunks' rounds run as one device flow
        transcripts = [Transcript(b"RangeProof") for _ in range(n_chunks)]
        proofs, _v_chunks, V = RP.prove_multiple_batch(
            transcripts, shifted_ext.reshape(n_chunks, chunk), blind_ext,
            prove_range, rng, mesh=mesh)
    else:
        V = None
        blind_ints = sc.unpack_scalars(blind_ext)
        for c in range(n_chunks):
            t = Transcript(b"RangeProof")
            proof, _v_bytes, V_c = RP.prove_multiple(
                t,
                [int(x) for x in shifted_ext[c * chunk:(c + 1) * chunk]],
                blind_ints[c * chunk:(c + 1) * chunk],
                prove_range,
                rng,
            )
            proofs.append(proof)
            V = V_c if V is None else RP._point_concat(V, V_c)

    # downshift: commit(-offset, 0) added to each (only the original length)
    offset = 1 << (prove_range - 1)
    inv_offset = G.pedersen_B().scalar_mul(SS.L - offset)
    commits = curve.add(RP._point_slice(V, slice(0, d)),
                        _broadcast_point(inv_offset, d))
    return proofs, commits


def verify_rangeproof(
    proofs: list[RP.RangeProof],
    commits,
    fp: FpConfig,
    prove_range: int,
    rng: np.random.Generator,
    mesh=None,
) -> bool:
    """verify_rangeproof (mod.rs:149-216).

    commits: device PointArray (preferred) or list of spec points. The
    +offset re-shift, identity padding and compression all run as batched
    device ops (the reference re-shifts per element on CPU)."""
    import jax.numpy as jnp

    if not isinstance(commits, curve.PointArray):
        commits = curve.pack_points(list(commits))
    d = commits.x.shape[1]
    offset = 1 << (prove_range - 1)
    offset_pt = G.pedersen_B().scalar_mul(offset)
    shifted = curve.add(commits, _broadcast_point(offset_pt, d))
    ext_len = next_pow2(d)
    if ext_len != d:
        ident = curve.identity((ext_len - d,))
        ident = curve.PointArray(*[
            jnp.broadcast_to(c, (16, ext_len - d)) for c in ident])
        shifted = RP._point_concat(shifted, ident)
    all_bytes = RP._compress_bytes(shifted)
    chunk = ext_len // len(proofs)
    items = []
    for c, proof in enumerate(proofs):
        t = Transcript(b"RangeProof")
        items.append((t, proof, all_bytes[c * chunk:(c + 1) * chunk]))
    # all chunks verify as ONE random-linear-combination mega-MSM (the
    # reference loops verify_multiple per chunk); with a mesh the MSM
    # shards its terms over the 'param' axis
    return RP.verify_multiple_batch(items, prove_range, rng, mesh=mesh)
