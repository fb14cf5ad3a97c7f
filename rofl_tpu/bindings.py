"""FFI-parity API: the reference's 29 C bindings as one flat Python module.

The reference exposes rofl_crypto to the Python fl-analysis framework
through 29 `extern "C"` functions (rofl_crypto/src/bindings32.rs:43-764)
speaking bincode byte blobs over raw pointers. Here Python *is* the host
language, so the same surface is a flat module of functions taking/returning
the identical bincode wire formats (see crypto/serde_vec.py) — an
fl-analysis-style caller can switch its ctypes layer to these calls 1:1.
Heavy math dispatches to the batched TPU kernels.

Error-returning functions (the PyRes family) raise ValueError with the
reference's error message semantics instead of returning {ret,msg} structs.
"""

from __future__ import annotations

import numpy as np

from .crypto import serde_vec as sv
from .crypto import compressed_rand_proof as crp
from .crypto import l2_range_proof as l2rp
from .crypto import pedersen, range_proof_vec, sigma
from .crypto.fp_codec import FpConfig
from .ops import bsgs, curve, sc
from .ops.curve import PointArray
from .spec import scalar as SS

import jax.numpy as jnp

DEFAULT_FP = FpConfig(16, 7)


def _spec_points_ser(points: list) -> bytes:
    """List of spec RistrettoPoints → bincode Vec<RistrettoPoint>."""
    return sv._bytes_vec([p.compress() for p in points])


def say_hello() -> bytes:
    """bindings32.rs:43-58: returns serialize_scalar_vec([x]) smoke blob."""
    return sv.serialize_scalar_vec(sc.pack_scalars([42]))


# -- aggregation --------------------------------------------------------------


def add_commitments(commitment_blobs: list[bytes]) -> bytes:
    """Elementwise sum of n Vec<RistrettoPoint> blobs (bindings32.rs:64-86)."""
    pts = [sv.deserialize_rp_vec(b) for b in commitment_blobs]
    acc = PointArray(
        jnp.stack([p.x for p in pts], axis=1),
        jnp.stack([p.y for p in pts], axis=1),
        jnp.stack([p.z for p in pts], axis=1),
        jnp.stack([p.t for p in pts], axis=1),
    )
    return sv.serialize_rp_vec(curve.tree_sum(acc, axis=0))


def add_commitments_transposed(commitment_blobs: list[bytes]) -> list[bytes]:
    """Each blob reduced to its own single-point sum (bindings32.rs:90-114)."""
    out = []
    for b in commitment_blobs:
        pts = sv.deserialize_rp_vec(b)
        total = curve.tree_sum(pts, axis=0)
        enc = curve.compress_to_bytes(total)[0].tobytes()
        out.append(sv._wrap_bytes(enc))
    return out


def commit_no_blinding(values: np.ndarray, fp: FpConfig = DEFAULT_FP) -> bytes:
    """f32 → Vec<RistrettoPoint> of unblinded commits (bindings32.rs:118-128)."""
    m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(values, np.float32)))
    return sv.serialize_rp_vec(pedersen.pedersen_commit_no_blinding(m))


def commit(values: np.ndarray, blinding_blob: bytes,
           fp: FpConfig = DEFAULT_FP) -> bytes:
    """f32 + Vec<Scalar> blindings → Pedersen commits (bindings32.rs:130-151)."""
    m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(values, np.float32)))
    r = jnp.asarray(sv.deserialize_scalar_vec(blinding_blob))
    return sv.serialize_rp_vec(pedersen.pedersen_commit(m, r))


def generate_cancelling_blindings(n_vec: int, n_dim: int,
                                  rng: np.random.Generator | None = None
                                  ) -> list[bytes]:
    """n_vec Vec<Scalar> blobs with elementwise sum ≡ 0 (bindings32.rs:154-166)."""
    rng = rng or np.random.default_rng()
    if n_vec == 1:
        return [sv.serialize_scalar_vec(pedersen.rnd_scalar_limbs(n_dim, rng))]
    vecs = pedersen.cancelling_scalar_limbs(n_vec, n_dim, rng)
    return [sv.serialize_scalar_vec(v) for v in vecs]


def select_blindings(blinding_blob: bytes, indices) -> bytes:
    """Index-select from a Vec<Scalar> blob (bindings32.rs:169-189)."""
    limbs = sv.deserialize_scalar_vec(blinding_blob)
    sel = limbs[:, np.asarray(indices, np.int64)]
    return sv.serialize_scalar_vec(sel)


def select_commitments(commit_blob: bytes, indices) -> bytes:
    """Index-select from a Vec<RistrettoPoint> blob (bindings32.rs:191-211)."""
    pts = sv.deserialize_rp_vec(commit_blob)
    idx = jnp.asarray(np.asarray(indices, np.int64))
    sel = PointArray(*[jnp.take(c, idx, axis=1) for c in pts])
    return sv.serialize_rp_vec(sel)


def extract_values(commit_blob: bytes, fp: FpConfig = DEFAULT_FP,
                   table_size: int | None = None) -> np.ndarray:
    """BSGS discrete log of each commitment → f32 (bindings32.rs:213-226).

    Default table matches the reference's default_discrete_log_vec
    (bsgs32.rs:36-38): m = 2^(BSGS_N_BITS/2 + PRECOMP_BIAS).
    """
    pts = sv.deserialize_rp_vec(commit_blob)
    m = table_size or fp.default_bsgs_table_size
    limbs, ok = bsgs.solve_discrete_log(pts, m, fp.bsgs_n_bits)
    if not bool(np.asarray(ok).all()):
        raise ValueError("discrete log not found")
    return fp.scalar_limbs_to_f32(np.asarray(limbs))


# -- range proofs --------------------------------------------------------------


def create_rangeproof(values: np.ndarray, blinding_blob: bytes,
                      range_exp: int, n_partition: int,
                      fp: FpConfig = DEFAULT_FP,
                      rng: np.random.Generator | None = None
                      ) -> tuple[bytes, bytes]:
    """(Vec<RangeProof>, Vec<RistrettoPoint>) blobs (bindings32.rs:228-261)."""
    rng = rng or np.random.default_rng()
    blind = np.asarray(sv.deserialize_scalar_vec(blinding_blob))
    proofs, commits = range_proof_vec.create_rangeproof(
        np.asarray(values, np.float32), blind, fp, range_exp, n_partition, rng)
    return sv.serialize_range_proof_vec(proofs), sv.serialize_rp_vec(commits)


def verify_rangeproof(commit_blob: bytes, proof_blob: bytes, range_exp: int,
                      fp: FpConfig = DEFAULT_FP,
                      rng: np.random.Generator | None = None) -> bool:
    """bindings32.rs:265-287."""
    rng = rng or np.random.default_rng()
    pts = sv.deserialize_rp_vec(commit_blob)
    proofs = sv.deserialize_range_proof_vec(proof_blob)
    return range_proof_vec.verify_rangeproof(proofs, pts, fp, range_exp, rng)


# -- rand proofs ---------------------------------------------------------------


def create_randproof(values: np.ndarray, blinding_blob: bytes,
                     fp: FpConfig = DEFAULT_FP,
                     rng: np.random.Generator | None = None
                     ) -> tuple[bytes, bytes]:
    """(Vec<RandProof>, Vec<ElGamalPair>) blobs (bindings32.rs:295-322)."""
    rng = rng or np.random.default_rng()
    m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(values, np.float32)))
    r = jnp.asarray(sv.deserialize_scalar_vec(blinding_blob))
    proof, c = sigma.rand_proof_prove(m, r, rng)
    return sv.serialize_rand_proof_vec(proof), sv.serialize_eg_pair_vec(c)


def verify_randproof(ped_commit_blob: bytes, rand_commit_blob: bytes,
                     proof_blob: bytes) -> bool:
    """Joins (L, R) point blobs into pairs and verifies
    (bindings32.rs:324-370)."""
    L = sv.deserialize_rp_vec(ped_commit_blob)
    R = sv.deserialize_rp_vec(rand_commit_blob)
    proof = sv.deserialize_rand_proof_vec(proof_blob)
    ok = sigma.rand_proof_verify(proof, pedersen.ElGamalPairArray(L, R))
    return bool(np.asarray(ok).all())


def create_squarerandproof(values: np.ndarray, blinding1_blob: bytes,
                           blinding2_blob: bytes, fp: FpConfig = DEFAULT_FP,
                           rng: np.random.Generator | None = None
                           ) -> tuple[bytes, bytes]:
    """(Vec<SquareRandProof>, Vec<SquareRandProofCommitments>)
    (bindings32.rs:373-413)."""
    rng = rng or np.random.default_rng()
    m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(values, np.float32)))
    r1 = jnp.asarray(sv.deserialize_scalar_vec(blinding1_blob))
    r2 = jnp.asarray(sv.deserialize_scalar_vec(blinding2_blob))
    proof, c = sigma.square_rand_proof_prove(m, r1, r2, rng)
    return (sv.serialize_square_rand_proof_vec(proof),
            sv.serialize_squaretriple_vec(c))


def verify_squarerandproof(commit_blob: bytes, proof_blob: bytes) -> bool:
    """bindings32.rs:415-437."""
    c = sv.deserialize_squaretriple_vec(commit_blob)
    proof = sv.deserialize_square_rand_proof_vec(proof_blob)
    ok = sigma.square_rand_proof_verify(proof, c)
    return bool(np.asarray(ok).all())


# -- combined L2 path ----------------------------------------------------------


def create_l2proof(values: np.ndarray, blinding1_blob: bytes,
                   blinding2_blob: bytes, range_exp: int, n_partition: int,
                   fp: FpConfig = DEFAULT_FP,
                   rng: np.random.Generator | None = None
                   ) -> tuple[bytes, bytes, bytes, bytes]:
    """One-call square+range+sum L2 proof (bindings32.rs:441-503):
    (Vec<SquareRandProof>, Vec<SquareRandProofCommitments>,
     RangeProof, RistrettoPoint) blobs."""
    rng = rng or np.random.default_rng()
    vals = np.asarray(values, np.float32)
    b2_limbs = sv.deserialize_scalar_vec(blinding2_blob)
    b2_ints = [int(x) for x in sc.unpack_scalars(b2_limbs)]
    range_proof, square_commit = l2rp.create_rangeproof_l2(
        vals, b2_ints, fp, range_exp, rng)

    m = jnp.asarray(fp.f32_to_scalar_limbs(vals))
    r1 = jnp.asarray(sv.deserialize_scalar_vec(blinding1_blob))
    r2 = jnp.asarray(b2_limbs)
    rand_proof, commits = sigma.square_rand_proof_prove(m, r1, r2, rng)
    return (
        sv.serialize_square_rand_proof_vec(rand_proof),
        sv.serialize_squaretriple_vec(commits),
        sv._wrap_bytes(range_proof.to_bytes()),
        sv._wrap_bytes(square_commit.compress()),
    )


def verify_l2proof(commit_blob: bytes, randproof_blob: bytes,
                   rangeproof_blob: bytes, square_blob: bytes,
                   prove_range: int, fp: FpConfig = DEFAULT_FP,
                   rng: np.random.Generator | None = None) -> bool:
    """bindings32.rs:507-552 incl. the Σ c_sq == square_commit
    homomorphism check (529-538)."""
    rng = rng or np.random.default_rng()
    c = sv.deserialize_squaretriple_vec(commit_blob)
    rand_proof = sv.deserialize_square_rand_proof_vec(randproof_blob)
    range_proof = sv.deserialize_range_proof(rangeproof_blob)
    sq_raw = sv._iter_bytes_vec(sv._u64(1) + square_blob)[0]
    square_commit = sv.decompress_bytes_list([sq_raw])

    # Σ c_sq must equal the committed sum of squares
    total = curve.tree_sum(c.c_sq, axis=0)
    if not bool(np.asarray(curve.eq(total, square_commit)).all()):
        raise ValueError("sum of square commitments mismatch (SumError)")

    ok_rand = bool(np.asarray(sigma.square_rand_proof_verify(rand_proof, c)).all())
    from .spec import ristretto as SR

    sq_spec = SR.decompress(sq_raw)
    ok_range = l2rp.verify_rangeproof_l2(range_proof, sq_spec, prove_range, rng)
    return ok_rand and ok_range


# -- splits / joins ------------------------------------------------------------


def split_elgamal_pair_vector(commit_blob: bytes) -> tuple[bytes, bytes]:
    """Vec<ElGamalPair> → (Vec<Point> L, Vec<Point> R) (bindings32.rs:555-571)."""
    pairs = sv.deserialize_eg_pair_vec(commit_blob)
    return sv.serialize_rp_vec(pairs.L), sv.serialize_rp_vec(pairs.R)


def join_to_elgamal_pair_vector(ped_blob: bytes, rand_blob: bytes) -> bytes:
    """bindings32.rs:573-596."""
    L = sv.deserialize_rp_vec(ped_blob)
    R = sv.deserialize_rp_vec(rand_blob)
    return sv.serialize_eg_pair_vec(pedersen.ElGamalPairArray(L, R))


def split_squaretriple_pair_vector(commit_blob: bytes
                                   ) -> tuple[bytes, bytes, bytes]:
    """Vec<SquareRandProofCommitments> → (L, R, c_sq) point blobs
    (bindings32.rs:598-616)."""
    c = sv.deserialize_squaretriple_vec(commit_blob)
    return (sv.serialize_rp_vec(c.c.L), sv.serialize_rp_vec(c.c.R),
            sv.serialize_rp_vec(c.c_sq))


def join_to_squaretriple_pair_vector(ped_blob: bytes, rand_blob: bytes,
                                     square_blob: bytes) -> bytes:
    """bindings32.rs:618-649."""
    L = sv.deserialize_rp_vec(ped_blob)
    R = sv.deserialize_rp_vec(rand_blob)
    c_sq = sv.deserialize_rp_vec(square_blob)
    return sv.serialize_squaretriple_vec(
        sigma.SquareRandCommitVec(pedersen.ElGamalPairArray(L, R), c_sq))


# -- misc ----------------------------------------------------------------------


def clip_to_range(values: np.ndarray, range_exp: int,
                  fp: FpConfig = DEFAULT_FP) -> np.ndarray:
    """bindings32.rs:652-658."""
    return range_proof_vec.clip_f32_to_range_vec(
        np.asarray(values, np.float32), fp, range_exp)


def quantize_probabilistic(values: np.ndarray, range_exp: int,
                           fp: FpConfig = DEFAULT_FP) -> np.ndarray:
    """Currently clips only, exactly like the reference stub
    (bindings32.rs:661-672, prob_quant.rs)."""
    return clip_to_range(values, range_exp, fp)


def commits_equal(commit_a_blob: bytes, commit_b_blob: bytes) -> bool:
    """bindings32.rs:675-691."""
    a = sv.deserialize_rp_vec(commit_a_blob)
    b = sv.deserialize_rp_vec(commit_b_blob)
    if a.x.shape != b.x.shape:
        return False
    return bool(np.asarray(curve.eq(a, b)).all())


def equals_neutral_group_element_vec(commit_blob: bytes) -> list[bool]:
    """Per-element identity check (bindings32.rs:693-704)."""
    pts = sv.deserialize_rp_vec(commit_blob)
    ident = curve.identity(pts.batch_shape)
    return [bool(x) for x in np.asarray(curve.eq(pts, ident))]


def create_zero_scalar_vector(length: int) -> bytes:
    return sv.serialize_scalar_vec(sc.pack_scalars([0] * length))


def create_zero_group_element_vector(length: int) -> bytes:
    return sv.serialize_rp_vec(curve.identity((length,)))


def create_random_blinding_vector(length: int,
                                  rng: np.random.Generator | None = None
                                  ) -> bytes:
    rng = rng or np.random.default_rng()
    return sv.serialize_scalar_vec(pedersen.rnd_scalar_limbs(length, rng))


def add_scalars(scalar_blob: bytes) -> bytes:
    """Sum a Vec<Scalar> blob → single 40-byte Scalar blob
    (bindings32.rs:727-734)."""
    limbs = sv.deserialize_scalar_vec(scalar_blob)
    total = sum(sc.unpack_scalars(limbs)) % SS.L
    return sv.serialize_scalar(total)


def filter_unequal_commits(commit_a_blob: bytes, commit_b_blob: bytes
                           ) -> tuple[bytes, bytes]:
    """Keep (a_i, b_i) where a_i != b_i (bindings32.rs:737-764)."""
    a = sv.deserialize_rp_vec(commit_a_blob)
    b = sv.deserialize_rp_vec(commit_b_blob)
    neq = ~np.asarray(curve.eq(a, b))
    idx = jnp.asarray(np.nonzero(neq)[0])
    a_f = PointArray(*[jnp.take(c, idx, axis=1) for c in a])
    b_f = PointArray(*[jnp.take(c, idx, axis=1) for c in b])
    return sv.serialize_rp_vec(a_f), sv.serialize_rp_vec(b_f)
