"""Batched Σ-protocols: RandProof, SquareRandProof, SquareProof.

TPU-native rebuild of rofl_crypto's per-element Schnorr-style proofs
(rand_proof/, square_rand_proof/, square_proof/): the reference rayon-maps a
prover per parameter, each with a fresh Merlin transcript; here the whole
parameter vector is proved/verified as one batch — commitments via
fixed-base kernels, challenges via the batched device transcript, responses
via batched mod-l arithmetic. Bit-exact per element with the reference
given the same inputs and blindings.

Transcript schedules (must match exactly):
  RandProof       (rand_proof/mod.rs:64-85, dealer.rs:15-56):
    dom-sep "randomness proof v1"; "C"(64B eg); "C_prime"(64B eg);
    challenge "c"; "Z_m"; "Z_r".
  SquareRandProof (square_rand_proof/mod.rs:78-115, constants.rs):
    dom-sep; "C_eg"(64B); "C_ped"(32B); "C_prime_eg"; "C_prime_ped";
    challenge "c"; "Z_m"; "ZR_1"; "ZR_2".
  SquareProof     (square_proof/mod.rs:77-113): same labels but c_l is a
    single Pedersen point (32B).

Response equations (party.rs in each module):
  z_m = m' + m·c;  z_r1 = r1' + r1·c;  z_r2 = r2' + (r2 − m·r1)·c.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import curve, sc
from ..ops.curve import PointArray
from . import pedersen
from .batch_transcript import BatchTranscript, field_byte_cols, scalar_byte_cols
from .pedersen import ElGamalPairArray

DOMAIN_SEP = (b"dom-sep", b"randomness proof v1")


def _eg_byte_cols(pair: ElGamalPairArray) -> jnp.ndarray:
    return jnp.concatenate(
        [field_byte_cols(curve.compress(pair.L)), field_byte_cols(curve.compress(pair.R))],
        axis=0,
    )


def _rand_scalars(n: int, rng: np.random.Generator) -> jnp.ndarray:
    return jnp.asarray(pedersen.rnd_scalar_limbs(n, rng))


# -- RandProof ---------------------------------------------------------------


@dataclass
class RandProofVec:
    c_prime: ElGamalPairArray
    z_m: jnp.ndarray  # (16, N)
    z_r: jnp.ndarray  # (16, N)


def rand_proof_prove(
    m: jnp.ndarray,
    r: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"RandProof",
) -> tuple[RandProofVec, ElGamalPairArray]:
    """create_randproof_vec(_existing) (rand_proof_vec/mod.rs:19-76)."""
    n = m.shape[1]
    if existing is None:
        c = pedersen.elgamal_commit(m, r)
    else:
        c = pedersen.elgamal_complete_existing(existing, r)
    m_prime = _rand_scalars(n, rng)
    r_prime = _rand_scalars(n, rng)
    c_prime = pedersen.elgamal_commit(m_prime, r_prime)

    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C", _eg_byte_cols(c))
    t.append_message(b"C_prime", _eg_byte_cols(c_prime))
    challenge = t.challenge_scalars(b"c")

    z_m = sc.add(m_prime, sc.mul(m, challenge))
    z_r = sc.add(r_prime, sc.mul(r, challenge))
    return RandProofVec(c_prime, z_m, z_r), c


def rand_proof_verify(
    proof: RandProofVec,
    c: ElGamalPairArray,
    transcript_label: bytes = b"RandProof",
) -> jnp.ndarray:
    """Batched verify (rand_proof/mod.rs:64-85) → bool mask."""
    n = proof.z_m.shape[1]
    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C", _eg_byte_cols(c))
    t.append_message(b"C_prime", _eg_byte_cols(proof.c_prime))
    challenge = t.challenge_scalars(b"c")

    lhs = pedersen.elgamal_commit(proof.z_m, proof.z_r)
    rhs = ElGamalPairArray(
        curve.add(proof.c_prime.L, curve.scalar_mul(c.L, challenge)),
        curve.add(proof.c_prime.R, curve.scalar_mul(c.R, challenge)),
    )
    return curve.eq(lhs.L, rhs.L) & curve.eq(lhs.R, rhs.R)


# -- SquareRandProof ---------------------------------------------------------


@dataclass
class SquareRandProofVec:
    c_prime: ElGamalPairArray  # prime EG pair
    c_sq_prime: PointArray     # prime Pedersen point (base = C.L)
    z_m: jnp.ndarray
    z_r1: jnp.ndarray
    z_r2: jnp.ndarray


@dataclass
class SquareRandCommitVec:
    """SquareRandProofCommitments batch: EG pair + square Pedersen point."""

    c: ElGamalPairArray
    c_sq: PointArray


def square_rand_proof_prove(
    m: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"SquareRandProof",
) -> tuple[SquareRandProofVec, SquareRandCommitVec]:
    """Batched SquareRandProof::prove(_existing)
    (square_rand_proof/party.rs:17-135)."""
    n = m.shape[1]
    if existing is None:
        c_eg = pedersen.elgamal_commit(m, r1)
    else:
        c_eg = pedersen.elgamal_complete_existing(existing, r1)
    m_sq = sc.mul(m, m)  # scalar-field square (party.rs:38)
    c_sq = pedersen.pedersen_commit(m_sq, r2)

    m_prime = _rand_scalars(n, rng)
    r1_prime = _rand_scalars(n, rng)
    r2_prime = _rand_scalars(n, rng)
    c_prime = pedersen.elgamal_commit(m_prime, r1_prime)
    # prime square commitment uses C.L as base: C.L^m' · H^r2'
    c_sq_prime = curve.add(
        curve.scalar_mul(c_eg.L, m_prime), pedersen.base_H().mul(r2_prime)
    )

    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C_eg", _eg_byte_cols(c_eg))
    t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
    t.append_message(b"C_prime_eg", _eg_byte_cols(c_prime))
    t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
    challenge = t.challenge_scalars(b"c")

    z_m = sc.add(m_prime, sc.mul(m, challenge))
    z_r1 = sc.add(r1_prime, sc.mul(r1, challenge))
    z_r2 = sc.add(r2_prime, sc.mul(sc.sub(r2, sc.mul(m, r1)), challenge))
    return (
        SquareRandProofVec(c_prime, c_sq_prime, z_m, z_r1, z_r2),
        SquareRandCommitVec(c_eg, c_sq),
    )


def square_rand_proof_verify(
    proof: SquareRandProofVec,
    c: SquareRandCommitVec,
    transcript_label: bytes = b"SquareRandProof",
) -> jnp.ndarray:
    """Batched verify (square_rand_proof/mod.rs:78-115)."""
    n = proof.z_m.shape[1]
    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C_eg", _eg_byte_cols(c.c))
    t.append_message(b"C_ped", field_byte_cols(curve.compress(c.c_sq)))
    t.append_message(b"C_prime_eg", _eg_byte_cols(proof.c_prime))
    t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(proof.c_sq_prime)))
    challenge = t.challenge_scalars(b"c")

    # ElGamal relation
    lhs = pedersen.elgamal_commit(proof.z_m, proof.z_r1)
    rhs_L = curve.add(proof.c_prime.L, curve.scalar_mul(c.c.L, challenge))
    rhs_R = curve.add(proof.c_prime.R, curve.scalar_mul(c.c.R, challenge))
    ok_eg = curve.eq(lhs.L, rhs_L) & curve.eq(lhs.R, rhs_R)

    # Pedersen square relation: C.L^z_m · H^z_r2 == C'_sq + c·C_sq
    lhs_ped = curve.add(
        curve.scalar_mul(c.c.L, proof.z_m), pedersen.base_H().mul(proof.z_r2)
    )
    rhs_ped = curve.add(proof.c_sq_prime, curve.scalar_mul(c.c_sq, challenge))
    return ok_eg & curve.eq(lhs_ped, rhs_ped)


# -- SquareProof (Pedersen-only) --------------------------------------------


@dataclass
class SquareProofVec:
    c_l_prime: PointArray
    c_sq_prime: PointArray
    z_m: jnp.ndarray
    z_r1: jnp.ndarray
    z_r2: jnp.ndarray


@dataclass
class SquareCommitVec:
    c_l: PointArray
    c_sq: PointArray


def square_proof_prove(
    m: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"SquareProof",
) -> tuple[SquareProofVec, SquareCommitVec]:
    """Batched SquareProof::prove(_existing) (square_proof/party.rs)."""
    n = m.shape[1]
    c_l = pedersen.pedersen_commit(m, r1) if existing is None else existing
    m_sq = sc.mul(m, m)
    c_sq = pedersen.pedersen_commit(m_sq, r2)

    m_prime = _rand_scalars(n, rng)
    r1_prime = _rand_scalars(n, rng)
    r2_prime = _rand_scalars(n, rng)
    c_l_prime = pedersen.pedersen_commit(m_prime, r1_prime)
    c_sq_prime = curve.add(
        curve.scalar_mul(c_l, m_prime), pedersen.base_H().mul(r2_prime)
    )

    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C_eg", field_byte_cols(curve.compress(c_l)))
    t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
    t.append_message(b"C_prime_eg", field_byte_cols(curve.compress(c_l_prime)))
    t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
    challenge = t.challenge_scalars(b"c")

    z_m = sc.add(m_prime, sc.mul(m, challenge))
    z_r1 = sc.add(r1_prime, sc.mul(r1, challenge))
    z_r2 = sc.add(r2_prime, sc.mul(sc.sub(r2, sc.mul(m, r1)), challenge))
    return SquareProofVec(c_l_prime, c_sq_prime, z_m, z_r1, z_r2), SquareCommitVec(
        c_l, c_sq
    )


def square_proof_verify(
    proof: SquareProofVec,
    c: SquareCommitVec,
    transcript_label: bytes = b"SquareProof",
) -> jnp.ndarray:
    n = proof.z_m.shape[1]
    t = BatchTranscript(transcript_label, n)
    t.append_message(*DOMAIN_SEP)
    t.append_message(b"C_eg", field_byte_cols(curve.compress(c.c_l)))
    t.append_message(b"C_ped", field_byte_cols(curve.compress(c.c_sq)))
    t.append_message(b"C_prime_eg", field_byte_cols(curve.compress(proof.c_l_prime)))
    t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(proof.c_sq_prime)))
    challenge = t.challenge_scalars(b"c")

    lhs = pedersen.pedersen_commit(proof.z_m, proof.z_r1)
    rhs = curve.add(proof.c_l_prime, curve.scalar_mul(c.c_l, challenge))
    ok1 = curve.eq(lhs, rhs)
    lhs_ped = curve.add(
        curve.scalar_mul(c.c_l, proof.z_m), pedersen.base_H().mul(proof.z_r2)
    )
    rhs_ped = curve.add(proof.c_sq_prime, curve.scalar_mul(c.c_sq, challenge))
    return ok1 & curve.eq(lhs_ped, rhs_ped)
