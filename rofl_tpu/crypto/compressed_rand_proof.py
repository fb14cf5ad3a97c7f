"""CompressedRandProof — O(1)-size batched randomness proof.

Replaces rofl_crypto/src/compressed_rand_proof/: N per-element ElGamal
well-formedness proofs compress into ONE Σ-protocol via a random-linear-
combination with challenge powers c^(i+1):

  z_m = m' + Σ m_i·c^(i+1);  z_r = r' + Σ r_i·c^(i+1)
  check: EG(z_m, z_r) == C' + Σ C_i·c^(i+1)

Transcript (dealer.rs:19-35, verify mod.rs:77-103): dom-sep "randomness
proof v1"; each C_i under a UNIQUE per-index 3-byte label (the reference's
generated `unique_u8_triplets.rs` is MISSING from the snapshot — SURVEY.md
§2.1; we regenerate deterministically as little-endian index triplets,
documented here as this build's canonical label scheme); "C_prime_eg";
challenge "c"; "Z_m"; "ZR".

Device work: commitments (fixed-base), challenge powers + inner products
(sc ops), Σ C_i·c^i (MSM). The single host transcript absorbs all C_i
sequentially (inherently serial sponge — native keccak backend).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops import curve, msm, sc
from ..ops.curve import PointArray
from ..spec import scalar as SS
from ..spec.merlin import Transcript
from . import pedersen
from .pedersen import ElGamalPairArray

LABEL_PRIME = b"C_prime_eg"
LABEL_Z_M = b"Z_m"
LABEL_Z_R = b"ZR"
LABEL_CHALLENGE = b"c"
DOMAIN_SEP = (b"dom-sep", b"randomness proof v1")


def index_label(i: int) -> bytes:
    """Unique 3-byte per-index transcript label (regenerated
    unique_u8_triplets semantics: distinct triplet per index)."""
    return bytes([i & 0xFF, (i >> 8) & 0xFF, (i >> 16) & 0xFF])


@dataclass
class CompressedRandProof:
    c_prime_L: bytes
    c_prime_R: bytes
    z_m: int
    z_r: int

    def to_bytes(self) -> bytes:
        return self.c_prime_L + self.c_prime_R + SS.to_bytes(self.z_m) + SS.to_bytes(self.z_r)

    @classmethod
    def from_bytes(cls, data: bytes) -> "CompressedRandProof":
        if len(data) != 128:
            raise ValueError("CompressedRandProof must be 128 bytes")
        z_m = SS.from_canonical_bytes(data[64:96])
        z_r = SS.from_canonical_bytes(data[96:128])
        if z_m is None or z_r is None:
            raise ValueError("non-canonical scalars")
        return cls(data[:32], data[32:64], z_m, z_r)


def _absorb_commitments(t: Transcript, L_bytes: np.ndarray, R_bytes: np.ndarray):
    n = L_bytes.shape[0]
    for i in range(n):
        t.append_message(index_label(i), bytes(L_bytes[i]) + bytes(R_bytes[i]))


def prove(
    transcript: Transcript,
    m: jnp.ndarray,
    r: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
) -> tuple[CompressedRandProof, ElGamalPairArray]:
    """CompressedRandProof::prove(_existing) (mod.rs:42-75, party.rs)."""
    n = m.shape[1]
    if existing is None:
        c = pedersen.elgamal_commit(m, r)
    else:
        c = pedersen.elgamal_complete_existing(existing, r)
    m_prime = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    r_prime = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    c_prime = pedersen.elgamal_commit(
        jnp.asarray(sc.pack_scalars([m_prime])), jnp.asarray(sc.pack_scalars([r_prime]))
    )

    L_bytes = curve.compress_to_bytes(c.L)
    R_bytes = curve.compress_to_bytes(c.R)
    cpL = curve.compress_to_bytes(c_prime.L)[0].tobytes()
    cpR = curve.compress_to_bytes(c_prime.R)[0].tobytes()

    transcript.append_message(*DOMAIN_SEP)
    _absorb_commitments(transcript, L_bytes, R_bytes)
    transcript.append_message(LABEL_PRIME, cpL + cpR)
    challenge = transcript.challenge_scalar(LABEL_CHALLENGE)

    # powers c^1..c^n
    pows = sc.powers(jnp.asarray(sc.pack_scalars([challenge])), n + 1)[:, 1:]
    z_m = (m_prime + int(sc.unpack_scalars(np.asarray(sc.inner_product(m, pows)))[0])) % SS.L
    z_r = (r_prime + int(sc.unpack_scalars(np.asarray(sc.inner_product(r, pows)))[0])) % SS.L
    transcript.append_message(LABEL_Z_M, SS.to_bytes(z_m))
    transcript.append_message(LABEL_Z_R, SS.to_bytes(z_r))
    return CompressedRandProof(cpL, cpR, z_m, z_r), c


def verify(
    transcript: Transcript,
    proof: CompressedRandProof,
    c: ElGamalPairArray,
) -> bool:
    """CompressedRandProof::verify (mod.rs:77-103)."""
    n = c.L.batch_shape[0]
    L_bytes = curve.compress_to_bytes(c.L)
    R_bytes = curve.compress_to_bytes(c.R)
    transcript.append_message(*DOMAIN_SEP)
    _absorb_commitments(transcript, L_bytes, R_bytes)
    transcript.append_message(LABEL_PRIME, proof.c_prime_L + proof.c_prime_R)
    challenge = transcript.challenge_scalar(LABEL_CHALLENGE)
    transcript.append_message(LABEL_Z_M, SS.to_bytes(proof.z_m))
    transcript.append_message(LABEL_Z_R, SS.to_bytes(proof.z_r))

    pows = sc.powers(jnp.asarray(sc.pack_scalars([challenge])), n + 1)[:, 1:]
    z_m_limbs = jnp.asarray(sc.pack_scalars([proof.z_m]))
    z_r_limbs = jnp.asarray(sc.pack_scalars([proof.z_r]))
    lhs = pedersen.elgamal_commit(z_m_limbs, z_r_limbs)

    from ..spec import ristretto as SR
    from ..ops import fe

    cp_enc = np.stack([
        np.frombuffer(proof.c_prime_L, np.uint8),
        np.frombuffer(proof.c_prime_R, np.uint8),
    ])
    cp_pts, valid = curve.decompress(jnp.asarray(fe.from_bytes_array(cp_enc)))
    if not bool(np.all(np.asarray(valid))):
        return False

    sum_L = msm.msm(c.L, pows)
    sum_R = msm.msm(c.R, pows)
    rhs_L = curve.add(PointArray(*[x[:, :1] for x in cp_pts]), sum_L)
    rhs_R = curve.add(PointArray(*[x[:, 1:2] for x in cp_pts]), sum_R)
    return bool(np.asarray(curve.eq(lhs.L, rhs_L))[0]) and bool(
        np.asarray(curve.eq(lhs.R, rhs_R))[0]
    )
