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
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import curve, sc
from ..ops.dispatch import use_pallas
from ..ops.curve import PointArray
from . import pedersen
from .batch_transcript import BatchTranscript, field_byte_cols, scalar_byte_cols
from .pedersen import ElGamalPairArray

DOMAIN_SEP = (b"dom-sep", b"randomness proof v1")

# Every prove/verify below is ONE jitted XLA program (fixed-base muls,
# compressions, the full batched Merlin/STROBE schedule, response
# arithmetic): per-op dispatch latency through the device tunnel is ~3 ms,
# so running the ~300-step transcript byte schedule eagerly costs seconds
# while the fused program runs in milliseconds. Labels are static jit args;
# the Pedersen tables are passed as device-array args so retraces only
# happen per (label, shape).


# -- mesh routing ------------------------------------------------------------
#
# The Σ batch is the per-param hot loop of Range/L2 mode (reference:
# rand_proof_vec/mod.rs:30-33 rayon-maps a prover per parameter). Every op
# in the cores below is ELEMENTWISE over the lane axis — per-lane lockstep
# STROBE transcripts, fixed-base muls, response arithmetic — so the
# TPU-native multi-chip path is explicit lane shardings: place each lane
# operand with NamedSharding(mesh, P(None, 'param')) and let GSPMD
# partition every op across the axis with ZERO collectives. A shard_map
# wrapper would compute the identical partitioning but forces a fresh
# monolithic retrace/compile per mesh (measured 408 s on XLA:CPU, round 3)
# — for a purely elementwise program the sharding annotation IS the
# explicit mesh path. Bit-identity at 1/2/4/8 devices is asserted by
# tests/test_parallel_mesh.py.


def _pad_lane_limbs(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(jnp.asarray(x), ((0, 0), (0, pad))) if pad else jnp.asarray(x)


def _pad_lane_points(p: PointArray, pad: int) -> PointArray:
    if not pad:
        return p
    zero = jnp.zeros((16, pad), jnp.uint32)
    one = zero.at[0].set(1)
    return PointArray(
        jnp.concatenate([p.x, zero], axis=1),
        jnp.concatenate([p.y, one], axis=1),
        jnp.concatenate([p.z, one], axis=1),
        jnp.concatenate([p.t, zero], axis=1),
    )


def _lane_put(mesh, pad: int, x):
    """Pad a lane operand to the axis multiple (identity points / zero
    scalars — inert, discarded on slice-back) and place it 'param'-sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as PSpec

    sh = NamedSharding(mesh, PSpec(None, "param"))
    if isinstance(x, PointArray):
        return PointArray(*[jax.device_put(c, sh)
                            for c in _pad_lane_points(x, pad)])
    return jax.device_put(_pad_lane_limbs(x, pad), sh)


def _lane_args(mesh, n: int, *args):
    pad = (-n) % mesh.shape["param"] if mesh is not None else 0
    if mesh is None:
        return args
    return tuple(_lane_put(mesh, pad, a) for a in args)


def _slice_lanes(n: int, x):
    if isinstance(x, ElGamalPairArray):
        return ElGamalPairArray(_slice_lanes(n, x.L), _slice_lanes(n, x.R))
    if isinstance(x, PointArray):
        return PointArray(*[c[:, :n] for c in x])
    return x[:, :n]


def _maybe_slice(mesh, n: int, *outs):
    if mesh is None or all(o.L.x.shape[1] == n if isinstance(o, ElGamalPairArray)
                           else o.x.shape[1] == n if isinstance(o, PointArray)
                           else o.shape[1] == n for o in outs):
        return outs
    return tuple(_slice_lanes(n, o) for o in outs)


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


@lru_cache(maxsize=None)
def _rand_prove_core(label: bytes, has_existing: bool):
    def f(tB, tH, m, r, m_prime, r_prime, existing):
        def eg_commit(v, b):
            from ..ops import fixed_base

            Bv = fixed_base.mul(tB, v)
            Hb = fixed_base.mul(tH, b)
            Br = fixed_base.mul(tB, b)
            return ElGamalPairArray(curve.add(Bv, Hb), Br)

        if has_existing:
            from ..ops import fixed_base

            c = ElGamalPairArray(existing, fixed_base.mul(tB, r))
        else:
            c = eg_commit(m, r)
        c_prime = eg_commit(m_prime, r_prime)

        t = BatchTranscript(label, m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C", _eg_byte_cols(c))
        t.append_message(b"C_prime", _eg_byte_cols(c_prime))
        challenge = t.challenge_scalars(b"c")

        z_m = sc.add(m_prime, sc.mul(m, challenge))
        z_r = sc.add(r_prime, sc.mul(r, challenge))
        return c, c_prime, z_m, z_r

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


def rand_proof_prove(
    m: jnp.ndarray,
    r: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"RandProof",
    mesh=None,
) -> tuple[RandProofVec, ElGamalPairArray]:
    """create_randproof_vec(_existing) (rand_proof_vec/mod.rs:19-76)."""
    n = m.shape[1]
    m_prime = _rand_scalars(n, rng)
    r_prime = _rand_scalars(n, rng)
    core = _rand_prove_core(transcript_label, existing is not None)
    ex = existing if existing is not None else curve.identity((n,))
    m, r, m_prime, r_prime, ex = _lane_args(mesh, n, m, r, m_prime,
                                            r_prime, ex)
    c, c_prime, z_m, z_r = core(
        pedersen.base_B().table, pedersen.base_H().table,
        m, r, m_prime, r_prime, ex,
    )
    c, c_prime, z_m, z_r = _maybe_slice(mesh, n, c, c_prime, z_m, z_r)
    return RandProofVec(c_prime, z_m, z_r), c


@lru_cache(maxsize=None)
def _rand_verify_core(label: bytes):
    def f(tB, tH, c_L, c_R, cp_L, cp_R, z_m, z_r):
        from ..ops import fixed_base

        t = BatchTranscript(label, z_m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C", _eg_byte_cols(ElGamalPairArray(c_L, c_R)))
        t.append_message(b"C_prime", _eg_byte_cols(ElGamalPairArray(cp_L, cp_R)))
        challenge = t.challenge_scalars(b"c")

        lhs_L = curve.add(fixed_base.mul(tB, z_m), fixed_base.mul(tH, z_r))
        lhs_R = fixed_base.mul(tB, z_r)
        rhs_L = curve.add(cp_L, curve.scalar_mul(c_L, challenge))
        rhs_R = curve.add(cp_R, curve.scalar_mul(c_R, challenge))
        return curve.eq(lhs_L, rhs_L) & curve.eq(lhs_R, rhs_R)

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


def rand_proof_verify(
    proof: RandProofVec,
    c: ElGamalPairArray,
    transcript_label: bytes = b"RandProof",
    mesh=None,
) -> jnp.ndarray:
    """Batched verify (rand_proof/mod.rs:64-85) → bool mask."""
    n = proof.z_m.shape[1]
    cL, cR, cpL, cpR, z_m, z_r = _lane_args(
        mesh, n, c.L, c.R, proof.c_prime.L, proof.c_prime.R,
        proof.z_m, proof.z_r)
    ok = _rand_verify_core(transcript_label)(
        pedersen.base_B().table, pedersen.base_H().table,
        cL, cR, cpL, cpR, z_m, z_r,
    )
    return ok[:n] if ok.shape[0] != n else ok


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


@lru_cache(maxsize=None)
def _square_rand_prove_core(label: bytes, has_existing: bool):
    def f(tB, tH, m, r1, r2, m_prime, r1_prime, r2_prime, existing):
        from ..ops import fixed_base

        def eg_commit(v, b):
            return ElGamalPairArray(
                curve.add(fixed_base.mul(tB, v), fixed_base.mul(tH, b)),
                fixed_base.mul(tB, b),
            )

        if has_existing:
            c_eg = ElGamalPairArray(existing, fixed_base.mul(tB, r1))
        else:
            c_eg = eg_commit(m, r1)
        m_sq = sc.mul(m, m)  # scalar-field square (party.rs:38)
        c_sq = curve.add(fixed_base.mul(tB, m_sq), fixed_base.mul(tH, r2))

        c_prime = eg_commit(m_prime, r1_prime)
        # prime square commitment uses C.L as base: C.L^m' · H^r2'
        c_sq_prime = curve.add(
            curve.scalar_mul(c_eg.L, m_prime), fixed_base.mul(tH, r2_prime)
        )

        t = BatchTranscript(label, m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C_eg", _eg_byte_cols(c_eg))
        t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
        t.append_message(b"C_prime_eg", _eg_byte_cols(c_prime))
        t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
        challenge = t.challenge_scalars(b"c")

        z_m = sc.add(m_prime, sc.mul(m, challenge))
        z_r1 = sc.add(r1_prime, sc.mul(r1, challenge))
        z_r2 = sc.add(r2_prime, sc.mul(sc.sub(r2, sc.mul(m, r1)), challenge))
        return c_eg, c_sq, c_prime, c_sq_prime, z_m, z_r1, z_r2

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


def square_rand_proof_prove(
    m: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"SquareRandProof",
    mesh=None,
) -> tuple[SquareRandProofVec, SquareRandCommitVec]:
    """Batched SquareRandProof::prove(_existing)
    (square_rand_proof/party.rs:17-135)."""
    n = m.shape[1]
    core = _square_rand_prove_core(transcript_label, existing is not None)
    ex = existing if existing is not None else curve.identity((n,))
    args = _lane_args(mesh, n, m, r1, r2, _rand_scalars(n, rng),
                      _rand_scalars(n, rng), _rand_scalars(n, rng), ex)
    c_eg, c_sq, c_prime, c_sq_prime, z_m, z_r1, z_r2 = core(
        pedersen.base_B().table, pedersen.base_H().table, *args,
    )
    c_eg, c_sq, c_prime, c_sq_prime, z_m, z_r1, z_r2 = _maybe_slice(
        mesh, n, c_eg, c_sq, c_prime, c_sq_prime, z_m, z_r1, z_r2)
    return (
        SquareRandProofVec(c_prime, c_sq_prime, z_m, z_r1, z_r2),
        SquareRandCommitVec(c_eg, c_sq),
    )


@lru_cache(maxsize=None)
def _square_rand_verify_core(label: bytes):
    def f(tB, tH, c_L, c_R, c_sq, cp_L, cp_R, c_sq_prime, z_m, z_r1, z_r2):
        from ..ops import fixed_base

        t = BatchTranscript(label, z_m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C_eg", _eg_byte_cols(ElGamalPairArray(c_L, c_R)))
        t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
        t.append_message(b"C_prime_eg", _eg_byte_cols(ElGamalPairArray(cp_L, cp_R)))
        t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
        challenge = t.challenge_scalars(b"c")

        # ElGamal relation
        lhs_L = curve.add(fixed_base.mul(tB, z_m), fixed_base.mul(tH, z_r1))
        lhs_R = fixed_base.mul(tB, z_r1)
        rhs_L = curve.add(cp_L, curve.scalar_mul(c_L, challenge))
        rhs_R = curve.add(cp_R, curve.scalar_mul(c_R, challenge))
        ok_eg = curve.eq(lhs_L, rhs_L) & curve.eq(lhs_R, rhs_R)

        # Pedersen square relation: C.L^z_m · H^z_r2 == C'_sq + c·C_sq
        lhs_ped = curve.add(
            curve.scalar_mul(c_L, z_m), fixed_base.mul(tH, z_r2)
        )
        rhs_ped = curve.add(c_sq_prime, curve.scalar_mul(c_sq, challenge))
        return ok_eg & curve.eq(lhs_ped, rhs_ped)

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


@lru_cache(maxsize=None)
def _square_rand_batch_verify_core(label: bytes):
    """Randomized batch verification: instead of evaluating the three
    per-lane group equations with per-lane variable-base ladders (~4·N
    256-bit ladders — the 2 s pole of EncParamsL2.verify at d=50k), check
    one random linear combination

      Σ_i ρ1ᵢ·E1ᵢ + ρ2ᵢ·E2ᵢ + ρ3ᵢ·E3ᵢ == identity

    which needs ONE 6N-term MSM (~114 add-equivalents/term vs ~380 for a
    ladder) plus two single-lane fixed-base muls. Sound with error 2^-252
    per random weight vector (standard batch-verification argument — same
    model as the rangeproof verifier's random combiners, dalek
    verify_multiple). The Fiat-Shamir challenge c comes from the SAME
    batched transcript schedule, so acceptance is bit-identical to the
    per-lane verifier for honest proofs."""

    def f(tB, tH, c_L, c_R, c_sq, cp_L, cp_R, c_sq_prime,
          z_m, z_r1, z_r2, rho):
        from ..ops import fixed_base, msm

        t = BatchTranscript(label, z_m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C_eg", _eg_byte_cols(ElGamalPairArray(c_L, c_R)))
        t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
        t.append_message(b"C_prime_eg", _eg_byte_cols(ElGamalPairArray(cp_L, cp_R)))
        t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
        challenge = t.challenge_scalars(b"c")

        n = z_m.shape[1]
        r1 = rho[:, :n]
        r2 = rho[:, n:2 * n]
        r3 = rho[:, 2 * n:]
        # E1: z_m·B + z_r1·H − C' − c·C = 0   (ElGamal L row)
        # E2: z_r1·B − C'_R − c·C_R = 0       (ElGamal R row)
        # E3: z_m·C_L + z_r2·H − C'_sq − c·C_sq = 0 (Pedersen square row)
        sB = sc.sum_reduce_groups(
            sc.add(sc.mul(r1, z_m), sc.mul(r2, z_r1)), n)
        sH = sc.sum_reduce_groups(
            sc.add(sc.mul(r1, z_r1), sc.mul(r3, z_r2)), n)
        kCL = sc.sub(sc.mul(r3, z_m), sc.mul(r1, challenge))
        kCR = sc.neg(sc.mul(r2, challenge))
        kCsq = sc.neg(sc.mul(r3, challenge))

        pts = PointArray(*[
            jnp.concatenate([a, b, cc, d, e, ff], axis=1)
            for a, b, cc, d, e, ff in zip(c_L, c_R, c_sq, cp_L, cp_R,
                                          c_sq_prime)
        ])
        scal = jnp.concatenate(
            [kCL, kCR, kCsq, sc.neg(r1), sc.neg(r2), sc.neg(r3)], axis=1)
        total = curve.add(
            msm.msm(pts, scal),
            curve.add(fixed_base.mul(tB, sB), fixed_base.mul(tH, sH)))
        ident = curve.identity((1,))
        return curve.eq(total, ident)

    return jax.jit(f) if use_pallas() else f


def square_rand_proof_verify_batched(
    proof: SquareRandProofVec,
    c: SquareRandCommitVec,
    rng: np.random.Generator,
    transcript_label: bytes = b"SquareRandProof",
) -> bool:
    """Batch verify ALL lanes at once (server fast path). Returns a single
    accept/reject — per-lane blame needs the elementwise verifier."""
    n = proof.z_m.shape[1]
    rho = _rand_scalars(3 * n, rng)
    ok = _square_rand_batch_verify_core(transcript_label)(
        pedersen.base_B().table, pedersen.base_H().table,
        c.c.L, c.c.R, c.c_sq,
        proof.c_prime.L, proof.c_prime.R, proof.c_sq_prime,
        proof.z_m, proof.z_r1, proof.z_r2, rho,
    )
    return bool(np.asarray(ok).all())


def square_rand_proof_verify(
    proof: SquareRandProofVec,
    c: SquareRandCommitVec,
    transcript_label: bytes = b"SquareRandProof",
    mesh=None,
) -> jnp.ndarray:
    """Batched verify (square_rand_proof/mod.rs:78-115)."""
    n = proof.z_m.shape[1]
    args = _lane_args(
        mesh, n, c.c.L, c.c.R, c.c_sq,
        proof.c_prime.L, proof.c_prime.R, proof.c_sq_prime,
        proof.z_m, proof.z_r1, proof.z_r2)
    ok = _square_rand_verify_core(transcript_label)(
        pedersen.base_B().table, pedersen.base_H().table, *args,
    )
    return ok[:n] if ok.shape[0] != n else ok


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


@lru_cache(maxsize=None)
def _square_prove_core(label: bytes, has_existing: bool):
    def f(tB, tH, m, r1, r2, m_prime, r1_prime, r2_prime, existing):
        from ..ops import fixed_base

        def ped(v, b):
            return curve.add(fixed_base.mul(tB, v), fixed_base.mul(tH, b))

        c_l = existing if has_existing else ped(m, r1)
        m_sq = sc.mul(m, m)
        c_sq = ped(m_sq, r2)

        c_l_prime = ped(m_prime, r1_prime)
        c_sq_prime = curve.add(
            curve.scalar_mul(c_l, m_prime), fixed_base.mul(tH, r2_prime)
        )

        t = BatchTranscript(label, m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C_eg", field_byte_cols(curve.compress(c_l)))
        t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
        t.append_message(b"C_prime_eg", field_byte_cols(curve.compress(c_l_prime)))
        t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
        challenge = t.challenge_scalars(b"c")

        z_m = sc.add(m_prime, sc.mul(m, challenge))
        z_r1 = sc.add(r1_prime, sc.mul(r1, challenge))
        z_r2 = sc.add(r2_prime, sc.mul(sc.sub(r2, sc.mul(m, r1)), challenge))
        return c_l, c_sq, c_l_prime, c_sq_prime, z_m, z_r1, z_r2

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


def square_proof_prove(
    m: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    rng: np.random.Generator,
    existing: PointArray | None = None,
    transcript_label: bytes = b"SquareProof",
    mesh=None,
) -> tuple[SquareProofVec, SquareCommitVec]:
    """Batched SquareProof::prove(_existing) (square_proof/party.rs)."""
    n = m.shape[1]
    core = _square_prove_core(transcript_label, existing is not None)
    ex = existing if existing is not None else curve.identity((n,))
    args = _lane_args(mesh, n, m, r1, r2, _rand_scalars(n, rng),
                      _rand_scalars(n, rng), _rand_scalars(n, rng), ex)
    c_l, c_sq, c_l_prime, c_sq_prime, z_m, z_r1, z_r2 = core(
        pedersen.base_B().table, pedersen.base_H().table, *args,
    )
    c_l, c_sq, c_l_prime, c_sq_prime, z_m, z_r1, z_r2 = _maybe_slice(
        mesh, n, c_l, c_sq, c_l_prime, c_sq_prime, z_m, z_r1, z_r2)
    return SquareProofVec(c_l_prime, c_sq_prime, z_m, z_r1, z_r2), SquareCommitVec(
        c_l, c_sq
    )


@lru_cache(maxsize=None)
def _square_verify_core(label: bytes):
    def f(tB, tH, c_l, c_sq, c_l_prime, c_sq_prime, z_m, z_r1, z_r2):
        from ..ops import fixed_base

        t = BatchTranscript(label, z_m.shape[1])
        t.append_message(*DOMAIN_SEP)
        t.append_message(b"C_eg", field_byte_cols(curve.compress(c_l)))
        t.append_message(b"C_ped", field_byte_cols(curve.compress(c_sq)))
        t.append_message(b"C_prime_eg", field_byte_cols(curve.compress(c_l_prime)))
        t.append_message(b"C_prime_ped", field_byte_cols(curve.compress(c_sq_prime)))
        challenge = t.challenge_scalars(b"c")

        lhs = curve.add(fixed_base.mul(tB, z_m), fixed_base.mul(tH, z_r1))
        rhs = curve.add(c_l_prime, curve.scalar_mul(c_l, challenge))
        ok1 = curve.eq(lhs, rhs)
        lhs_ped = curve.add(
            curve.scalar_mul(c_l, z_m), fixed_base.mul(tH, z_r2)
        )
        rhs_ped = curve.add(c_sq_prime, curve.scalar_mul(c_sq, challenge))
        return ok1 & curve.eq(lhs_ped, rhs_ped)

    # Fused on TPU: the heavy ops inside are shared Pallas kernels that
    # dedupe across jits, so the fused program is thin XLA glue. Eager on
    # CPU: inlining the jnp limb graphs + transcript into one jit costs
    # minutes of XLA:CPU compile (round-3 measurement: 408 s), while the
    # eager composition reuses each op's own small jit across every
    # Σ-protocol and test.
    return jax.jit(f) if use_pallas() else f


def square_proof_verify(
    proof: SquareProofVec,
    c: SquareCommitVec,
    transcript_label: bytes = b"SquareProof",
    mesh=None,
) -> jnp.ndarray:
    n = proof.z_m.shape[1]
    args = _lane_args(
        mesh, n, c.c_l, c.c_sq, proof.c_l_prime, proof.c_sq_prime,
        proof.z_m, proof.z_r1, proof.z_r2)
    ok = _square_verify_core(transcript_label)(
        pedersen.base_B().table, pedersen.base_H().table, *args,
    )
    return ok[:n] if ok.shape[0] != n else ok
