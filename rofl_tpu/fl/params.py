"""Encrypted-parameter protocol layer — rebuild of rofl_service params.rs.

Five modes (params.rs:27-64, type tags 1-5): Plain, EncRange (per-param
RandProofs + chunked L∞ Bulletproofs), EncL2 (SquareRandProofs + L∞ proofs
+ one L2 sum proof), EncRangeCompressed (one CompressedRandProof), and
EncL2Compressed (compressed + Pedersen-only square proofs).

Serialization is byte-compatible with the reference: fixed-stride
concatenations of 32-byte curve/scalar encodings wrapped in the
length-delimited protobuf envelopes EncRangeData / EncNormData /
EncNormDataCompressed (params.rs:408-458, 513-605), and bincode layout for
Plain (u64 LE count + f32 LE values, params.rs:315-318).

The commitment vectors live as device PointArrays; the accumulator is the
homomorphic ElGamal sum starting from unity() == (B, B) pairs
(params.rs:165-177) with extraction gated on every R == B — i.e. blindings
cancelled (params.rs:126-147, el_gamal.rs:101-103).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..crypto import (
    compressed_rand_proof as CRP,
    l2_range_proof as L2RP,
    pedersen,
    range_proof as RP,
    range_proof_vec as RPV,
    sigma,
)
from ..crypto.fp_codec import FpConfig
from ..crypto.pedersen import ElGamalPairArray
from ..ops import bsgs, curve, fe, sc
from ..ops.curve import PointArray
from ..spec import ristretto as SR
from ..spec import scalar as SS
from ..spec.merlin import Transcript
from . import proto as pb

PLAIN_TYPE = 1
ENC_RANGE_TYPE = 2
ENC_L2_TYPE = 3
ENC_RANGE_COMPRESSED_TYPE = 4
ENC_L2_COMPRESSED_TYPE = 5


@dataclass
class CryptoConfig:
    """Mirror of the CryptoConfig proto (flservice.proto:59-65) plus the
    runtime fixed-point config (a compile-time cargo feature in the
    reference, fp.rs — here runtime, per SURVEY.md §5)."""

    value_range: int = 8
    n_partition: int = 1
    l2_value_range: int = 16
    check_percentage: float = 1.0
    enc_type: int = PLAIN_TYPE
    fp: FpConfig = FpConfig(16, 7)


# -- byte helpers ------------------------------------------------------------


def _points_to_bytes(p: PointArray) -> bytes:
    return curve.compress_to_bytes(p).tobytes()


def _points_from_bytes(data: bytes, stride_offset: int = 0) -> PointArray:
    enc = np.frombuffer(data, np.uint8).reshape(-1, 32)
    pts, valid = curve.decompress(jnp.asarray(fe.from_bytes_array(enc)))
    if not bool(np.all(np.asarray(valid))):
        raise ValueError("invalid point encoding")
    return pts


def _pairs_to_bytes(pairs: ElGamalPairArray) -> bytes:
    L = curve.compress_to_bytes(pairs.L)
    R = curve.compress_to_bytes(pairs.R)
    n = L.shape[0]
    out = np.zeros((n, 64), np.uint8)
    out[:, :32] = L
    out[:, 32:] = R
    return out.tobytes()


def _pairs_from_bytes(data: bytes) -> ElGamalPairArray:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 64)
    flat = np.concatenate([arr[:, :32], arr[:, 32:]])  # L's then R's
    pts = _points_from_bytes(flat.tobytes())
    n = arr.shape[0]
    sl = lambda s: PointArray(pts.x[:, s], pts.y[:, s], pts.z[:, s], pts.t[:, s])
    return ElGamalPairArray(sl(slice(0, n)), sl(slice(n, 2 * n)))


def _scalars_to_bytes(limbs: jnp.ndarray) -> bytes:
    return sc.to_bytes_array(np.asarray(limbs)).tobytes()


def _scalars_from_bytes(data: bytes) -> jnp.ndarray:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 32)
    out = np.zeros((16, arr.shape[0]), np.uint32)
    a = arr.astype(np.uint32)
    for k in range(16):
        out[k] = a[:, 2 * k] | (a[:, 2 * k + 1] << 8)
    return jnp.asarray(out)


def _rand_proofs_to_bytes(p: sigma.RandProofVec) -> bytes:
    """RandProof stride 128: C_prime(64) || Z_m || Z_r (rand_proof/mod.rs:91-97)."""
    cp = np.frombuffer(_pairs_to_bytes(p.c_prime), np.uint8).reshape(-1, 64)
    zm = sc.to_bytes_array(np.asarray(p.z_m))
    zr = sc.to_bytes_array(np.asarray(p.z_r))
    out = np.concatenate([cp, zm, zr], axis=1)
    return out.tobytes()


def _rand_proofs_from_bytes(data: bytes) -> sigma.RandProofVec:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 128)
    c_prime = _pairs_from_bytes(arr[:, :64].tobytes())
    z_m = _scalars_from_bytes(arr[:, 64:96].tobytes())
    z_r = _scalars_from_bytes(arr[:, 96:128].tobytes())
    return sigma.RandProofVec(c_prime, z_m, z_r)


def _sq_rand_proofs_to_bytes(p: sigma.SquareRandProofVec) -> bytes:
    """SquareRandProof stride 192: C_prime(64+32) || Z_m || Z_r1 || Z_r2."""
    cp = np.frombuffer(_pairs_to_bytes(p.c_prime), np.uint8).reshape(-1, 64)
    cs = curve.compress_to_bytes(p.c_sq_prime)
    zm = sc.to_bytes_array(np.asarray(p.z_m))
    z1 = sc.to_bytes_array(np.asarray(p.z_r1))
    z2 = sc.to_bytes_array(np.asarray(p.z_r2))
    return np.concatenate([cp, cs, zm, z1, z2], axis=1).tobytes()


def _sq_rand_proofs_from_bytes(data: bytes) -> sigma.SquareRandProofVec:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 192)
    c_prime = _pairs_from_bytes(arr[:, :64].tobytes())
    c_sq_prime = _points_from_bytes(arr[:, 64:96].tobytes())
    z_m = _scalars_from_bytes(arr[:, 96:128].tobytes())
    z_r1 = _scalars_from_bytes(arr[:, 128:160].tobytes())
    z_r2 = _scalars_from_bytes(arr[:, 160:192].tobytes())
    return sigma.SquareRandProofVec(c_prime, c_sq_prime, z_m, z_r1, z_r2)


def _sq_proofs_to_bytes(p: sigma.SquareProofVec) -> bytes:
    """SquareProof stride 160: C_prime(32+32) || Z_m || Z_r1 || Z_r2."""
    cl = curve.compress_to_bytes(p.c_l_prime)
    cs = curve.compress_to_bytes(p.c_sq_prime)
    zm = sc.to_bytes_array(np.asarray(p.z_m))
    z1 = sc.to_bytes_array(np.asarray(p.z_r1))
    z2 = sc.to_bytes_array(np.asarray(p.z_r2))
    return np.concatenate([cl, cs, zm, z1, z2], axis=1).tobytes()


def _sq_proofs_from_bytes(data: bytes) -> sigma.SquareProofVec:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 160)
    c_l_prime = _points_from_bytes(arr[:, :32].tobytes())
    c_sq_prime = _points_from_bytes(arr[:, 32:64].tobytes())
    z_m = _scalars_from_bytes(arr[:, 64:96].tobytes())
    z_r1 = _scalars_from_bytes(arr[:, 96:128].tobytes())
    z_r2 = _scalars_from_bytes(arr[:, 128:160].tobytes())
    return sigma.SquareProofVec(c_l_prime, c_sq_prime, z_m, z_r1, z_r2)


def _l2_commits_to_bytes(c: sigma.SquareRandCommitVec) -> bytes:
    """SquareRandProofCommitments stride 96: EG pair(64) || c_sq(32)."""
    eg = np.frombuffer(_pairs_to_bytes(c.c), np.uint8).reshape(-1, 64)
    cs = curve.compress_to_bytes(c.c_sq)
    return np.concatenate([eg, cs], axis=1).tobytes()


def _l2_commits_from_bytes(data: bytes) -> sigma.SquareRandCommitVec:
    arr = np.frombuffer(data, np.uint8).reshape(-1, 96)
    eg = _pairs_from_bytes(arr[:, :64].tobytes())
    c_sq = _points_from_bytes(arr[:, 64:96].tobytes())
    return sigma.SquareRandCommitVec(eg, c_sq)


def _spec_points_to_array(points: list) -> PointArray:
    return curve.pack_points(points)


# -- Plain -------------------------------------------------------------------


@dataclass
class PlainParams:
    content: np.ndarray  # float32

    def serialize(self) -> bytes:
        """bincode Vec<f32>: u64 LE length + packed f32 LE."""
        c = np.asarray(self.content, np.float32)
        return len(c).to_bytes(8, "little") + c.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "PlainParams":
        n = int.from_bytes(data[:8], "little")
        return cls(np.frombuffer(data[8:8 + 4 * n], np.float32).copy())


# -- EncRange ----------------------------------------------------------------


@dataclass
class EncParamsRange:
    enc_values: ElGamalPairArray
    rand_proofs: sigma.RandProofVec
    range_proofs: list[RP.RangeProof]
    prove_range: int
    check_percentage: float
    fp: FpConfig

    @classmethod
    def encrypt(cls, plaintext: np.ndarray, blindings: jnp.ndarray,
                cfg: CryptoConfig, rng: np.random.Generator) -> "EncParamsRange":
        """params.rs:468-511: range proofs (possibly on a checked subset),
        then RandProofs reusing the range-proof commitments when full."""
        fp = cfg.fp
        prove_range = cfg.value_range
        clipped = RPV.clip_f32_to_range_vec(plaintext, fp, prove_range)
        blind_limbs = np.asarray(blindings)
        if cfg.check_percentage >= 1.0:
            range_proofs, commits = RPV.create_rangeproof(
                clipped, blind_limbs, fp, prove_range, cfg.n_partition, rng)
            m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(plaintext, np.float32)))
            rand_proofs, enc_values = sigma.rand_proof_prove(
                m, blindings, rng, existing=commits)
        else:
            num = int(round(len(clipped) * cfg.check_percentage))
            range_proofs, _ = RPV.create_rangeproof(
                clipped[:num], blind_limbs[:, :num], fp, prove_range,
                cfg.n_partition, rng)
            m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(plaintext, np.float32)))
            rand_proofs, enc_values = sigma.rand_proof_prove(m, blindings, rng)
        return cls(enc_values, rand_proofs, range_proofs, prove_range,
                   cfg.check_percentage, fp)

    def verify(self, rng: np.random.Generator, mesh=None) -> bool:
        # Σ verify runs WITHOUT lane sharding here: the server calls this
        # from its verification thread pool, and eager sharded dispatch
        # off the main thread aborts in XLA (the mesh path is exercised
        # directly by tests/test_parallel_mesh.py); the mesh still routes
        # the range-proof mega-MSM below
        ok_rand = bool(np.all(np.asarray(
            sigma.rand_proof_verify(self.rand_proofs, self.enc_values))))
        if not ok_rand:
            return False
        num = int(round(self.enc_values.L.batch_shape[0] * self.check_percentage))
        pts = PointArray(
            self.enc_values.L.x[:, :num], self.enc_values.L.y[:, :num],
            self.enc_values.L.z[:, :num], self.enc_values.L.t[:, :num])
        return RPV.verify_rangeproof(self.range_proofs, pts, self.fp,
                                     self.prove_range, rng, mesh=mesh)

    def serialize(self) -> bytes:
        msg = pb.EncRangeData(
            enc_values=_pairs_to_bytes(self.enc_values),
            rand_proof=_rand_proofs_to_bytes(self.rand_proofs),
            range_bits=self.prove_range,
            check_percentage=self.check_percentage,
        )
        msg.range_proof.extend(p.to_bytes() for p in self.range_proofs)
        return pb.encode_length_delimited(msg)

    @classmethod
    def deserialize(cls, data: bytes, fp: FpConfig) -> "EncParamsRange":
        msg = pb.decode_length_delimited(pb.EncRangeData, data)
        return cls(
            _pairs_from_bytes(msg.enc_values),
            _rand_proofs_from_bytes(msg.rand_proof),
            [RP.RangeProof.from_bytes(b) for b in msg.range_proof],
            msg.range_bits,
            msg.check_percentage,
            fp,
        )


# -- EncL2 -------------------------------------------------------------------


@dataclass
class EncParamsL2:
    enc_values: sigma.SquareRandCommitVec
    square_proofs: sigma.SquareRandProofVec
    range_proofs: list[RP.RangeProof]
    square_range_proof: RP.RangeProof
    prove_range: int
    l2_prove_range: int
    fp: FpConfig

    @classmethod
    def encrypt(cls, plaintext: np.ndarray, blindings: jnp.ndarray,
                cfg: CryptoConfig, rng: np.random.Generator) -> "EncParamsL2":
        """params.rs:607-658."""
        fp = cfg.fp
        prove_range = cfg.value_range
        clipped = RPV.clip_f32_to_range_vec(plaintext, fp, prove_range)
        r2 = jnp.asarray(pedersen.rnd_scalar_limbs(len(clipped), rng))
        range_proofs, commits = RPV.create_rangeproof(
            clipped, np.asarray(blindings), fp, prove_range,
            cfg.n_partition, rng)
        square_range_proof, _sum_cm = L2RP.create_rangeproof_l2(
            clipped, r2, fp, cfg.l2_value_range, rng)
        m = jnp.asarray(fp.f32_to_scalar_limbs(clipped))
        square_proofs, enc_values = sigma.square_rand_proof_prove(
            m, blindings, r2, rng, existing=commits)
        return cls(enc_values, square_proofs, range_proofs, square_range_proof,
                   prove_range, cfg.l2_value_range, fp)

    def verify(self, rng: np.random.Generator, mesh=None) -> bool:
        from ..crypto.range_proof import _tick
        _tick(None)
        # randomized batch verification: one 6N-term MSM instead of ~4N
        # per-lane ladders (sigma.py; per-lane blame not needed on the
        # accept path). No lane sharding here — this runs on the server's
        # verification thread pool (see EncParamsRange.verify note).
        ok_sq = sigma.square_rand_proof_verify_batched(
            self.square_proofs, self.enc_values, rng)
        _tick("L2 verify: squarerand sigma")
        if not ok_sq:
            return False
        if not RPV.verify_rangeproof(self.range_proofs, self.enc_values.c.L,
                                     self.fp, self.prove_range, rng,
                                     mesh=mesh):
            return False
        _tick("L2 verify: rangeproof batch")
        c_sq_sum = curve.tree_sum(self.enc_values.c_sq)
        sum_pt = curve.unpack_points(c_sq_sum)[0]
        ok = L2RP.verify_rangeproof_l2(self.square_range_proof, sum_pt,
                                       self.l2_prove_range, rng)
        _tick("L2 verify: l2 sum proof")
        return ok

    def serialize(self) -> bytes:
        msg = pb.EncNormData(
            enc_values=_l2_commits_to_bytes(self.enc_values),
            square_proof=_sq_rand_proofs_to_bytes(self.square_proofs),
            square_range_proof=self.square_range_proof.to_bytes(),
            range_bits=self.prove_range,
            l2_range_bits=self.l2_prove_range,
        )
        msg.range_proof.extend(p.to_bytes() for p in self.range_proofs)
        return pb.encode_length_delimited(msg)

    @classmethod
    def deserialize(cls, data: bytes, fp: FpConfig) -> "EncParamsL2":
        msg = pb.decode_length_delimited(pb.EncNormData, data)
        return cls(
            _l2_commits_from_bytes(msg.enc_values),
            _sq_rand_proofs_from_bytes(msg.square_proof),
            [RP.RangeProof.from_bytes(b) for b in msg.range_proof],
            RP.RangeProof.from_bytes(msg.square_range_proof),
            msg.range_bits,
            msg.l2_range_bits,
            fp,
        )


# -- EncRangeCompressed ------------------------------------------------------


@dataclass
class EncParamsRangeCompressed:
    enc_values: ElGamalPairArray
    rand_proof: CRP.CompressedRandProof
    range_proofs: list[RP.RangeProof]
    prove_range: int
    check_percentage: float
    fp: FpConfig

    @classmethod
    def encrypt(cls, plaintext: np.ndarray, blindings: jnp.ndarray,
                cfg: CryptoConfig, rng: np.random.Generator):
        """params.rs:697-744."""
        fp = cfg.fp
        prove_range = cfg.value_range
        clipped = RPV.clip_f32_to_range_vec(plaintext, fp, prove_range)
        blind_limbs = np.asarray(blindings)
        m = jnp.asarray(fp.f32_to_scalar_limbs(np.asarray(plaintext, np.float32)))
        if cfg.check_percentage >= 1.0:
            range_proofs, commits = RPV.create_rangeproof(
                clipped, blind_limbs, fp, prove_range, cfg.n_partition, rng)
            t = Transcript(b"CompressedRandProof")
            rand_proof, enc_values = CRP.prove(
                t, m, blindings, rng, existing=commits)
        else:
            num = int(round(len(clipped) * cfg.check_percentage))
            range_proofs, _ = RPV.create_rangeproof(
                clipped[:num], blind_limbs[:, :num], fp, prove_range,
                cfg.n_partition, rng)
            t = Transcript(b"CompressedRandProof")
            rand_proof, enc_values = CRP.prove(t, m, blindings, rng)
        return cls(enc_values, rand_proof, range_proofs, prove_range,
                   cfg.check_percentage, fp)

    def verify(self, rng: np.random.Generator, mesh=None) -> bool:
        t = Transcript(b"CompressedRandProof")
        if not CRP.verify(t, self.rand_proof, self.enc_values):
            return False
        num = int(round(self.enc_values.L.batch_shape[0] * self.check_percentage))
        pts = PointArray(
            self.enc_values.L.x[:, :num], self.enc_values.L.y[:, :num],
            self.enc_values.L.z[:, :num], self.enc_values.L.t[:, :num])
        return RPV.verify_rangeproof(self.range_proofs, pts, self.fp,
                                     self.prove_range, rng, mesh=mesh)

    def serialize(self) -> bytes:
        msg = pb.EncRangeData(
            enc_values=_pairs_to_bytes(self.enc_values),
            rand_proof=self.rand_proof.to_bytes(),
            range_bits=self.prove_range,
            check_percentage=self.check_percentage,
        )
        msg.range_proof.extend(p.to_bytes() for p in self.range_proofs)
        return pb.encode_length_delimited(msg)

    @classmethod
    def deserialize(cls, data: bytes, fp: FpConfig):
        msg = pb.decode_length_delimited(pb.EncRangeData, data)
        return cls(
            _pairs_from_bytes(msg.enc_values),
            CRP.CompressedRandProof.from_bytes(msg.rand_proof),
            [RP.RangeProof.from_bytes(b) for b in msg.range_proof],
            msg.range_bits,
            msg.check_percentage,
            fp,
        )


# -- EncL2Compressed ---------------------------------------------------------


@dataclass
class EncParamsL2Compressed:
    enc_values: sigma.SquareRandCommitVec  # EG pairs + c_sq (merged view)
    square_proofs: sigma.SquareProofVec
    rand_proof: CRP.CompressedRandProof
    range_proofs: list[RP.RangeProof]
    square_range_proof: RP.RangeProof
    prove_range: int
    l2_prove_range: int
    fp: FpConfig

    @classmethod
    def encrypt(cls, plaintext: np.ndarray, blindings: jnp.ndarray,
                cfg: CryptoConfig, rng: np.random.Generator):
        """params.rs:798-846."""
        fp = cfg.fp
        prove_range = cfg.value_range
        clipped = RPV.clip_f32_to_range_vec(plaintext, fp, prove_range)
        r2 = jnp.asarray(pedersen.rnd_scalar_limbs(len(clipped), rng))
        range_proofs, commits = RPV.create_rangeproof(
            clipped, np.asarray(blindings), fp, prove_range,
            cfg.n_partition, rng)
        square_range_proof, _ = L2RP.create_rangeproof_l2(
            clipped, r2, fp, cfg.l2_value_range, rng)
        m = jnp.asarray(fp.f32_to_scalar_limbs(clipped))
        existing = commits
        t = Transcript(b"CompressedRandProof")
        rand_proof, eg_pairs = CRP.prove(t, m, blindings, rng, existing=existing)
        square_proofs, sq_commits = sigma.square_proof_prove(
            m, blindings, r2, rng, existing=existing)
        merged = sigma.SquareRandCommitVec(eg_pairs, sq_commits.c_sq)
        return cls(merged, square_proofs, rand_proof, range_proofs,
                   square_range_proof, prove_range, cfg.l2_value_range, fp)

    def verify(self, rng: np.random.Generator, mesh=None) -> bool:
        sq_c = sigma.SquareCommitVec(self.enc_values.c.L, self.enc_values.c_sq)
        if not bool(np.all(np.asarray(
                sigma.square_proof_verify(self.square_proofs, sq_c)))):
            return False
        t = Transcript(b"CompressedRandProof")
        if not CRP.verify(t, self.rand_proof, self.enc_values.c):
            return False
        if not RPV.verify_rangeproof(self.range_proofs, self.enc_values.c.L,
                                     self.fp, self.prove_range, rng,
                                     mesh=mesh):
            return False
        sum_pt = curve.unpack_points(curve.tree_sum(self.enc_values.c_sq))[0]
        return L2RP.verify_rangeproof_l2(self.square_range_proof, sum_pt,
                                         self.l2_prove_range, rng)

    def serialize(self) -> bytes:
        msg = pb.EncNormDataCompressed(
            enc_values=_l2_commits_to_bytes(self.enc_values),
            square_proof=_sq_proofs_to_bytes(self.square_proofs),
            rand_proof=self.rand_proof.to_bytes(),
            square_range_proof=self.square_range_proof.to_bytes(),
            range_bits=self.prove_range,
            l2_range_bits=self.l2_prove_range,
        )
        msg.range_proof.extend(p.to_bytes() for p in self.range_proofs)
        return pb.encode_length_delimited(msg)

    @classmethod
    def deserialize(cls, data: bytes, fp: FpConfig):
        msg = pb.decode_length_delimited(pb.EncNormDataCompressed, data)
        return cls(
            _l2_commits_from_bytes(msg.enc_values),
            _sq_proofs_from_bytes(msg.square_proof),
            CRP.CompressedRandProof.from_bytes(msg.rand_proof),
            [RP.RangeProof.from_bytes(b) for b in msg.range_proof],
            RP.RangeProof.from_bytes(msg.square_range_proof),
            msg.range_bits,
            msg.l2_range_bits,
            fp,
        )


# -- dispatch ----------------------------------------------------------------

_MODE_CLASSES = {
    ENC_RANGE_TYPE: EncParamsRange,
    ENC_L2_TYPE: EncParamsL2,
    ENC_RANGE_COMPRESSED_TYPE: EncParamsRangeCompressed,
    ENC_L2_COMPRESSED_TYPE: EncParamsL2Compressed,
}


def encrypt(enc_type: int, plaintext: np.ndarray, blindings, cfg: CryptoConfig,
            rng: np.random.Generator):
    """EncModelParams::encrypt dispatch (params.rs:356-405)."""
    if enc_type == PLAIN_TYPE:
        return PlainParams(np.asarray(plaintext, np.float32))
    return _MODE_CLASSES[enc_type].encrypt(plaintext, blindings, cfg, rng)


def deserialize(enc_type: int, data: bytes, fp: FpConfig):
    """EncModelParams::deserialize dispatch (params.rs:334-354)."""
    if enc_type == PLAIN_TYPE:
        return PlainParams.deserialize(data)
    return _MODE_CLASSES[enc_type].deserialize(data, fp)


def verify(params, rng: np.random.Generator, mesh=None) -> bool:
    """EncModelParams::verify (params.rs:181-291); Plain is trivially true.

    mesh: optional jax Mesh — the range-proof verification mega-MSM shards
    its terms over the 'param' axis (the reference's rayon verification
    pool becomes device parallelism, SURVEY.md §2.5 P3/P7)."""
    if isinstance(params, PlainParams):
        return True
    return params.verify(rng, mesh=mesh)


def enc_pairs_of(params) -> ElGamalPairArray | None:
    if isinstance(params, (EncParamsRange, EncParamsRangeCompressed)):
        return params.enc_values
    if isinstance(params, (EncParamsL2, EncParamsL2Compressed)):
        return params.enc_values.c
    return None


# -- accumulator -------------------------------------------------------------


class Accumulator:
    """EncModelParamsAccumulator (params.rs:80-148): starts from unity()
    pairs (B, B) and homomorphically adds client vectors; extraction checks
    every R == B (blindings cancelled) then solves BSGS on the L's."""

    def __init__(self, enc_type: int, size: int, fp: FpConfig,
                 bsgs_m: int | None = None):
        self.enc_type = enc_type
        self.size = size
        self.fp = fp
        self.bsgs_m = bsgs_m or (1 << (fp.n_bits // 2 + 8))
        if enc_type == PLAIN_TYPE:
            self.plain = np.zeros(size, np.float32)
            self.pairs = None
        else:
            bp = curve.basepoint((1,))
            unity = PointArray(*[jnp.broadcast_to(c, (16, size)) for c in bp])
            self.pairs = ElGamalPairArray(unity, unity)
            self.plain = None

    def accumulate(self, params) -> bool:
        if self.enc_type == PLAIN_TYPE:
            if not isinstance(params, PlainParams) or len(params.content) != self.size:
                return False
            self.plain += params.content
            return True
        pairs = enc_pairs_of(params)
        if pairs is None or pairs.L.batch_shape[0] != self.size:
            return False
        self.pairs = pedersen.add_pairs(self.pairs, pairs)
        return True

    def extract(self) -> np.ndarray | None:
        if self.enc_type == PLAIN_TYPE:
            return self.plain.copy()
        if not bool(np.all(np.asarray(
                pedersen.right_elem_is_unity(self.pairs)))):
            return None
        vals, ok = bsgs.solve_discrete_log(
            self.pairs.L, m=self.bsgs_m, n_bits=self.fp.n_bits)
        if not bool(np.all(np.asarray(ok))):
            return None
        return self.fp.scalar_limbs_to_f32(np.asarray(vals))
