"""Bincode-compatible (de)serializers — wire parity with the reference.

The reference serializes every crypto object through serde's
`serialize_bytes`, which bincode encodes as a u64 little-endian length
prefix followed by the raw bytes (rofl_crypto/src/serde_vec.rs:5-7 notes
the resulting 40-byte scalars). A `Vec<T>` adds one more u64 count prefix.
Element sizes on the wire:

  Scalar / RistrettoPoint / CompressedRistretto   8 + 32  = 40
  ElGamalPair (L||R compressed)                   8 + 64  = 72
  SquareRandProofCommitments (eg||c_sq)           8 + 96  = 104
  RandProof (C'eg||z_m||z_r)                      8 + 128 = 136
  SquareRandProof (C'eg||C'ped||3 scalars)        8 + 192 = 200
  SquareProof (C'l||C'sq||3 scalars)              8 + 160 = 168
  RangeProof (bulletproofs to_bytes)              8 + variable

All functions are host-side (bytes <-> numpy/PointArray); the arrays they
produce feed the device kernels directly. Mirrors
rofl_crypto/src/serde_vec.rs:9-71 and the custom Serialize impls in
rand_proof/el_gamal.rs:197-204, square_rand_proof/{mod,pedersen}.rs.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..ops import curve, fe, sc
from ..ops.curve import PointArray
from ..spec import scalar as SS
from . import sigma
from .pedersen import ElGamalPairArray
from .range_proof import RangeProof

def _u64(n: int) -> bytes:
    return struct.pack("<Q", n)


def _read_u64(data: bytes, off: int) -> tuple[int, int]:
    return struct.unpack_from("<Q", data, off)[0], off + 8


def _wrap_bytes(raw: bytes) -> bytes:
    """serde serialize_bytes under bincode: u64 LE length + raw."""
    return _u64(len(raw)) + raw


def _iter_bytes_vec(data: bytes) -> list[bytes]:
    """Parse Vec<serialize_bytes-item> → list of raw element bytes."""
    count, off = _read_u64(data, 0)
    out = []
    for _ in range(count):
        ln, off = _read_u64(data, off)
        out.append(data[off:off + ln])
        off += ln
    if off != len(data):
        raise ValueError("trailing bytes in bincode vec")
    return out


def _bytes_vec(items: list[bytes]) -> bytes:
    return _u64(len(items)) + b"".join(_wrap_bytes(x) for x in items)


# -- scalars ------------------------------------------------------------------


def scalar_limbs_to_bytes_list(limbs) -> list[bytes]:
    return [SS.to_bytes(v) for v in sc.unpack_scalars(np.asarray(limbs))]


def serialize_scalar_vec(limbs) -> bytes:
    """(16, N) scalar limbs → bincode Vec<Scalar>."""
    return _bytes_vec(scalar_limbs_to_bytes_list(limbs))


def deserialize_scalar_vec(data: bytes) -> np.ndarray:
    vals = []
    for raw in _iter_bytes_vec(data):
        v = SS.from_canonical_bytes(raw)
        if v is None:
            raise ValueError("non-canonical scalar")
        vals.append(v)
    return sc.pack_scalars(vals)


def serialize_scalar(limb_or_int) -> bytes:
    """Single Scalar → 40-byte bincode blob (serde_vec.rs:5-7)."""
    if isinstance(limb_or_int, int):
        return _wrap_bytes(SS.to_bytes(limb_or_int))
    return _wrap_bytes(scalar_limbs_to_bytes_list(limb_or_int)[0])


def deserialize_scalar(data: bytes) -> int:
    ln, off = _read_u64(data, 0)
    v = SS.from_canonical_bytes(data[off:off + ln])
    if v is None:
        raise ValueError("non-canonical scalar")
    return v


# -- points -------------------------------------------------------------------


def serialize_rp_vec(points: PointArray) -> bytes:
    """PointArray batch → bincode Vec<RistrettoPoint> (compressed wire form)."""
    enc = curve.compress_to_bytes(points)
    return _bytes_vec([enc[i].tobytes() for i in range(enc.shape[0])])


def deserialize_rp_vec(data: bytes) -> PointArray:
    """bincode Vec<RistrettoPoint> → PointArray (validates each encoding)."""
    raws = _iter_bytes_vec(data)
    return decompress_bytes_list(raws)


def serialize_crp_vec(compressed: np.ndarray) -> bytes:
    """(N, 32) uint8 compressed encodings → bincode Vec<CompressedRistretto>."""
    compressed = np.asarray(compressed, dtype=np.uint8).reshape(-1, 32)
    return _bytes_vec([compressed[i].tobytes() for i in range(compressed.shape[0])])


def deserialize_crp_vec(data: bytes) -> np.ndarray:
    raws = _iter_bytes_vec(data)
    out = np.zeros((len(raws), 32), dtype=np.uint8)
    for i, raw in enumerate(raws):
        if len(raw) != 32:
            raise ValueError("bad CompressedRistretto length")
        out[i] = np.frombuffer(raw, dtype=np.uint8)
    return out


def serialize_crp_vec_vec(vecs: list[np.ndarray]) -> bytes:
    return _u64(len(vecs)) + b"".join(serialize_crp_vec(v) for v in vecs)


def deserialize_crp_vec_vec(data: bytes) -> list[np.ndarray]:
    count, off = _read_u64(data, 0)
    out = []
    for _ in range(count):
        n, o2 = _read_u64(data, off)
        end = o2
        for _ in range(n):
            ln, end = _read_u64(data, end)
            end += ln
        out.append(deserialize_crp_vec(data[off:end]))
        off = end
    return out


def decompress_bytes_list(raws: list[bytes]) -> PointArray:
    """List of 32-byte encodings → PointArray; raises on invalid points."""
    arr = np.zeros((len(raws), 32), dtype=np.uint8)
    for i, raw in enumerate(raws):
        if len(raw) != 32:
            raise ValueError("bad point length")
        arr[i] = np.frombuffer(raw, dtype=np.uint8)
    # canonicality of the field encoding (s < p, even) per dalek decompress
    for raw in raws:
        s_int = int.from_bytes(raw, "little")
        if s_int >= (2 ** 255 - 19) or (raw[0] & 1):
            raise ValueError("non-canonical point encoding")
    limbs = jnp.asarray(fe.from_bytes_array(arr))
    pts, valid = curve.decompress(limbs)
    if not bool(np.asarray(valid).all()):
        raise ValueError("invalid ristretto encoding")
    return pts


# -- ElGamal pairs ------------------------------------------------------------


def serialize_eg_pair_vec(pairs: ElGamalPairArray) -> bytes:
    l_enc = curve.compress_to_bytes(pairs.L)
    r_enc = curve.compress_to_bytes(pairs.R)
    return _bytes_vec([
        l_enc[i].tobytes() + r_enc[i].tobytes() for i in range(l_enc.shape[0])
    ])


def deserialize_eg_pair_vec(data: bytes) -> ElGamalPairArray:
    raws = _iter_bytes_vec(data)
    for raw in raws:
        if len(raw) != 64:
            raise ValueError("bad ElGamalPair length")
    return ElGamalPairArray(
        L=decompress_bytes_list([r[:32] for r in raws]),
        R=decompress_bytes_list([r[32:] for r in raws]),
    )


# -- SquareRandProofCommitments (ElGamalPair + c_sq) ---------------------------


def serialize_squaretriple_vec(c: "sigma.SquareRandCommitVec") -> bytes:
    l_enc = curve.compress_to_bytes(c.c.L)
    r_enc = curve.compress_to_bytes(c.c.R)
    s_enc = curve.compress_to_bytes(c.c_sq)
    return _bytes_vec([
        l_enc[i].tobytes() + r_enc[i].tobytes() + s_enc[i].tobytes()
        for i in range(l_enc.shape[0])
    ])


def deserialize_squaretriple_vec(data: bytes) -> "sigma.SquareRandCommitVec":
    raws = _iter_bytes_vec(data)
    for raw in raws:
        if len(raw) != 96:
            raise ValueError("bad SquareRandProofCommitments length")
    return sigma.SquareRandCommitVec(
        c=ElGamalPairArray(
            L=decompress_bytes_list([r[:32] for r in raws]),
            R=decompress_bytes_list([r[32:64] for r in raws]),
        ),
        c_sq=decompress_bytes_list([r[64:] for r in raws]),
    )


# -- RandProof ----------------------------------------------------------------


def serialize_rand_proof_vec(proofs: sigma.RandProofVec) -> bytes:
    """Vec<RandProof>: each C'_L||C'_R||z_m||z_r (rand_proof/mod.rs:87-99)."""
    l_enc = curve.compress_to_bytes(proofs.c_prime.L)
    r_enc = curve.compress_to_bytes(proofs.c_prime.R)
    zm = scalar_limbs_to_bytes_list(proofs.z_m)
    zr = scalar_limbs_to_bytes_list(proofs.z_r)
    return _bytes_vec([
        l_enc[i].tobytes() + r_enc[i].tobytes() + zm[i] + zr[i]
        for i in range(l_enc.shape[0])
    ])


def deserialize_rand_proof_vec(data: bytes) -> sigma.RandProofVec:
    raws = _iter_bytes_vec(data)
    for raw in raws:
        if len(raw) != 128:
            raise ValueError("bad RandProof length")
    zm, zr = [], []
    for raw in raws:
        a = SS.from_canonical_bytes(raw[64:96])
        b = SS.from_canonical_bytes(raw[96:])
        if a is None or b is None:
            raise ValueError("non-canonical RandProof scalars")
        zm.append(a)
        zr.append(b)
    return sigma.RandProofVec(
        c_prime=ElGamalPairArray(
            L=decompress_bytes_list([r[:32] for r in raws]),
            R=decompress_bytes_list([r[32:64] for r in raws]),
        ),
        z_m=jnp.asarray(sc.pack_scalars(zm)),
        z_r=jnp.asarray(sc.pack_scalars(zr)),
    )


# -- SquareRandProof -----------------------------------------------------------


def serialize_square_rand_proof_vec(p: sigma.SquareRandProofVec) -> bytes:
    """Vec<SquareRandProof>: C'eg(64)||C'ped(32)||z_m||z_r1||z_r2."""
    l_enc = curve.compress_to_bytes(p.c_prime.L)
    r_enc = curve.compress_to_bytes(p.c_prime.R)
    s_enc = curve.compress_to_bytes(p.c_sq_prime)
    zm = scalar_limbs_to_bytes_list(p.z_m)
    z1 = scalar_limbs_to_bytes_list(p.z_r1)
    z2 = scalar_limbs_to_bytes_list(p.z_r2)
    return _bytes_vec([
        l_enc[i].tobytes() + r_enc[i].tobytes() + s_enc[i].tobytes()
        + zm[i] + z1[i] + z2[i]
        for i in range(l_enc.shape[0])
    ])


def deserialize_square_rand_proof_vec(data: bytes) -> sigma.SquareRandProofVec:
    raws = _iter_bytes_vec(data)
    for raw in raws:
        if len(raw) != 192:
            raise ValueError("bad SquareRandProof length")
    zs = [[], [], []]
    for raw in raws:
        for j in range(3):
            v = SS.from_canonical_bytes(raw[96 + 32 * j: 128 + 32 * j])
            if v is None:
                raise ValueError("non-canonical scalars")
            zs[j].append(v)
    return sigma.SquareRandProofVec(
        c_prime=ElGamalPairArray(
            L=decompress_bytes_list([r[:32] for r in raws]),
            R=decompress_bytes_list([r[32:64] for r in raws]),
        ),
        c_sq_prime=decompress_bytes_list([r[64:96] for r in raws]),
        z_m=jnp.asarray(sc.pack_scalars(zs[0])),
        z_r1=jnp.asarray(sc.pack_scalars(zs[1])),
        z_r2=jnp.asarray(sc.pack_scalars(zs[2])),
    )


# -- SquareProof ---------------------------------------------------------------


def serialize_square_proof_vec(p: sigma.SquareProofVec) -> bytes:
    l_enc = curve.compress_to_bytes(p.c_l_prime)
    s_enc = curve.compress_to_bytes(p.c_sq_prime)
    zm = scalar_limbs_to_bytes_list(p.z_m)
    z1 = scalar_limbs_to_bytes_list(p.z_r1)
    z2 = scalar_limbs_to_bytes_list(p.z_r2)
    return _bytes_vec([
        l_enc[i].tobytes() + s_enc[i].tobytes() + zm[i] + z1[i] + z2[i]
        for i in range(l_enc.shape[0])
    ])


def deserialize_square_proof_vec(data: bytes) -> sigma.SquareProofVec:
    raws = _iter_bytes_vec(data)
    for raw in raws:
        if len(raw) != 160:
            raise ValueError("bad SquareProof length")
    zs = [[], [], []]
    for raw in raws:
        for j in range(3):
            v = SS.from_canonical_bytes(raw[64 + 32 * j: 96 + 32 * j])
            if v is None:
                raise ValueError("non-canonical scalars")
            zs[j].append(v)
    return sigma.SquareProofVec(
        c_l_prime=decompress_bytes_list([r[:32] for r in raws]),
        c_sq_prime=decompress_bytes_list([r[32:64] for r in raws]),
        z_m=jnp.asarray(sc.pack_scalars(zs[0])),
        z_r1=jnp.asarray(sc.pack_scalars(zs[1])),
        z_r2=jnp.asarray(sc.pack_scalars(zs[2])),
    )


# -- RangeProof ----------------------------------------------------------------


def serialize_range_proof(proof: RangeProof) -> bytes:
    return _wrap_bytes(proof.to_bytes())


def deserialize_range_proof(data: bytes) -> RangeProof:
    ln, off = _read_u64(data, 0)
    return RangeProof.from_bytes(data[off:off + ln])


def serialize_range_proof_vec(proofs: list[RangeProof]) -> bytes:
    return _bytes_vec([p.to_bytes() for p in proofs])


def deserialize_range_proof_vec(data: bytes) -> list[RangeProof]:
    return [RangeProof.from_bytes(raw) for raw in _iter_bytes_vec(data)]
