"""Aggregated Bulletproofs range proofs + inner-product argument.

Protocol-compatible rebuild of the `bulletproofs 4.0` crate used by the
reference (rofl_crypto/Cargo.toml:27; driven from range_proof_vec/mod.rs and
l2_range_proof_vec/mod.rs). The MPC dealer/party structure collapses into a
single prover whose vector phases are batched device kernels:

  * bit decomposition, l/r polynomial vectors, t-poly inner products →
    rofl_tpu.ops.sc batches (VPU, mod-l limb arithmetic)
  * A/S/T commitments and IPA L/R points → rofl_tpu.ops.msm
  * generators G_i/H_i → SHAKE-256 XOF (host) + batched Elligator (device)
  * Fiat-Shamir transcript → host spec.merlin (ONE transcript per proof,
    unlike the per-element Σ-protocols which use the batched transcript)

Transcript schedule (bulletproofs transcript.rs, dealer.rs, verification in
range_proof/mod.rs): rangeproof_domain_sep(n, m); "V"*m; "A"; "S"; y; z;
"T_1"; "T_2"; x; "t_x"; "t_x_blinding"; "e_blinding"; w; then ipp:
innerproduct_domain_sep(nm); per round "L","R", u.

Verification is the single random-linear-combination mega-MSM of
verify_multiple (c = random combiner), evaluated on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops import curve, fe, msm, sc
from ..ops.curve import PointArray
from ..spec import generators as G
from ..spec import ristretto as SR
from ..spec import scalar as SS
from ..spec.merlin import Transcript
from . import pedersen

IDENTITY_BYTES = bytes(32)

_TIMING = bool(int(__import__("os").environ.get("ROFL_TIMING", "0")))


def _tick(label, ref=[None]):
    if not _TIMING:
        return
    import time as _t

    now = _t.time()
    if ref[0] is not None:
        print(f"      [rp] {label}: +{now - ref[0]:.3f}s", flush=True)
    ref[0] = now


def _tick_sync(label, *arrays):
    """Timing tick that first forces device completion via a tiny host
    transfer (block_until_ready does not wait through the axon tunnel),
    so per-phase device time attributes to the right phase."""
    if not _TIMING:
        return
    for a in arrays:
        if hasattr(a, "x"):
            a = a.x
        np.asarray(a[..., :1])
    _tick(label)


# -- generators --------------------------------------------------------------


@lru_cache(maxsize=16)
def device_bp_gens(n: int, m: int) -> tuple[PointArray, PointArray]:
    """BulletproofGens(n, m) shares concatenated party-major, as device
    points: host SHAKE-256 streams + batched Elligator map."""
    g_blobs = []
    h_blobs = []
    for j in range(m):
        gb, hb = G.bp_gens_uniform_bytes(n, j)
        g_blobs.append(np.frombuffer(gb, np.uint8).reshape(n, 64))
        h_blobs.append(np.frombuffer(hb, np.uint8).reshape(n, 64))
    g_bytes = np.concatenate(g_blobs)
    h_bytes = np.concatenate(h_blobs)
    return curve.from_uniform_bytes(g_bytes), curve.from_uniform_bytes(h_bytes)


def _point_slice(p: PointArray, sl) -> PointArray:
    return PointArray(p.x[:, sl], p.y[:, sl], p.z[:, sl], p.t[:, sl])


def _point_concat(a: PointArray, b: PointArray) -> PointArray:
    return PointArray(
        jnp.concatenate([a.x, b.x], axis=1),
        jnp.concatenate([a.y, b.y], axis=1),
        jnp.concatenate([a.z, b.z], axis=1),
        jnp.concatenate([a.t, b.t], axis=1),
    )


def _compress_bytes(p: PointArray) -> list[bytes]:
    return [bytes(row) for row in curve.compress_to_bytes(p)]


def _append_point(t: Transcript, label: bytes, pt_bytes: bytes):
    t.append_message(label, pt_bytes)


def _validate_and_append(t: Transcript, label: bytes, pt_bytes: bytes) -> bool:
    """bulletproofs TranscriptProtocol::validate_and_append_point: reject the
    identity encoding."""
    if pt_bytes == IDENTITY_BYTES:
        return False
    t.append_message(label, pt_bytes)
    return True


def _const(x: int) -> jnp.ndarray:
    return jnp.asarray(sc.pack_scalars([x]))


# -- proof container ---------------------------------------------------------


@dataclass
class InnerProductProof:
    L: list[bytes]
    R: list[bytes]
    a: int
    b: int

    def to_bytes(self) -> bytes:
        out = b"".join(l + r for l, r in zip(self.L, self.R))
        return out + SS.to_bytes(self.a) + SS.to_bytes(self.b)


@dataclass
class RangeProof:
    """Mirror of bulletproofs::RangeProof (serialization: A,S,T_1,T_2,
    t_x, t_x_blinding, e_blinding, then ipp L_i,R_i interleaved? — dalek
    to_bytes: A,S,T_1,T_2,t_x,t_x_blinding,e_blinding,ipp_proof)."""

    A: bytes
    S: bytes
    T_1: bytes
    T_2: bytes
    t_x: int
    t_x_blinding: int
    e_blinding: int
    ipp: InnerProductProof

    def to_bytes(self) -> bytes:
        return (
            self.A + self.S + self.T_1 + self.T_2
            + SS.to_bytes(self.t_x)
            + SS.to_bytes(self.t_x_blinding)
            + SS.to_bytes(self.e_blinding)
            + self.ipp.to_bytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "RangeProof":
        if len(data) < 7 * 32 or len(data) % 32 != 0:
            raise ValueError("malformed RangeProof")
        head = [data[i * 32:(i + 1) * 32] for i in range(7)]
        rest = data[7 * 32:]
        n_pts = len(rest) // 32 - 2
        if n_pts < 0 or n_pts % 2:
            raise ValueError("malformed ipp")
        k = n_pts // 2
        L = [rest[i * 64: i * 64 + 32] for i in range(k)]
        R = [rest[i * 64 + 32: i * 64 + 64] for i in range(k)]
        a = SS.from_canonical_bytes(rest[-64:-32])
        b = SS.from_canonical_bytes(rest[-32:])
        if a is None or b is None:
            raise ValueError("non-canonical ipp scalars")
        tx = SS.from_canonical_bytes(head[4])
        txb = SS.from_canonical_bytes(head[5])
        eb = SS.from_canonical_bytes(head[6])
        if tx is None or txb is None or eb is None:
            raise ValueError("non-canonical scalars")
        return cls(head[0], head[1], head[2], head[3], tx, txb, eb,
                   InnerProductProof(L, R, a, b))


# -- prover ------------------------------------------------------------------


def prove_multiple(
    transcript: Transcript,
    values: list[int],
    blindings: list[int],
    n: int,
    rng: np.random.Generator,
) -> tuple[RangeProof, list[bytes], PointArray]:
    """RangeProof::prove_multiple (range_proof/mod.rs + party/dealer).

    values: non-negative ints < 2^n (the shifted fixed-point values,
    range_proof_vec/mod.rs:36-43); blindings: scalars. m = len(values) must
    be a power of two (range_proof_vec pads, mod.rs:46-51).

    Returns (proof, V_bytes, V_points) — the V commitments both as
    compressed bytes (transcript/wire) and as the device PointArray so
    callers can un-shift/aggregate without a host decompress round-trip.
    """
    m = len(values)
    assert m & (m - 1) == 0, "m must be a power of two"
    nm = n * m
    lg_nm = nm.bit_length() - 1
    gens_G, gens_H = device_bp_gens(n, m)

    _tick(None)
    transcript.append_message(b"dom-sep", b"rangeproof v1")
    transcript.append_u64(b"n", n)
    transcript.append_u64(b"m", m)

    # V commitments (per party): B^v · H^gamma
    v_limbs = jnp.asarray(sc.pack_scalars(values))
    gamma_limbs = jnp.asarray(sc.pack_scalars(blindings))
    V = pedersen.pedersen_commit(v_limbs, gamma_limbs)
    V_bytes = _compress_bytes(V)
    _tick("V commit+compress")
    for vb in V_bytes:
        _append_point(transcript, b"V", vb)

    # bit vectors over the concatenated nm indices (vectorized host side)
    vals_np = np.array([int(v) for v in values], dtype=np.uint64)
    bits_np = ((vals_np[:, None] >> np.arange(n, dtype=np.uint64)) & 1
               ).ravel().astype(np.uint32)
    bits = jnp.asarray(bits_np)
    a_L = jnp.zeros((16, nm), jnp.uint32).at[0].set(bits)
    ones = jnp.asarray(sc.pack_scalars([1] * nm))
    a_R = sc.sub(a_L, ones)

    # A = B_blinding^a_blinding + Σ (bit ? G_i : -H_i)
    a_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    terms = curve.select(bits == 1, gens_G, curve.neg(gens_H))
    A_pt = curve.add(
        pedersen.base_H().mul(_const(a_blinding)), curve.tree_sum(terms)
    )
    # S = B_blinding^s_blinding + <s_L, G> + <s_R, H>
    s_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    s_L = jnp.asarray(pedersen.rnd_scalar_limbs(nm, rng))
    s_R = jnp.asarray(pedersen.rnd_scalar_limbs(nm, rng))
    S_pt = curve.add(
        pedersen.base_H().mul(_const(s_blinding)),
        curve.add(msm.msm(gens_G, s_L), msm.msm(gens_H, s_R)),
    )
    _tick("A+S points")
    A_bytes = _compress_bytes(A_pt)[0]
    S_bytes = _compress_bytes(S_pt)[0]
    _tick("A/S compress")
    _append_point(transcript, b"A", A_bytes)
    _append_point(transcript, b"S", S_bytes)

    y = transcript.challenge_scalar(b"y")
    z = transcript.challenge_scalar(b"z")
    zz = (z * z) % SS.L

    # vectors: exp_y[k]=y^k; zz2[k]=z^2·z^j·2^i for k=j·n+i (device powers,
    # not an nm-long host bigint loop)
    exp_y = sc.powers(_const(y), nm)
    zz2 = _zz2_vec(n, m, z, zz)
    z_vec = jnp.broadcast_to(_const(z), (16, nm))

    l0 = sc.sub(a_L, z_vec)
    l1 = s_L
    r0 = sc.add(sc.mul(exp_y, sc.add(a_R, z_vec)), zz2)
    r1 = sc.mul(exp_y, s_R)

    t0 = sc.inner_product(l0, r0, axis=0)
    t2 = sc.inner_product(l1, r1, axis=0)
    t1_full = sc.inner_product(sc.add(l0, l1), sc.add(r0, r1), axis=0)
    _tick("t-poly device")
    t0_i, t2_i, t1f_i = (
        sc.unpack_scalars(np.asarray(t0))[0],
        sc.unpack_scalars(np.asarray(t2))[0],
        sc.unpack_scalars(np.asarray(t1_full))[0],
    )
    t1_i = (t1f_i - t0_i - t2_i) % SS.L

    _tick("t sync")
    t_1_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    t_2_blinding = int(sc.unpack_scalars(pedersen.rnd_scalar_limbs(1, rng))[0])
    T = pedersen.pedersen_commit(
        jnp.asarray(sc.pack_scalars([t1_i, t2_i])),
        jnp.asarray(sc.pack_scalars([t_1_blinding, t_2_blinding])),
    )
    T_bytes = _compress_bytes(T)
    _append_point(transcript, b"T_1", T_bytes[0])
    _append_point(transcript, b"T_2", T_bytes[1])

    x = transcript.challenge_scalar(b"x")

    t_x = (t0_i + t1_i * x + t2_i * x * x) % SS.L
    t_x_blinding = (
        sum(zz * pow(z, j, SS.L) * blindings[j] for j in range(m))
        + x * t_1_blinding + x * x * t_2_blinding
    ) % SS.L
    e_blinding = (a_blinding + x * s_blinding) % SS.L

    transcript.append_message(b"t_x", SS.to_bytes(t_x))
    transcript.append_message(b"t_x_blinding", SS.to_bytes(t_x_blinding))
    transcript.append_message(b"e_blinding", SS.to_bytes(e_blinding))

    w = transcript.challenge_scalar(b"w")
    Q = curve.pack_points([SR.BASEPOINT.scalar_mul(w)])

    l_vec = sc.add(l0, sc.mul(l1, _const(x)))
    r_vec = sc.add(r0, sc.mul(r1, _const(x)))

    # H_factors y^-i are NOT multiplied into the H points (dalek scales the
    # bases; a 256-bit ladder per lane). They ride along as pending scalar
    # factors inside _ipp_create and only ever touch the (cheap) mod-l
    # scalar vectors — the group outputs are bit-identical.
    y_inv = pow(y, SS.L - 2, SS.L)

    _tick("T/x/lr vectors")
    ipp = _ipp_create(transcript, Q, gens_G, gens_H, l_vec, r_vec, nm, y_inv)
    _tick("ipp total")

    proof = RangeProof(
        A_bytes, S_bytes, T_bytes[0], T_bytes[1], t_x, t_x_blinding,
        e_blinding, ipp,
    )
    return proof, V_bytes, V


def _consts(xs: list[int]) -> jnp.ndarray:
    return jnp.asarray(sc.pack_scalars(xs))


def _u64_to_limbs(vals: np.ndarray) -> np.ndarray:
    """(N,) uint64 (< l, here < 2^64) → (16, N) uint32 limb scalars,
    vectorized (no host bigints)."""
    vals = np.asarray(vals, dtype=np.uint64)
    out = np.zeros((16, vals.shape[0]), dtype=np.uint32)
    for k in range(4):
        out[k] = ((vals >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(
            np.uint32)
    return out


def _tile_points(p: PointArray, g: int) -> PointArray:
    return PointArray(*[jnp.tile(c, (1, g)) for c in p])


def _p3(p: PointArray, G: int, s: int) -> PointArray:
    return PointArray(*[c.reshape(16, G, s) for c in p])


def _pflat(p: PointArray) -> PointArray:
    return PointArray(*[c.reshape(16, -1) for c in p])


def _pslice3(p: PointArray, sl) -> PointArray:
    return PointArray(*[c[:, :, sl] for c in p])


def _pconcat3(a: PointArray, b: PointArray) -> PointArray:
    return PointArray(*[
        jnp.concatenate([x, y], axis=2) for x, y in zip(a, b)
    ])


def _msm_grouped(points, scalars, group, mesh=None):
    """Per-chunk MSM — mesh-routed over 'param' when a mesh is given
    (prove-path sharding, VERDICT r3 item 4: chunks distribute across
    devices with no collectives, like the reference's rayon chunk pool)."""
    if mesh is not None:
        from ..parallel import mesh as pmesh

        return pmesh.sharded_msm_grouped(mesh, points, scalars, group)
    return msm.msm_grouped(points, scalars, group)


def _tree_sum_groups(p, group, mesh=None):
    if mesh is not None:
        from ..parallel import mesh as pmesh

        return pmesh.sharded_tree_sum_groups(mesh, p, group)
    return curve.tree_sum_groups(p, group)


def prove_multiple_batch(
    transcripts: list[Transcript],
    values_chunks: np.ndarray,
    blind_limbs,
    n: int,
    rng: np.random.Generator,
    mesh=None,
) -> tuple[list[RangeProof], list[list[bytes]], PointArray]:
    """All n_partition chunks proved in ONE device flow.

    The reference proves chunks in parallel rayon tasks
    (range_proof_vec/mod.rs:53-78); the TPU-native equivalent batches the
    chunk axis into the lanes: every per-round op (inner products, L/R
    MSMs, basis folds) runs once over (G · n_k) lanes with group-local
    reductions, so device dispatches per IPA round drop ~G-fold and the
    small late rounds keep full VPU occupancy. Each chunk still has its
    own Merlin transcript (host) and its own challenges; the emitted
    proofs are protocol-identical to sequential prove_multiple calls.

    values_chunks: (G, m) uint64 array of shifted in-range values;
    blind_limbs: (16, G·m) uint32 scalar limbs (device-friendly — no
    per-element host bigints anywhere on this path).

    Requires G power-of-two (group reductions) — callers fall back to the
    sequential path otherwise.
    """
    _tick(None)
    values_chunks = np.asarray(values_chunks, dtype=np.uint64)
    G_n, m = values_chunks.shape
    nm = n * m
    L = G_n * nm
    gens_G, gens_H = device_bp_gens(n, m)
    gens_G_t = _tile_points(gens_G, G_n)
    gens_H_t = _tile_points(gens_H, G_n)

    # V commitments, all chunks at once
    all_vals = values_chunks.reshape(-1)
    v_limbs = jnp.asarray(_u64_to_limbs(all_vals))
    gamma_limbs = jnp.asarray(blind_limbs)
    V = pedersen.pedersen_commit(v_limbs, gamma_limbs)
    _tick_sync("batch V commit", V)
    V_bytes_all = _compress_bytes(V)
    _tick("batch V commit+compress")
    V_chunks = [V_bytes_all[g * m:(g + 1) * m] for g in range(G_n)]
    # the 2·G_n·m host STROBE absorbs (~1.6 s at nm=2^19) run AFTER the
    # A/S device work is dispatched, hiding behind the S MSM — see below

    # bit vectors
    bits_np = ((all_vals[:, None] >> np.arange(n, dtype=np.uint64)) & 1
               ).ravel().astype(np.uint32)
    bits = jnp.asarray(bits_np)
    a_L = jnp.zeros((16, L), jnp.uint32).at[0].set(bits)
    one_vec = jnp.zeros((16, 1), jnp.uint32).at[0, 0].set(1)
    a_R = sc.sub(a_L, jnp.broadcast_to(one_vec, (16, L)))

    # A_g = H^a_blind_g + Σ_g-group (bit ? G_i : -H_i)
    a_blind = pedersen.rnd_scalar_limbs(G_n, rng)
    terms = curve.select(bits == 1, gens_G_t, curve.neg(gens_H_t))
    A_pt = curve.add(pedersen.base_H().mul(jnp.asarray(a_blind)),
                     _tree_sum_groups(terms, nm, mesh))
    _tick_sync("batch A term", A_pt)

    # S_g = H^s_blind_g + <s_L, G> + <s_R, H> (per group)
    s_blind = pedersen.rnd_scalar_limbs(G_n, rng)
    s_L = jnp.asarray(pedersen.rnd_scalar_limbs(L, rng)).reshape(16, G_n, nm)
    s_R = jnp.asarray(pedersen.rnd_scalar_limbs(L, rng)).reshape(16, G_n, nm)
    _tick("batch s_L/s_R host rnd")
    bases_GH = _tile_points(
        PointArray(*[jnp.concatenate([g, h], axis=1)
                     for g, h in zip(gens_G, gens_H)]), G_n)
    s_cat = jnp.concatenate([s_L, s_R], axis=2).reshape(16, 2 * L)
    S_pt = curve.add(
        pedersen.base_H().mul(jnp.asarray(s_blind)),
        _msm_grouped(bases_GH, s_cat, 2 * nm, mesh))
    del terms, bases_GH, s_cat  # drop dead device buffers (HBM pressure)

    # host Merlin V absorbs overlap the dispatched A/S device work
    for t, vbs in zip(transcripts, V_chunks):
        t.append_message(b"dom-sep", b"rangeproof v1")
        t.append_u64(b"n", n)
        t.append_u64(b"m", m)
        t.append_messages(b"V", vbs)
    _tick("batch V host absorbs")
    _tick_sync("batch S msm", S_pt)

    AS_bytes = _compress_bytes(PointArray(*[
        jnp.concatenate([a, s], axis=1) for a, s in zip(A_pt, S_pt)
    ]))
    _tick("batch A+S msm+compress")
    ys, zs = [], []
    for g, t in enumerate(transcripts):
        _append_point(t, b"A", AS_bytes[g])
        _append_point(t, b"S", AS_bytes[G_n + g])
        ys.append(t.challenge_scalar(b"y"))
        zs.append(t.challenge_scalar(b"z"))
    zzs = [(z * z) % SS.L for z in zs]

    # per-chunk vectors (one-time per prove: small host loop of device ops)
    exp_y = jnp.concatenate(
        [sc.powers(_const(y), nm) for y in ys], axis=1)
    zz2 = jnp.concatenate(
        [_zz2_vec(n, m, z, zz) for z, zz in zip(zs, zzs)], axis=1)
    z_rep = jnp.repeat(_consts(zs), nm, axis=1)

    l0 = sc.sub(a_L, z_rep)
    l1 = s_L.reshape(16, L)
    r0 = sc.add(sc.mul(exp_y, sc.add(a_R, z_rep)), zz2)
    r1 = sc.mul(exp_y, s_R.reshape(16, L))

    t0 = sc.sum_reduce_groups(sc.mul(l0, r0), nm)
    t2 = sc.sum_reduce_groups(sc.mul(l1, r1), nm)
    t1f = sc.sum_reduce_groups(sc.mul(sc.add(l0, l1), sc.add(r0, r1)), nm)
    t0_i = sc.unpack_scalars(np.asarray(t0))
    t2_i = sc.unpack_scalars(np.asarray(t2))
    t1f_i = sc.unpack_scalars(np.asarray(t1f))
    t1_i = [(f - a0 - a2) % SS.L for f, a0, a2 in zip(t1f_i, t0_i, t2_i)]

    _tick("batch t-poly")
    t1_blind = sc.unpack_scalars(pedersen.rnd_scalar_limbs(G_n, rng))
    t2_blind = sc.unpack_scalars(pedersen.rnd_scalar_limbs(G_n, rng))
    T_vals = _consts(t1_i + t2_i)           # (16, 2G): T1s then T2s
    T_blinds = _consts(t1_blind + t2_blind)
    T = pedersen.pedersen_commit(T_vals, T_blinds)
    T_bytes = _compress_bytes(T)
    xs = []
    for g, t in enumerate(transcripts):
        _append_point(t, b"T_1", T_bytes[g])
        _append_point(t, b"T_2", T_bytes[G_n + g])
        xs.append(t.challenge_scalar(b"x"))

    # Σ_j zz·z^j·γ_{g,j} per chunk — on device (was a host bigint loop)
    zz_zj = jnp.concatenate(
        [sc.mul(sc.powers(_const(z), m), _const(zz))
         for z, zz in zip(zs, zzs)], axis=1)          # (16, G·m)
    bsums = sc.unpack_scalars(np.asarray(
        sc.sum_reduce_groups(sc.mul(zz_zj, gamma_limbs), m)))

    a_bls = sc.unpack_scalars(np.asarray(a_blind))
    s_bls = sc.unpack_scalars(np.asarray(s_blind))
    t_xs, t_x_blinds, e_blinds, ws = [], [], [], []
    for g, t in enumerate(transcripts):
        x = xs[g]
        t_x = (t0_i[g] + t1_i[g] * x + t2_i[g] * x * x) % SS.L
        t_x_blinding = (
            bsums[g] + x * t1_blind[g] + x * x * t2_blind[g]
        ) % SS.L
        e_blinding = (a_bls[g] + x * s_bls[g]) % SS.L
        t.append_message(b"t_x", SS.to_bytes(t_x))
        t.append_message(b"t_x_blinding", SS.to_bytes(t_x_blinding))
        t.append_message(b"e_blinding", SS.to_bytes(e_blinding))
        ws.append(t.challenge_scalar(b"w"))
        t_xs.append(t_x)
        t_x_blinds.append(t_x_blinding)
        e_blinds.append(e_blinding)

    x_rep = _consts(xs)[:, :, None]  # (16, G, 1)
    a_vec = sc.add(l0.reshape(16, G_n, nm),
                   sc.mul(l1.reshape(16, G_n, nm), x_rep))
    b_vec = sc.add(r0.reshape(16, G_n, nm),
                   sc.mul(r1.reshape(16, G_n, nm), x_rep))

    y_invs = [pow(y, SS.L - 2, SS.L) for y in ys]
    _tick("batch T/x/lr")
    ipps = _ipp_create_batch(transcripts, ws, gens_G_t, gens_H_t,
                             a_vec, b_vec, nm, y_invs, mesh)
    _tick("batch ipp total")

    proofs = []
    for g in range(G_n):
        proofs.append(RangeProof(
            AS_bytes[g], AS_bytes[G_n + g], T_bytes[g], T_bytes[G_n + g],
            t_xs[g], t_x_blinds[g], e_blinds[g], ipps[g],
        ))
    return proofs, V_chunks, V


def _ipp_create_batch(
    transcripts: list[Transcript],
    ws: list[int],
    G_pts: PointArray,
    H_pts: PointArray,
    a: jnp.ndarray,   # (16, G, nm)
    b: jnp.ndarray,
    n: int,
    y_invs: list[int],
    mesh=None,
) -> list[InnerProductProof]:
    """Chunk-batched InnerProductProof::create (factored folds as in
    _ipp_create, with per-chunk pending scalars and the w_g·Q term folded
    into a fixed-base B multiply so group sizes stay pow2)."""
    G_n = len(transcripts)
    for t in transcripts:
        t.append_message(b"dom-sep", b"ipp v1")
        t.append_u64(b"n", n)

    y_inv_pows = jnp.stack(
        [sc.powers(_const(yi), max(n // 2, 1)) for yi in y_invs], axis=1
    ) if n > 1 else None  # (16, G, n/2)

    Gc = _p3(G_pts, G_n, n)
    Hc = _p3(H_pts, G_n, n)
    gps = [1] * G_n
    chs = [1] * G_n
    L_bytes: list[list[bytes]] = [[] for _ in range(G_n)]
    R_bytes: list[list[bytes]] = [[] for _ in range(G_n)]
    base_B = pedersen.base_B()

    s = n
    while s > 1:
        h = s // 2
        a_L, a_R = a[:, :, :h], a[:, :, h:s]
        b_L, b_R = b[:, :, :h], b[:, :, h:s]
        G_L, G_R = _pslice3(Gc, slice(0, h)), _pslice3(Gc, slice(h, s))
        H_L, H_R = _pslice3(Hc, slice(0, h)), _pslice3(Hc, slice(h, s))

        c_L = sc.sum_reduce_groups(
            sc.mul(a_L, b_R).reshape(16, -1), h)        # (16, G)
        c_R = sc.sum_reduce_groups(
            sc.mul(a_R, b_L).reshape(16, -1), h)

        ypend = sc.mul(y_inv_pows[:, :, :h], _consts(chs)[:, :, None])
        gp_rep = _consts(gps)[:, :, None]
        yRs = [pow(yi, h, SS.L) for yi in y_invs]

        LR_bases = _pconcat3(G_R, H_L)                  # (16, G, s)
        L_scal = jnp.concatenate(
            [sc.mul(a_L, gp_rep), sc.mul(b_R, ypend)], axis=2
        ).reshape(16, -1)
        L_sum = _msm_grouped(_pflat(LR_bases), L_scal, s, mesh)
        wq_L = sc.mul(c_L, _consts(ws))
        L_pt = curve.add(L_sum, base_B.mul(wq_L))

        RL_bases = _pconcat3(G_L, H_R)
        R_scal = jnp.concatenate(
            [sc.mul(a_R, gp_rep),
             sc.mul(b_L, sc.mul(ypend, _consts(yRs)[:, :, None]))], axis=2
        ).reshape(16, -1)
        R_sum = _msm_grouped(_pflat(RL_bases), R_scal, s, mesh)
        wq_R = sc.mul(c_R, _consts(ws))
        R_pt = curve.add(R_sum, base_B.mul(wq_R))

        _tick_sync(f"  ipp rnd s={s} msm", L_pt, R_pt)
        both = _compress_bytes(PointArray(*[
            jnp.concatenate([l, r], axis=1) for l, r in zip(L_pt, R_pt)
        ]))
        _tick(f"  ipp rnd s={s} L/R+compress")
        us, u_invs = [], []
        for g, t in enumerate(transcripts):
            Lb, Rb = both[g], both[G_n + g]
            L_bytes[g].append(Lb)
            R_bytes[g].append(Rb)
            _append_point(t, b"L", Lb)
            _append_point(t, b"R", Rb)
            u = t.challenge_scalar(b"u")
            us.append(u)
            u_invs.append(pow(u, SS.L - 2, SS.L))

        u_rep = _consts(us)[:, :, None]
        uinv_rep = _consts(u_invs)[:, :, None]
        a = sc.add(sc.mul(a_L, u_rep), sc.mul(a_R, uinv_rep))
        b = sc.add(sc.mul(b_L, uinv_rep), sc.mul(b_R, u_rep))
        if h > 1:
            usq = [(u * u) % SS.L for u in us]
            uisq_yR = [((ui * ui) % SS.L) * yR % SS.L
                       for ui, yR in zip(u_invs, yRs)]
            # ONE fused fold call for both bases: [Ĝ'|Ĥ'] = [Ĝ_L|Ĥ_L] +
            # [u²|u⁻²y^-h]·[Ĝ_R|Ĥ_R] — halves the per-round dispatches
            # and keeps the windowed smul kernel at full occupancy
            scal = jnp.concatenate([
                jnp.repeat(_consts(usq)[:, :, None], h, axis=2),
                jnp.repeat(_consts(uisq_yR)[:, :, None], h, axis=2),
            ], axis=2).reshape(16, -1)
            folded = _p3(curve.add(
                _pflat(_pconcat3(G_L, H_L)),
                curve.scalar_mul(_pflat(_pconcat3(G_R, H_R)), scal),
            ), G_n, 2 * h)
            Gc = _pslice3(folded, slice(0, h))
            Hc = _pslice3(folded, slice(h, 2 * h))
            gps = [(gp * ui) % SS.L for gp, ui in zip(gps, u_invs)]
            chs = [(c * u) % SS.L for c, u in zip(chs, us)]
            _tick_sync(f"  ipp rnd s={s} folds", Gc, Hc)
        s = h

    a_fin = sc.unpack_scalars(np.asarray(a.reshape(16, G_n)))
    b_fin = sc.unpack_scalars(np.asarray(b.reshape(16, G_n)))
    return [InnerProductProof(L_bytes[g], R_bytes[g], a_fin[g], b_fin[g])
            for g in range(G_n)]


def _ipp_create(
    transcript: Transcript,
    Q: PointArray,
    G_pts: PointArray,
    H_pts: PointArray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    n: int,
    y_inv: int,
) -> InnerProductProof:
    """InnerProductProof::create — factored-fold formulation.

    Produces bit-identical L/R points to dalek's create() with
    G_factors = 1, H_factors = y^-i, but never multiplies scalars into
    base points when a pending-scalar substitution can do it in mod-l
    land instead:

      * the y^-i H_factors stay a pending per-lane factor c_k·y^-j
        (geometric, ratio preserved by folds) applied to the L/R MSM
        scalar vectors;
      * each fold Ĝ' = u_inv·G_L + u·G_R is computed as
        Ĝ_L + u²·Ĝ_R with the global u_inv tracked in gp (compensated in
        the MSM scalars) — ONE half-length ladder instead of two
        full-length ones, and no H pre-scaling ladder at all.

    Device↔host traffic per round: one compress (both L,R) for the
    transcript; everything else stays on device.
    """
    transcript.append_message(b"dom-sep", b"ipp v1")
    transcript.append_u64(b"n", n)

    # y^-j powers, sliced per round (pending H factors)
    y_inv_pows = sc.powers(_const(y_inv), n) if n > 1 else None

    gp = 1   # G pending: G^(k) = gp · Ĝ^(k)
    ch = 1   # H pending scale: H^(k)_j = ch · y^-j · Ĥ^(k)_j

    L_bytes: list[bytes] = []
    R_bytes: list[bytes] = []
    s = n
    while s > 1:
        h = s // 2
        a_L, a_R = a[:, :h], a[:, h:s]
        b_L, b_R = b[:, :h], b[:, h:s]
        G_L, G_R = _point_slice(G_pts, slice(0, h)), _point_slice(G_pts, slice(h, s))
        H_L, H_R = _point_slice(H_pts, slice(0, h)), _point_slice(H_pts, slice(h, s))

        _tick(None)
        c_L = sc.inner_product(a_L, b_R)
        c_R = sc.inner_product(a_R, b_L)

        ypend = sc.mul(y_inv_pows[:, :h], _const(ch))
        # L = gp·<a_L, Ĝ_R> + <ch·y^-j·b_R, Ĥ_L> + c_L·Q   (true group values)
        L_scal = jnp.concatenate(
            [sc.mul(a_L, _const(gp)), sc.mul(b_R, ypend), c_L], axis=1
        )
        L_pt = msm.msm(_point_concat(_point_concat(G_R, H_L), Q), L_scal)
        yR = pow(y_inv, h, SS.L)
        R_scal = jnp.concatenate(
            [sc.mul(a_R, _const(gp)),
             sc.mul(b_L, sc.mul(ypend, _const(yR))), c_R], axis=1
        )
        R_pt = msm.msm(_point_concat(_point_concat(G_L, H_R), Q), R_scal)

        _tick(f"  rnd s={s} L/R msm dispatch")
        both = _compress_bytes(_point_concat(L_pt, R_pt))
        _tick(f"  rnd s={s} compress+sync")
        Lb, Rb = both[0], both[1]
        L_bytes.append(Lb)
        R_bytes.append(Rb)
        _append_point(transcript, b"L", Lb)
        _append_point(transcript, b"R", Rb)
        u = transcript.challenge_scalar(b"u")
        u_inv = pow(u, SS.L - 2, SS.L)

        a = sc.add(sc.mul(a_L, _const(u)), sc.mul(a_R, _const(u_inv)))
        b = sc.add(sc.mul(b_L, _const(u_inv)), sc.mul(b_R, _const(u)))
        if h > 1:
            # Ĝ' = Ĝ_L + u²·Ĝ_R  (true G' = gp·u_inv·Ĝ')
            usq = (u * u) % SS.L
            uinv_sq = (u_inv * u_inv) % SS.L
            G_pts = curve.add(G_L, curve.scalar_mul(G_R, _const(usq)))
            # Ĥ' = Ĥ_L + (u_inv²·y^-h)·Ĥ_R  (true H'_j = ch·u·y^-j·Ĥ'_j)
            H_pts = curve.add(
                H_L, curve.scalar_mul(H_R, _const((uinv_sq * yR) % SS.L))
            )
            gp = (gp * u_inv) % SS.L
            ch = (ch * u) % SS.L
        _tick(f"  rnd s={s} folds dispatch")
        s = h

    a_final = sc.unpack_scalars(np.asarray(a[:, :1]))[0]
    b_final = sc.unpack_scalars(np.asarray(b[:, :1]))[0]
    return InnerProductProof(L_bytes, R_bytes, a_final, b_final)


# -- verifier ----------------------------------------------------------------


def _ipp_verification_scalars(
    ipp: InnerProductProof, n: int, transcript: Transcript
):
    """inner_product_proof.rs verification_scalars.

    Returns (u_sq, u_inv_sq, s_vec) with the challenge lists as host ints
    (2·lg values) and the length-n s vector BUILT ON DEVICE (doubling
    concat: s_(i|2^j) = s_i · u_sq[lg-1-j]) — the reference computes it
    with a sequential host loop, which would dominate at n = 2^18."""
    lg_n = len(ipp.L)
    if lg_n >= 32 or n != (1 << lg_n):
        return None
    transcript.append_message(b"dom-sep", b"ipp v1")
    transcript.append_u64(b"n", n)
    challenges = []
    for Lb, Rb in zip(ipp.L, ipp.R):
        if not _validate_and_append(transcript, b"L", Lb):
            return None
        if not _validate_and_append(transcript, b"R", Rb):
            return None
        challenges.append(transcript.challenge_scalar(b"u"))
    u_sq = [(u * u) % SS.L for u in challenges]
    u_inv = [pow(u, SS.L - 2, SS.L) for u in challenges]
    u_inv_sq = [(v * v) % SS.L for v in u_inv]
    all_inv = 1
    for v in u_inv:
        all_inv = (all_inv * v) % SS.L
    s_vec = _const(all_inv)
    for j in range(lg_n):
        s_vec = jnp.concatenate(
            [s_vec, sc.mul(s_vec, _const(u_sq[(lg_n - 1) - j]))], axis=1
        )
    return u_sq, u_inv_sq, s_vec


def _zz2_vec(n: int, m: int, z: int, zz: int) -> jnp.ndarray:
    """Device (16, n·m) vector of z²·z^j·2^i at index k = j·n+i."""
    two_pows = sc.powers(_const(2), n)                    # (16, n)
    z_pows = sc.mul(sc.powers(_const(z), m), _const(zz))  # (16, m)
    rep_z = jnp.repeat(z_pows, n, axis=1)                 # z^j each n times
    tile_two = jnp.tile(two_pows, (1, m))
    return sc.mul(rep_z, tile_two)


def _sum_of_powers(x: int, n: int) -> int:
    acc, cur = 0, 1
    for _ in range(n):
        acc = (acc + cur) % SS.L
        cur = (cur * x) % SS.L
    return acc


def _delta(n: int, m: int, y: int, z: int) -> int:
    """(z−z²)·Σ_{k<nm} y^k − z³·Σ_{i<n} 2^i·Σ_{j<m} z^j."""
    zz = (z * z) % SS.L
    return (
        (z - zz) * _sum_of_powers(y, n * m)
        - (zz * z % SS.L) * _sum_of_powers(2, n) * _sum_of_powers(z, m)
    ) % SS.L


def verify_multiple_batch(
    items: list[tuple[Transcript, RangeProof, list[bytes]]],
    n: int,
    rng: np.random.Generator,
    mesh=None,
) -> bool:
    """Batched RangeProof::verify_multiple_with_rng across MANY aggregated
    proofs sharing the same (n, m) generators — the n_partition chunks of
    one parameter vector (range_proof_vec) verify as ONE mega-MSM.

    Every chunk's verification equation is scaled by a fresh random weight
    ρ and summed; the G/H generator coefficients COLLAPSE across chunks
    (shared bases), so the combined MSM has 2nm + Σ(4+2lg+m) terms instead
    of n_chunks·(2nm+4+2lg+m). The reference loops verify_multiple per
    chunk (range_proof_vec/mod.rs:149-216); dalek itself batches this way
    inside one proof only. All length-nm scalar vectors are built on
    device (mod-l kernels), not host loops.
    """
    if not items:
        return True
    m = len(items[0][2])
    nm = n * m
    if m & (m - 1) or nm & (nm - 1):
        return False
    lg = nm.bit_length() - 1
    gens_G, gens_H = device_bp_gens(n, m)

    B_scalar = 0
    Bb_scalar = 0
    decode_list: list[bytes] = []
    host_scalars: list[int] = []
    metas = []  # per-chunk host challenge bundle

    # -- pass 1: HOST transcript replay only (bulk STROBE absorbs) -------
    for transcript, proof, V_bytes in items:
        if len(V_bytes) != m:
            return False
        rho = int.from_bytes(rng.bytes(64), "little") % SS.L

        transcript.append_message(b"dom-sep", b"rangeproof v1")
        transcript.append_u64(b"n", n)
        transcript.append_u64(b"m", m)
        # V may be the identity (zero value, zero blinding — the
        # reference's pow2 padding relies on this; dalek PR #248
        # explicitly allows it); bulk-absorbed in one native call
        transcript.append_messages(b"V", V_bytes)
        if not _validate_and_append(transcript, b"A", proof.A):
            return False
        if not _validate_and_append(transcript, b"S", proof.S):
            return False
        y = transcript.challenge_scalar(b"y")
        z = transcript.challenge_scalar(b"z")
        zz = (z * z) % SS.L
        if not _validate_and_append(transcript, b"T_1", proof.T_1):
            return False
        if not _validate_and_append(transcript, b"T_2", proof.T_2):
            return False
        x = transcript.challenge_scalar(b"x")
        transcript.append_message(b"t_x", SS.to_bytes(proof.t_x))
        transcript.append_message(b"t_x_blinding",
                                  SS.to_bytes(proof.t_x_blinding))
        transcript.append_message(b"e_blinding", SS.to_bytes(proof.e_blinding))
        w = transcript.challenge_scalar(b"w")

        c = int.from_bytes(rng.bytes(64), "little") % SS.L  # value combiner

        # ipp challenge replay (inner_product_proof.rs verification_scalars
        # host part; the s vector is built batched below)
        if len(proof.ipp.L) != lg or lg >= 32:
            return False
        transcript.append_message(b"dom-sep", b"ipp v1")
        transcript.append_u64(b"n", nm)
        challenges = []
        for Lb, Rb in zip(proof.ipp.L, proof.ipp.R):
            if not _validate_and_append(transcript, b"L", Lb):
                return False
            if not _validate_and_append(transcript, b"R", Rb):
                return False
            challenges.append(transcript.challenge_scalar(b"u"))
        u_sq = [(u * u) % SS.L for u in challenges]
        u_inv = [pow(u, SS.L - 2, SS.L) for u in challenges]
        u_inv_sq = [(v * v) % SS.L for v in u_inv]
        all_inv = 1
        for v in u_inv:
            all_inv = (all_inv * v) % SS.L

        a, b = proof.ipp.a, proof.ipp.b
        y_inv = pow(y, SS.L - 2, SS.L)
        basepoint_scalar = (
            w * (proof.t_x - a * b) + c * (_delta(n, m, y, z) - proof.t_x)
        ) % SS.L
        B_scalar = (B_scalar + rho * basepoint_scalar) % SS.L
        Bb_scalar = (
            Bb_scalar + rho * (-proof.e_blinding - c * proof.t_x_blinding)
        ) % SS.L

        decode_list += (
            [proof.A, proof.S, proof.T_1, proof.T_2]
            + proof.ipp.L + proof.ipp.R + V_bytes
        )
        host_scalars += [
            (k * rho) % SS.L
            for k in [1, x, (c * x) % SS.L, (c * x * x) % SS.L]
            + u_sq + u_inv_sq
        ]
        metas.append(dict(rho=rho, y=y, z=z, zz=zz, c=c, a=a, b=b,
                          y_inv=y_inv, u_sq=u_sq, all_inv=all_inv))

    # -- pass 2: ALL chunks' scalar vectors batched on device ------------
    # (was a per-chunk eager loop: ~25 small dispatches × n_chunks)
    G_n = len(items)

    def col(key):
        return _consts([mt[key] for mt in metas])[:, :, None]  # (16, G, 1)

    def bc(x):
        return jnp.broadcast_to(x, (16, G_n, nm))

    # s vector, doubling-concat with per-chunk u² columns
    s_all = col("all_inv")
    for j in range(lg):
        usq_j = _consts([mt["u_sq"][(lg - 1) - j] for mt in metas])
        s_all = jnp.concatenate(
            [s_all, sc.mul(s_all, usq_j[:, :, None])], axis=2)
    s_inv_all = jnp.flip(s_all, axis=2)

    # batched powers by doubling: y^-i rows per chunk
    yi_pows = sc.ones((G_n, 1))
    cur = col("y_inv")
    size = 1
    while size < nm:
        yi_pows = jnp.concatenate([yi_pows, sc.mul(yi_pows, cur)], axis=2)
        cur = sc.mul(cur, cur)
        size *= 2
    yi_pows = yi_pows[:, :, :nm]

    # zz2 rows per chunk: z²·z^j·2^i at k = j·n+i
    z_pows = sc.ones((G_n, 1))
    curz = col("z")
    size = 1
    while size < m:
        z_pows = jnp.concatenate([z_pows, sc.mul(z_pows, curz)], axis=2)
        curz = sc.mul(curz, curz)
        size *= 2
    z_pows = z_pows[:, :, :m]                      # (16, G, m)
    two_pows = sc.powers(_const(2), n)             # (16, n)
    zz2_all = sc.mul(
        jnp.repeat(sc.mul(z_pows, col("zz")), n, axis=2),
        jnp.tile(two_pows[:, None, :], (1, G_n, m)))

    neg_z = _consts([(SS.L - mt["z"]) % SS.L for mt in metas])[:, :, None]
    g_all = sc.mul(
        sc.sub(bc(neg_z), sc.mul(s_all, col("a"))), col("rho"))
    h_all = sc.mul(
        sc.add(bc(col("z")),
               sc.mul(yi_pows,
                      sc.sub(zz2_all, sc.mul(s_inv_all, col("b"))))),
        col("rho"))
    # mod-l reduce over the chunk axis (log-halving, zero pad is inert)
    for arr_name in ("g", "h"):
        arr = g_all if arr_name == "g" else h_all
        k = G_n
        while k > 1:
            half = k // 2
            lo = sc.add(arr[:, :half], arr[:, half:2 * half])
            arr = (jnp.concatenate([lo, arr[:, 2 * half:k]], axis=1)
                   if k & 1 else lo)
            k = half + (k & 1)
        if arr_name == "g":
            g_acc = arr.reshape(16, nm)
        else:
            h_acc = arr.reshape(16, nm)

    czr = _consts([(mt["c"] * mt["zz"] % SS.L) * mt["rho"] % SS.L
                   for mt in metas])[:, :, None]
    value_cols_all = sc.mul(z_pows, czr)           # (16, G, m)
    value_cols = [value_cols_all[:, g] for g in range(G_n)]

    _tick("  rpverify: host transcripts+scalars")
    enc = np.stack([np.frombuffer(bb, np.uint8) for bb in decode_list])
    pts, valid = curve.decompress(jnp.asarray(fe.from_bytes_array(enc)))
    if not bool(np.all(np.asarray(valid))):
        return False
    _tick("  rpverify: decompress")

    lg = len(items[0][1].ipp.L)
    stride = 4 + 2 * lg  # host-scalar block per chunk (before V columns)
    # interleave per-chunk host scalars with their device value columns in
    # decode_list order: [4+2lg host][m device] per chunk
    cols = []
    hs = jnp.asarray(sc.pack_scalars(host_scalars))
    for ci, vc in enumerate(value_cols):
        cols.append(hs[:, ci * stride:(ci + 1) * stride])
        cols.append(vc)
    fixed = curve.pack_points([G.pedersen_B_blinding(), G.pedersen_B()])
    all_pts = _point_concat(_point_concat(pts, fixed),
                            _point_concat(gens_G, gens_H))
    all_scalars = jnp.concatenate(
        cols + [jnp.asarray(sc.pack_scalars([Bb_scalar, B_scalar])),
                g_acc, h_acc],
        axis=1,
    )
    if mesh is not None:
        from ..parallel.mesh import sharded_msm

        total = sharded_msm(mesh, all_pts, all_scalars)
    else:
        total = msm.msm(all_pts, all_scalars)
    ident = curve.identity((1,))
    ok = bool(np.asarray(curve.eq(total, ident))[0])
    _tick("  rpverify: mega-msm")
    return ok


def verify_multiple(
    transcript: Transcript,
    proof: RangeProof,
    V_bytes: list[bytes],
    n: int,
    rng: np.random.Generator,
) -> bool:
    """RangeProof::verify_multiple_with_rng — single-proof wrapper."""
    return verify_multiple_batch([(transcript, proof, V_bytes)], n, rng)
