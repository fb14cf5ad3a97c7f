"""FFI-parity (bindings.py) + serde conformance — ports the reference's
inline known-answer tests (VERDICT r1 item 6):

  conversion32.rs:181-247  lossless / lossy-rounded / saturating codecs
  pedersen_ops.rs:137-296  add_rp_vec_vec fixed vectors, cancelling
                           blindings three-client extraction
  bsgs32.rs:85-124         positive/negative dlog recovery
  l2_range_proof_vec/mod.rs:357-373  L2 bound failures

Everything below drives the bindings surface (the 29 C-binding
equivalents) and the serde codecs, not internal modules.
"""

import numpy as np
import pytest

import rofl_tpu.bindings as B
from rofl_tpu.crypto import pedersen, serde_vec as sv, sigma
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import sc
from rofl_tpu.spec import scalar as SS

# default tier (VERDICT r4 item 5): completes in tens of
# seconds on 2 CPU cores with a warm cache — FFI KATs + serde conformance: host-side codecs + small-N device ops

FP = FpConfig(16, 7)
FIX_MAX = FP.max_bits / FP.scale  # Fix::max_value().to_float()
rng = np.random.default_rng(321)


# -- conversion32.rs codec KATs ------------------------------------------------


def test_conversion_lossless():
    vals = np.array([0.5, -1.25, FIX_MAX], np.float32)
    scalars = FP.f32_to_scalars(vals)
    back = FP.scalars_to_f32(scalars)
    np.testing.assert_array_equal(back, vals)
    # vectorized limb codec agrees
    limbs = FP.f32_to_scalar_limbs(vals)
    np.testing.assert_array_equal(FP.scalar_limbs_to_f32(limbs), vals)


def test_conversion_lossy_rounded():
    # loss bounded by half an ulp (conversion32.rs:196-214)
    vals = np.array([FIX_MAX - 0.1, 0.0 + 1.0 / 3.0], np.float32)
    back = FP.scalars_to_f32(FP.f32_to_scalars(vals))
    assert np.all(np.abs(vals - back) <= 2.0 ** (-FP.n_frac - 1))


def test_conversion_saturated():
    vals = np.array([FIX_MAX + 5.0, -FIX_MAX - 100.0], np.float32)
    back = FP.scalars_to_f32(FP.f32_to_scalars(vals))
    np.testing.assert_array_equal(back,
                                  np.array([FIX_MAX, -FIX_MAX], np.float32))


def test_commit_no_blinding_extract_saturated():
    # conversion32 saturation end-to-end through commit + default-table BSGS
    vals = np.array([FIX_MAX + 5.0, -FIX_MAX - 100.0], np.float32)
    out = B.extract_values(B.commit_no_blinding(vals))
    np.testing.assert_array_equal(out,
                                  np.array([FIX_MAX, -FIX_MAX], np.float32))


# -- pedersen_ops.rs fixed vectors ---------------------------------------------


def test_add_commitments_fixed_vectors():
    x_sets = [[0.25, 1.25, -1.5], [-0.75, 1.25, -2.0], [0.5, 1.25, -3.0]]
    want = np.array([0.0, 3.75, -6.5], np.float32)
    blobs = [B.commit_no_blinding(np.array(x, np.float32)) for x in x_sets]
    total = B.add_commitments(blobs)
    np.testing.assert_array_equal(B.extract_values(total), want)


def test_add_commitments_transposed():
    x_sets = [[1.0, 1.25, -2.25], [-1.0, 1.25, -3.25]]
    want = np.array([0.0, 2.5, -5.5], np.float32)
    # transposed sums EACH blob to one point, returned as bincode of a
    # single RistrettoPoint (40 bytes each, bindings32.rs:107-112) — but
    # summing along the CLIENT axis needs per-index blobs, so feed it
    # per-index vectors
    per_index = [
        B.commit_no_blinding(np.array([xs[i] for xs in x_sets], np.float32))
        for i in range(3)
    ]
    parts = B.add_commitments_transposed(per_index)
    got = np.array(
        [B.extract_values(sv._u64(1) + p)[0] for p in parts], np.float32)
    np.testing.assert_array_equal(got, want)


def test_cancelling_blindings_three_clients():
    x_sets = [[0.25, 1.25, -1.5], [-0.75, 1.25, -2.0], [0.5, 1.25, -3.0]]
    want = np.array([0.0, 3.75, -6.5], np.float32)
    blinds = B.generate_cancelling_blindings(3, 3)
    blobs = [B.commit(np.array(x, np.float32), b)
             for x, b in zip(x_sets, blinds)]
    # individual commitments are NOT extractable; the blinded sum is
    total = B.add_commitments(blobs)
    np.testing.assert_array_equal(B.extract_values(total), want)


def test_select_blindings_and_commitments():
    blinds = B.generate_cancelling_blindings(2, 5)[0]
    sel = B.select_blindings(blinds, [0, 2, 4])
    want = sv.deserialize_scalar_vec(blinds)[:, [0, 2, 4]]
    np.testing.assert_array_equal(sv.deserialize_scalar_vec(sel), want)

    commits = B.commit_no_blinding(np.arange(5, dtype=np.float32))
    sel_c = B.select_commitments(commits, [1, 3])
    np.testing.assert_array_equal(
        B.extract_values(sel_c), np.array([1.0, 3.0], np.float32))


def test_bsgs_positive_negative():
    # bsgs32.rs:85-124 with the default table
    n = 12
    pos = rng.uniform(0.0, FIX_MAX, n).astype(np.float32)
    neg = rng.uniform(-FIX_MAX, 0.0, n).astype(np.float32)
    for vals in (pos, neg):
        quant = FP.scalars_to_f32(FP.f32_to_scalars(vals))  # table holds ulp
        out = B.extract_values(B.commit_no_blinding(vals))
        np.testing.assert_array_equal(out, quant)


# -- scalar / group vector helpers ---------------------------------------------


def test_add_scalars_and_zero_vectors():
    blinds = B.generate_cancelling_blindings(3, 4)
    for i in range(3):
        pass
    # element-wise sum of all three must be 0 mod l
    total = np.zeros(4, dtype=object)
    for b in blinds:
        for i, x in enumerate(sc.unpack_scalars(sv.deserialize_scalar_vec(b))):
            total[i] = (int(total[i]) + x) % SS.L
    assert all(int(t) == 0 for t in total)
    # add_scalars folds one blob to a single scalar
    s = B.add_scalars(sv.serialize_scalar_vec(sc.pack_scalars([1, 2, 3])))
    assert sv.deserialize_scalar(s) == 6
    # zero factories
    zs = sv.deserialize_scalar_vec(B.create_zero_scalar_vector(3))
    assert np.all(np.asarray(zs) == 0)
    zg = B.create_zero_group_element_vector(3)
    assert all(B.equals_neutral_group_element_vec(zg))


def test_commits_equal_and_filter():
    a = B.commit_no_blinding(np.array([1.0, 2.0, 3.0], np.float32))
    b = B.commit_no_blinding(np.array([1.0, 9.0, 3.0], np.float32))
    assert B.commits_equal(a, a)
    assert not B.commits_equal(a, b)
    bad = B.filter_unequal_commits(a, b)
    np.testing.assert_array_equal(B.extract_values(bad[0]),
                                  np.array([2.0], np.float32))


def test_clip_and_quantize():
    vals = np.array([5.0, -5.0, 0.25], np.float32)
    lo, hi = FP.clip_bounds(8)
    clipped = B.clip_to_range(vals, 8)
    np.testing.assert_array_equal(
        clipped, np.clip(vals, lo, hi).astype(np.float32))
    # quantize_probabilistic currently just clips (bindings32.rs:661)
    np.testing.assert_array_equal(B.quantize_probabilistic(vals, 8), clipped)


def test_split_join_elgamal_and_squaretriple():
    n = 3
    m = pedersen.rnd_scalar_limbs(n, rng)
    r = pedersen.rnd_scalar_limbs(n, rng)
    import jax.numpy as jnp

    pairs = pedersen.elgamal_commit(jnp.asarray(m), jnp.asarray(r))
    blob = sv.serialize_eg_pair_vec(pairs)
    ped, rnd_part = B.split_elgamal_pair_vector(blob)
    assert B.join_to_elgamal_pair_vector(ped, rnd_part) == blob

    r2 = pedersen.rnd_scalar_limbs(n, rng)
    _, commits = sigma.square_rand_proof_prove(
        jnp.asarray(m), jnp.asarray(r), jnp.asarray(r2), rng)
    tri_blob = sv.serialize_squaretriple_vec(commits)
    p1, p2, p3 = B.split_squaretriple_pair_vector(tri_blob)
    assert B.join_to_squaretriple_pair_vector(p1, p2, p3) == tri_blob


# -- proof create/verify through the FFI surface -------------------------------


def test_randproof_ffi_roundtrip_and_reject():
    vals = np.array([0.5, -0.25, 0.125, 0.75], np.float32)
    blind = B.create_random_blinding_vector(4)
    # bindings32.rs:295-322: create returns (Vec<RandProof>,
    # Vec<ElGamalPair>); verify_randproof (rs:324) takes the L and R point
    # vectors SEPARATELY — the caller splits the pair blob
    proof, pairs_blob = B.create_randproof(vals, blind)
    pairs = sv.deserialize_eg_pair_vec(pairs_blob)
    ped = sv.serialize_rp_vec(pairs.L)
    rand_c = sv.serialize_rp_vec(pairs.R)
    assert B.verify_randproof(ped, rand_c, proof)
    # tamper: swap two pedersen commitments
    pts = sv.deserialize_rp_vec(ped)
    import jax.numpy as jnp

    swapped = type(pts)(*[jnp.flip(c, axis=1) for c in pts])
    assert not B.verify_randproof(sv.serialize_rp_vec(swapped), rand_c, proof)


def test_l2proof_ffi_and_bound_failures():
    vals = np.array([0.5, -0.25, 0.25], np.float32)
    b1 = B.create_random_blinding_vector(3)
    b2 = B.create_random_blinding_vector(3)
    blobs = B.create_l2proof(vals, b1, b2, 16, 1)
    # bindings32.rs create_l2proof returns (randproof, commits, range,
    # square) while verify_l2proof (rs:507) takes commits FIRST — same
    # argument swap the reference's Python caller performs
    assert B.verify_l2proof(blobs[1], blobs[0], blobs[2], blobs[3],
                            prove_range=16)

    # l2_range_proof_vec/mod.rs:357-373 — sum of squares exceeds the bound
    from rofl_tpu.crypto import l2_range_proof as L2RP

    for bad in ([8.0], [6.0, 6.0]):
        blind = [int(x) for x in sc.unpack_scalars(
            pedersen.rnd_scalar_limbs(len(bad), rng))]
        with pytest.raises(Exception):
            L2RP.create_rangeproof_l2(
                np.array(bad, np.float32), blind, FP, 16, rng)


def test_serde_scalar_40_byte_bincode():
    # bincode length-prefix gives 40-byte scalars (serde_vec.rs:5-7)
    limbs = sc.pack_scalars([7, SS.L - 1])
    blob = sv.serialize_scalar_vec(limbs)
    # u64 count + 2 * (u64 len + 32 bytes)
    assert len(blob) == 8 + 2 * 40
    np.testing.assert_array_equal(sv.deserialize_scalar_vec(blob), limbs)


def test_serde_rangeproof_vec_roundtrip():
    from rofl_tpu.crypto import range_proof_vec as RPV

    vals = np.array([0.25, -0.5], np.float32)
    blind = [int(x) for x in sc.unpack_scalars(
        pedersen.rnd_scalar_limbs(2, rng))]
    proofs, commits = RPV.create_rangeproof(vals, blind, FP, 8, 1, rng)
    blob = sv.serialize_range_proof_vec(proofs)
    back = sv.deserialize_range_proof_vec(blob)
    assert [p.to_bytes() for p in back] == [p.to_bytes() for p in proofs]
