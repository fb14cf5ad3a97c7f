"""Bulletproofs range proofs: roundtrip, tamper rejection, commitment
decode, and the range_proof_vec pipeline (shift/pad/chunk semantics of
range_proof_vec/mod.rs tests at 318-417)."""

import numpy as np

from rofl_tpu.crypto import range_proof as RP
from rofl_tpu.crypto import range_proof_vec as RPV
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import bsgs, curve
from rofl_tpu.spec import scalar as SS
from rofl_tpu.spec.merlin import Transcript

import pytest

pytestmark = pytest.mark.slow

rng = np.random.default_rng(2024)
FP = FpConfig(16, 7)


def rand_blinding():
    return int.from_bytes(rng.bytes(64), "little") % SS.L


def test_single_value_roundtrip():
    n = 8
    t = Transcript(b"RangeProof")
    proof, v_bytes, _V = RP.prove_multiple(t, [200], [rand_blinding()], n, rng)
    tv = Transcript(b"RangeProof")
    assert RP.verify_multiple(tv, proof, v_bytes, n, rng)


def test_aggregated_roundtrip_and_tamper():
    n = 8
    values = [0, 1, 255, 100]
    blinds = [rand_blinding() for _ in values]
    t = Transcript(b"RangeProof")
    proof, v_bytes, _V = RP.prove_multiple(t, values, blinds, n, rng)
    assert RP.verify_multiple(Transcript(b"RangeProof"), proof, v_bytes, n, rng)

    # out-of-range value should fail to verify against honest commitments:
    # tamper with t_x
    bad = RP.RangeProof(
        proof.A, proof.S, proof.T_1, proof.T_2,
        (proof.t_x + 1) % SS.L, proof.t_x_blinding, proof.e_blinding, proof.ipp,
    )
    assert not RP.verify_multiple(Transcript(b"RangeProof"), bad, v_bytes, n, rng)

    # swapped commitments fail
    swapped = [v_bytes[1], v_bytes[0]] + v_bytes[2:]
    assert not RP.verify_multiple(Transcript(b"RangeProof"), proof, swapped, n, rng)


def test_serialization_roundtrip():
    n = 8
    t = Transcript(b"RangeProof")
    proof, v_bytes, _V = RP.prove_multiple(t, [17, 3], [rand_blinding()] * 2, n, rng)
    data = proof.to_bytes()
    back = RP.RangeProof.from_bytes(data)
    assert back.to_bytes() == data
    assert RP.verify_multiple(Transcript(b"RangeProof"), back, v_bytes, n, rng)


def test_rangeproof_vec_pipeline():
    # non-pow2 length (3) → pads to 4; values span negative/positive and
    # exceed the ±(2^7-1) ulp clip bound, so they must be clipped first
    # (range_proof_vec/mod.rs:401-417: create on unclipped values errors,
    # the caller clips with clip_f32_to_range_vec)
    raw = np.array([0.25, -1.5, 1.25], np.float32)
    prove_range = 8
    blinds = [rand_blinding() for _ in range(3)]
    try:
        RPV.create_rangeproof(raw, blinds, FP, prove_range, 1, rng)
        assert False, "unclipped values must be rejected"
    except ValueError:
        pass
    values = RPV.clip_f32_to_range_vec(raw, FP, prove_range)
    proofs, commits = RPV.create_rangeproof(values, blinds, FP, prove_range, 1, rng)
    assert RPV.verify_rangeproof(proofs, commits, FP, prove_range, rng)

    # commitments decode to the clipped plaintexts under BSGS
    # (commit(x, 0) = B^x)
    proofs2, commits2 = RPV.create_rangeproof(
        values, [0, 0, 0], FP, prove_range, 1, rng
    )
    got, ok = bsgs.solve_discrete_log(commits2, m=1 << 16, n_bits=16)
    assert bool(np.all(np.asarray(ok)))
    out = FP.scalar_limbs_to_f32(np.asarray(got))
    np.testing.assert_allclose(out, values, atol=1 / 128)

    # clipping
    clipped = RPV.clip_f32_to_range_vec([10.0, -10.0], FP, prove_range)
    lo, hi = FP.clip_bounds(prove_range)
    assert clipped[0] == hi and clipped[1] == lo
