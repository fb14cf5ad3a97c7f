"""Fixed-base commitments, cancelling blindings, and BSGS extraction.

Mirrors reference tests: pedersen_ops.rs:137-296 (homomorphic addition,
cancelling-blinding extraction with vectors like [0.25, 1.25, -1.5]),
bsgs32.rs:85-124 (positive/negative dlog recovery).
"""

import numpy as np
import jax.numpy as jnp

from rofl_tpu.crypto import pedersen
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import bsgs, curve, sc, fixed_base
from rofl_tpu.spec import generators as G
from rofl_tpu.spec import scalar as SS

FP = FpConfig(16, 7)
rng = np.random.default_rng(99)


def test_fixed_base_mul_matches_spec():
    ks = [0, 1, 2, 255, 256, SS.L - 1, int.from_bytes(rng.bytes(32), "little") % SS.L]
    fb = pedersen.base_B()
    got = curve.compress_to_bytes(fb.mul(jnp.asarray(sc.pack_scalars(ks))))
    for i, k in enumerate(ks):
        assert bytes(got[i]) == G.pedersen_B().scalar_mul(k).compress(), f"k={k}"


def test_commit_matches_spec():
    ms = [1, 12345, SS.L - 7]
    rs = [3, 0, 99999]
    pairs = pedersen.elgamal_commit(
        jnp.asarray(sc.pack_scalars(ms)), jnp.asarray(sc.pack_scalars(rs))
    )
    B, H = G.pedersen_B(), G.pedersen_B_blinding()
    gotL = curve.compress_to_bytes(pairs.L)
    gotR = curve.compress_to_bytes(pairs.R)
    for i, (m, r) in enumerate(zip(ms, rs)):
        assert bytes(gotL[i]) == (B.scalar_mul(m) + H.scalar_mul(r)).compress()
        assert bytes(gotR[i]) == B.scalar_mul(r).compress()


def test_cancelling_blindings_aggregate():
    # three clients commit with cancelling blindings; the sum of pairs
    # decodes to the sum of values (pedersen_ops.rs:229-296 semantics)
    n_clients, dim = 3, 4
    value_sets = [[0.25, 1.25, -1.5, 0.75], [0.5, -0.25, 1.0, -2.0],
                  [1.0, 1.0, 1.0, 1.0]]
    blindings = pedersen.cancelling_scalar_limbs(n_clients, dim, rng)
    pair_list = []
    for vals, b in zip(value_sets, blindings):
        m = jnp.asarray(FP.f32_to_scalar_limbs(np.array(vals, np.float32)))
        pair_list.append(pedersen.elgamal_commit(m, jnp.asarray(b)))
    acc = pair_list[0]
    for p in pair_list[1:]:
        acc = pedersen.add_pairs(acc, p)
    # blindings cancel → R = identity
    assert bool(np.all(np.asarray(pedersen.right_elem_is_identity(acc))))
    # extract via BSGS (sum fits in 16 bits)
    vals, ok = bsgs.solve_discrete_log(acc.L, m=1 << 16, n_bits=16)
    assert bool(np.all(np.asarray(ok)))
    got = FP.scalar_limbs_to_f32(np.asarray(vals))
    want = np.sum(np.array(value_sets, np.float32), axis=0)
    np.testing.assert_allclose(got, want, atol=1 / 128)


def test_bsgs_negative():
    FPs = FpConfig(16, 7)
    vals = np.array([-1.5, -0.25, 100.0, -255.9], np.float32)
    m = jnp.asarray(FPs.f32_to_scalar_limbs(vals))
    pts = pedersen.pedersen_commit_no_blinding(m)
    got, ok = bsgs.solve_discrete_log(pts, m=1 << 16, n_bits=16)
    assert bool(np.all(np.asarray(ok)))
    out = FPs.scalar_limbs_to_f32(np.asarray(got))
    np.testing.assert_allclose(out, np.trunc(vals * 128) / 128, atol=1 / 128)


def test_fp_codec_roundtrip():
    vals = np.array([0.0, 0.25, -1.5, 12.5, -100.125, 255.99], np.float32)
    scalars = FP.f32_to_scalars(vals)
    back = FP.scalars_to_f32(scalars)
    np.testing.assert_allclose(back, np.clip(np.round(vals * 128) / 128, -512, 512),
                               atol=1e-6)
    # vectorized limb path agrees with scalar path
    limbs = FP.f32_to_scalar_limbs(vals)
    assert sc.unpack_scalars(limbs) == scalars
    back2 = FP.scalar_limbs_to_f32(limbs)
    np.testing.assert_array_equal(back, back2)


def test_fp_square():
    # conversion32.rs test_square runs under fp32 (12.5^2 * 2^14 needs 22
    # bits of raw magnitude): scalar_to_f32(s*s)/2^frac == v*v
    v = 12.5
    fp32 = FpConfig(32, 7)
    s32 = fp32.f32_to_scalars([v])[0]
    sq32 = (s32 * s32) % SS.L
    assert fp32.scalar_to_f32(sq32) / fp32.scale == v * v
    # fixed square helper works at fp16 too (result 20000 < 2^16)
    s16 = FP.f32_to_scalars([v])[0]
    assert FP.square_scalar(s16) == int(round((12.5 ** 2) * 128))
    # under fp16 the raw square overflows 16 bits and the decoder truncates
    # to the low n_bits — faithful to read_from_bytes (fp.rs:58-60)
    sq16 = (s16 * s16) % SS.L
    raw = (1600 * 1600) & FP.max_bits
    assert FP.scalar_to_f32(sq16) == raw / FP.scale
    # BSGS table parameters (fp.rs PRECOMP_BIAS/BSGS_N_BITS per width)
    assert FP.precomp_bias == 8 and FP.bsgs_n_bits == 16
    assert fp32.precomp_bias == 7 and fp32.bsgs_n_bits == 16
    assert FP.default_bsgs_table_size == 1 << 16
    assert FpConfig(64, 7).precomp_bias == 0


def test_device_xof_sampler():
    """TPU-path scalar sampler (keyed Keccak XOF in counter mode,
    crypto/pedersen.py rnd_scalar_limbs): deterministic per rng seed,
    canonical mod-l output, distinct lanes. Runs the keccak+byte-expand
    jit on CPU directly (the reduce runs through the jnp mod-l path)."""
    from rofl_tpu.ops import sc as SC

    key = np.frombuffer(np.random.default_rng(4).bytes(32), np.uint8)
    cols_a = np.asarray(pedersen._xof_byte_cols(
        jnp.asarray(key.astype(np.uint32)), 12))
    cols_b = np.asarray(pedersen._xof_byte_cols(
        jnp.asarray(key.astype(np.uint32)), 12))
    assert np.array_equal(cols_a, cols_b)
    assert cols_a.shape == (64, 12) and cols_a.max() <= 0xFF
    # XOF bytes must match the spec Keccak-f permutation lane-by-lane
    from rofl_tpu.spec.keccak import keccak_f1600 as spec_f
    for lane in (0, 7, 11):
        st = bytearray(200)
        st[0:32] = bytes(key)
        st[32:36] = int(lane).to_bytes(4, "little")
        st[40:44] = (0x4C464F52).to_bytes(4, "little")
        st[44:48] = (0x01).to_bytes(4, "little")
        spec_f(st)
        assert bytes(cols_a[:, lane].astype(np.uint8)) == bytes(st[:64])
    limbs = SC._reduce_wide_bytes_jnp(jnp.asarray(cols_a))
    ints = SC.unpack_scalars(np.asarray(limbs))
    assert all(0 <= v < SS.L for v in ints) and len(set(ints)) == 12
