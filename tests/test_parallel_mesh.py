"""8-virtual-device mesh: sharded crypto data plane bit-identical to
single-device (VERDICT r1 item 1).

Covers: 'param'-sharded MSM (local MSM + all_gather partials), sharded
fixed-base commits, cross-client homomorphic accumulation, sharded BSGS
extraction, and the mesh-routed range-proof batch verification.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rofl_tpu.crypto import pedersen
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.ops import bsgs, curve, msm, sc
from rofl_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.slow

rng = np.random.default_rng(77)
FP = FpConfig(16, 7)


def _mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return pmesh.param_mesh(8)


def test_sharded_msm_bit_identical():
    d = 8192
    ks = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    scal = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    pts = pedersen.base_B().mul(ks)

    want = curve.compress_to_bytes(msm.msm(pts, scal))
    mesh = _mesh()
    with mesh:
        got = curve.compress_to_bytes(pmesh.sharded_msm(mesh, pts, scal))
    assert bytes(got[0]) == bytes(want[0])


def test_sharded_commit_accumulate_extract():
    """Full sharded data plane: commits → accumulate (cancelling blindings)
    → identity check → sharded BSGS extract equals the plain sum."""
    d = 1024
    n_clients = 3
    mesh = _mesh()
    value_sets = [rng.uniform(-0.5, 0.5, d).astype(np.float32)
                  for _ in range(n_clients)]
    blinds = pedersen.cancelling_scalar_limbs(n_clients, d, rng)

    with mesh:
        pairs = []
        for vals, b in zip(value_sets, blinds):
            m = pmesh.shard_vector(mesh, jnp.asarray(FP.f32_to_scalar_limbs(vals)))
            r = pmesh.shard_vector(mesh, jnp.asarray(b))
            pairs.append(pedersen.elgamal_commit(m, r))
        acc = pairs[0]
        for p in pairs[1:]:
            acc = pmesh.sharded_pair_add(mesh, acc, p)
        assert bool(np.asarray(pedersen.right_elem_is_identity(acc)).all())
        out, ok = pmesh.sharded_bsgs(mesh, acc.L, 1 << 16, FP.bsgs_n_bits)
        assert bool(np.asarray(ok).all())
        got = FP.scalar_limbs_to_f32(np.asarray(out))

    from rofl_tpu.spec import scalar as SS

    sums = np.zeros(d, dtype=object)
    for vals in value_sets:
        for i, s in enumerate(FP.f32_to_scalars(vals)):
            sums[i] = (int(sums[i]) + s) % SS.L
    want = FP.scalars_to_f32([int(x) for x in sums])
    np.testing.assert_allclose(got, want)


def test_sharded_rangeproof_verify():
    from rofl_tpu.crypto import range_proof_vec as rpv
    from rofl_tpu.spec import scalar as SS

    vals = np.array([0.25, -0.5, 0.75, 0.125], np.float32)
    blind = [int.from_bytes(rng.bytes(64), "little") % SS.L for _ in range(4)]
    proofs, commits = rpv.create_rangeproof(vals, blind, FP, 8, 2, rng)
    mesh = _mesh()
    with mesh:
        assert rpv.verify_rangeproof(proofs, commits, FP, 8, rng, mesh=mesh)


def test_sharded_sigma_bit_identical():
    """Σ-plane mesh routing (VERDICT r4 missing #6): the batched
    RandProof / SquareRandProof prove+verify with lane shardings over
    'param' must emit bit-identical proofs to the single-device path —
    including a lane count (d=50) that does NOT divide the axis, so the
    inert-padding slice-back is exercised."""
    from rofl_tpu.crypto import sigma

    d = 50
    m = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(5)))
    r = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(6)))
    r2 = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(7)))

    ref_p, ref_c = sigma.rand_proof_prove(m, r, np.random.default_rng(11))
    mesh = _mesh()
    with mesh:
        sh_p, sh_c = sigma.rand_proof_prove(
            m, r, np.random.default_rng(11), mesh=mesh)
        ok = sigma.rand_proof_verify(sh_p, sh_c, mesh=mesh)
    assert bool(np.asarray(ok).all())
    for a, b in [(ref_c.L, sh_c.L), (ref_c.R, sh_c.R),
                 (ref_p.c_prime.L, sh_p.c_prime.L)]:
        ab = curve.compress_to_bytes(a)
        bb = curve.compress_to_bytes(b)
        assert all(bytes(x) == bytes(y) for x, y in zip(ab, bb))
    assert np.array_equal(np.asarray(ref_p.z_m), np.asarray(sh_p.z_m))
    assert np.array_equal(np.asarray(ref_p.z_r), np.asarray(sh_p.z_r))

    ref_sp, ref_sc = sigma.square_rand_proof_prove(
        m, r, r2, np.random.default_rng(12))
    with mesh:
        sh_sp, sh_sc = sigma.square_rand_proof_prove(
            m, r, r2, np.random.default_rng(12), mesh=mesh)
        ok = sigma.square_rand_proof_verify(sh_sp, sh_sc, mesh=mesh)
    assert bool(np.asarray(ok).all())
    for a, b in [(ref_sc.c.L, sh_sc.c.L), (ref_sc.c_sq, sh_sc.c_sq),
                 (ref_sp.c_sq_prime, sh_sp.c_sq_prime)]:
        ab = curve.compress_to_bytes(a)
        bb = curve.compress_to_bytes(b)
        assert all(bytes(x) == bytes(y) for x, y in zip(ab, bb))
    assert np.array_equal(np.asarray(ref_sp.z_m), np.asarray(sh_sp.z_m))
    assert np.array_equal(np.asarray(ref_sp.z_r2), np.asarray(sh_sp.z_r2))


def test_sharded_rangeproof_prove_bit_identical():
    """Prove-path sharding (VERDICT r3 item 4): the chunk-batched prover
    with its A/S and IPA L/R MSMs mesh-routed over 'param' must emit
    byte-identical proofs to the single-device path (chunks are
    device-local; no collective in the prove flow)."""
    from rofl_tpu.crypto import range_proof_vec as rpv

    d, n_chunks = 16, 8
    vals = (rng.uniform(-0.5, 0.5, d)).astype(np.float32)
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(3)))

    ref_proofs, ref_commits = rpv.create_rangeproof(
        vals, blind, FP, 8, n_chunks, np.random.default_rng(9))
    mesh = _mesh()
    with mesh:
        sh_proofs, sh_commits = rpv.create_rangeproof(
            vals, blind, FP, 8, n_chunks, np.random.default_rng(9),
            mesh=mesh)
    assert len(ref_proofs) == len(sh_proofs) == n_chunks
    for a, b in zip(ref_proofs, sh_proofs):
        assert a.to_bytes() == b.to_bytes()
    ref_b = curve.compress_to_bytes(ref_commits)
    sh_b = curve.compress_to_bytes(sh_commits)
    assert all(bytes(x) == bytes(y) for x, y in zip(ref_b, sh_b))
