"""Σ-protocol batched prove/verify: roundtrip + fake-proof rejection.

Mirrors reference tests rand_proof/mod.rs:161-211 and
square_rand_proof/mod.rs:192-257 (roundtrip ok, tampered commitment fails).
"""

import numpy as np
import jax.numpy as jnp

from rofl_tpu.crypto import pedersen, sigma
from rofl_tpu.ops import sc

import pytest

pytestmark = pytest.mark.slow

rng = np.random.default_rng(31337)
N = 4


def rand_scalars(n=N):
    return jnp.asarray(pedersen.rnd_scalar_limbs(n, rng))


def test_rand_proof_roundtrip_and_fake():
    m = rand_scalars()
    r = rand_scalars()
    proof, c = sigma.rand_proof_prove(m, r, rng)
    ok = np.asarray(sigma.rand_proof_verify(proof, c))
    assert ok.all()

    # fake: commit with a different blinding → must fail elementwise
    r_fake = rand_scalars()
    c_fake = pedersen.elgamal_commit(m, r_fake)
    bad = np.asarray(sigma.rand_proof_verify(proof, c_fake))
    assert not bad.any()


def test_rand_proof_existing():
    m = rand_scalars()
    r = rand_scalars()
    existing = pedersen.pedersen_commit(m, r)
    proof, c = sigma.rand_proof_prove(m, r, rng, existing=existing)
    ok = np.asarray(sigma.rand_proof_verify(proof, c))
    assert ok.all()


def test_square_rand_proof_roundtrip_and_fake():
    m = rand_scalars()
    r1 = rand_scalars()
    r2 = rand_scalars()
    proof, c = sigma.square_rand_proof_prove(m, r1, r2, rng)
    ok = np.asarray(sigma.square_rand_proof_verify(proof, c))
    assert ok.all()

    # tamper: swap the square commitment for a commitment to m (not m²)
    c_bad = sigma.SquareRandCommitVec(c.c, pedersen.pedersen_commit(m, r2))
    bad = np.asarray(sigma.square_rand_proof_verify(proof, c_bad))
    assert not bad.any()


def test_square_proof_roundtrip_and_fake():
    m = rand_scalars()
    r1 = rand_scalars()
    r2 = rand_scalars()
    proof, c = sigma.square_proof_prove(m, r1, r2, rng)
    ok = np.asarray(sigma.square_proof_verify(proof, c))
    assert ok.all()

    c_bad = sigma.SquareCommitVec(c.c_l, pedersen.pedersen_commit(m, r1))
    bad = np.asarray(sigma.square_proof_verify(proof, c_bad))
    assert not bad.any()


def test_square_rand_batch_verify():
    """Randomized batch verification (sigma.py): accepts honest vectors,
    rejects a single tampered response — same transcript schedule as the
    per-lane verifier."""
    import jax.numpy as jnp

    d = 12
    r = np.random.default_rng(21)
    m = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(1)))
    r1 = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(2)))
    r2 = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(3)))
    proof, c = sigma.square_rand_proof_prove(m, r1, r2,
                                            np.random.default_rng(4))
    assert sigma.square_rand_proof_verify_batched(
        proof, c, np.random.default_rng(5))
    # per-lane verifier agrees
    assert bool(np.asarray(sigma.square_rand_proof_verify(proof, c)).all())
    # tamper one z_m limb → batch check must reject
    bad = sigma.SquareRandProofVec(
        proof.c_prime, proof.c_sq_prime,
        proof.z_m.at[0, 3].set(proof.z_m[0, 3] ^ 1),
        proof.z_r1, proof.z_r2)
    assert not sigma.square_rand_proof_verify_batched(
        bad, c, np.random.default_rng(6))
