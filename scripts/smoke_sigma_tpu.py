#!/usr/bin/env python
"""TPU smoke: sigma + range proof through the pallas-dispatched ops."""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "axon")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rofl_tpu.utils.cache import setup_cache
setup_cache()

from rofl_tpu.crypto import pedersen, sigma
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.crypto import range_proof_vec as rpv


def sync(x):
    return np.asarray(x)


def main():
    rng = np.random.default_rng(3)
    # randproof at small d: prove + verify, check all-ok and a tampered fail
    d = 512
    m = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    r = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    t0 = time.time()
    proof, c = sigma.rand_proof_prove(m, r, rng)
    ok = sync(sigma.rand_proof_verify(proof, c))
    print(f"randproof d={d}: ok={ok.all()} ({time.time()-t0:.1f}s incl compile)",
          flush=True)
    assert ok.all()
    # tamper
    bad = sigma.RandProofVec(proof.c_prime, proof.z_m, proof.z_r)
    bad_zm = jnp.asarray(np.roll(np.asarray(proof.z_m), 1, axis=1))
    bad = sigma.RandProofVec(proof.c_prime, bad_zm, proof.z_r)
    okb = sync(sigma.rand_proof_verify(bad, c))
    print(f"tampered verify all-fail={~okb.any()}", flush=True)
    assert not okb.all()

    # range proof, small: 8 values, range 8, 1 chunk
    fp = FpConfig(16, 7)
    vals = np.array([0.25, -0.5, 0.875, 0.0, -0.9921875, 0.9921875, 0.125,
                     -0.25], np.float32)
    blind = [int(x) for x in
             __import__("rofl_tpu.ops.sc", fromlist=["sc"]).unpack_scalars(
                 pedersen.rnd_scalar_limbs(8, rng))]
    t0 = time.time()
    proofs, commits = rpv.create_rangeproof(vals, blind, fp, 8, 1, rng)
    print(f"rangeproof create d=8: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    ok = rpv.verify_rangeproof(proofs, commits, fp, 8, rng)
    print(f"rangeproof verify: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok

    # timing: randproof at d=16384 (the round-1 bench point)
    d = 16384
    m = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    r = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    t0 = time.time()
    proof, c = sigma.rand_proof_prove(m, r, rng)
    sync(proof.z_m)
    print(f"randproof d=16384 compile+1: {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        proof, c = sigma.rand_proof_prove(m, r, rng)
        sync(proof.z_m)
        sync(c.L.x)
        print(f"randproof d=16384: {time.time()-t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
