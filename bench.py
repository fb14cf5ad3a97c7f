"""Headline benchmark — prints ONE JSON line.

Metric: RandProof creation throughput (params/sec) at d=16384 on one chip —
the per-parameter ElGamal well-formedness Σ-protocol that dominates the
EncRange client path. Baseline: the reference's AVX2 Rust prover at
26.9k params/s (create-randproof-16-32768 = 1.22 s on c5d.4xlarge,
BASELINE.md), constant rate across d.

Includes the full pipeline as the reference measures it: commitments
(2 fixed-base muls + add per param), per-param Merlin transcripts
(batched keccak on device), challenge scalars, and responses.
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass

    import numpy as np
    import jax.numpy as jnp

    from rofl_tpu.crypto import pedersen, sigma
    from rofl_tpu.ops import curve

    d = int(os.environ.get("ROFL_BENCH_D", 16384))
    rng = np.random.default_rng(7)

    m = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    r = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))

    def run():
        proof, c = sigma.rand_proof_prove(m, r, rng)
        # materialize the proof bytes like the reference's bench loop
        jax.block_until_ready((proof.z_m, proof.z_r))
        return proof, c

    t0 = time.time()
    proof, c = run()  # warmup & compile
    warm = time.time() - t0

    times = []
    for _ in range(int(os.environ.get("ROFL_BENCH_REPS", 3))):
        t0 = time.time()
        run()
        times.append(time.time() - t0)

    best = min(times)
    rate = d / best
    baseline_rate = 32768 / 1.22  # create-randproof-16-32768 on c5d.4xlarge
    result = {
        "metric": "randproof_create_params_per_sec",
        "value": round(rate, 1),
        "unit": "params/s",
        "vs_baseline": round(rate / baseline_rate, 3),
        "d": d,
        "best_s": round(best, 4),
        "warmup_s": round(warm, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
