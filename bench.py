"""Headline benchmark — prints ONE JSON line.

North-star metric (BASELINE.json): the full L2-constraint protocol path at
d=50000 on one chip — exactly what EncParamsL2 runs per client round
(params.rs:607-687): per-parameter L∞ Bulletproofs range proofs
(16 partitions), per-parameter square Σ-protocols on the existing range
commitments, and the single L2 sum range proof; then the server-side
verify of all three.

Baseline (c5d.4xlarge, AVX2, scaled to d=50k from BASELINE.md rows):
prove ≈ 3.2 s squarerandproof + 15.8 s rangeproof + 0.016 s L2 proof
= 19.0 s; verify ≈ 1.64 s + 1.10 s + 0.001 s = 2.7 s; total 21.7 s.

All timings force real device sync via host transfers (block_until_ready
through the tunnel does not wait).
"""

import json
import os
import sys
import time


def main():
    os.environ.setdefault("JAX_PLATFORMS", "axon")
    import jax

    from rofl_tpu.utils.cache import setup_cache

    setup_cache()

    import numpy as np
    import jax.numpy as jnp

    from rofl_tpu.crypto import pedersen
    from rofl_tpu.crypto.fp_codec import FpConfig
    from rofl_tpu.fl import params as P

    d = int(os.environ.get("ROFL_BENCH_D", 50000))
    n_part = int(os.environ.get("ROFL_BENCH_PART", 16))
    reps = int(os.environ.get("ROFL_BENCH_REPS", 2))
    fp = FpConfig(16, 7)
    cfg = P.CryptoConfig(value_range=8, n_partition=n_part, l2_value_range=16,
                         check_percentage=1.0, enc_type=P.ENC_L2_TYPE, fp=fp)
    rng = np.random.default_rng(7)
    # element scale per the reference's own L2 bench
    # (l2rangeproof_bench.rs:44-49): |v| <= sqrt(l2_bound/d)/2^frac/10 so the
    # fixed-point norm sum cannot overflow the 16-bit decode window. The
    # crypto cost is value-independent.
    elem = (fp.l2_clip_bound(16) / d) ** 0.5 / fp.scale / 10.0
    vals = rng.uniform(-elem, elem, d).astype(np.float32)
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))

    def prove():
        return P.EncParamsL2.encrypt(vals, blind, cfg, rng)

    t0 = time.time()
    enc = prove()  # warmup & compile
    warm = time.time() - t0

    prove_times = []
    for _ in range(reps):
        t0 = time.time()
        enc = prove()
        prove_times.append(time.time() - t0)

    t0 = time.time()
    ok = enc.verify(rng)
    verify_warm = time.time() - t0
    verify_times = []
    for _ in range(reps):
        t0 = time.time()
        ok = enc.verify(rng)
        verify_times.append(time.time() - t0)
    if not ok:
        print(json.dumps({"metric": "l2_path_error", "value": 0,
                          "unit": "", "vs_baseline": 0}))
        sys.exit(1)

    prove_s = min(prove_times)
    verify_s = min(verify_times)
    total = prove_s + verify_s
    baseline_total = 21.7  # c5d.4xlarge AVX2 @ d=50k (see docstring)
    result = {
        "metric": "l2_path_prove_verify_s_d50k",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(baseline_total / total, 3),
        "prove_s": round(prove_s, 3),
        "verify_s": round(verify_s, 3),
        "prove_params_per_s": round(d / prove_s, 1),
        "d": d,
        "n_partition": n_part,
        "warmup_s": round(warm + verify_warm, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
