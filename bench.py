"""Headline benchmark — prints one JSON line per stage (last line wins).

North-star metric (BASELINE.json): the full L2-constraint protocol path at
d=50000 on one chip — exactly what EncParamsL2 runs per client round
(params.rs:607-687): per-parameter L∞ Bulletproofs range proofs
(16 partitions), per-parameter square Σ-protocols on the existing range
commitments, and the single L2 sum range proof; then the server-side
verify of all three.

Baseline (c5d.4xlarge, AVX2, scaled to d=50k from BASELINE.md rows):
prove ≈ 3.2 s squarerandproof + 15.8 s rangeproof + 0.016 s L2 proof
= 19.0 s; verify ≈ 1.64 s + 1.10 s + 0.001 s = 2.7 s; total 21.7 s.

Output discipline (VERDICT r3 item 1): earlier rounds printed nothing when
the d=50k compile exceeded the driver budget.  Stages now run smallest
first and EACH prints a complete JSON result line immediately (flushed),
so a timeout mid-run still leaves a parseable result:

  1. ElGamal pair-add throughput (compiles one kernel; BASELINE.md
     addelgamal row) — on the wire within minutes even on a cold cache;
  2. the L2 path at d=4096 (baseline scaled linearly);
  3. the L2 path at d=50000 — the headline.

All timings force real device sync via host transfers (block_until_ready
through the tunnel does not wait).
"""

import json
import os
import sys
import time


def emit(obj):
    print(json.dumps(obj), flush=True)


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
    from rofl_tpu.ops import curve

    device = str(jax.devices()[0])
    fp = FpConfig(16, 7)
    rng = np.random.default_rng(7)
    reps = int(os.environ.get("ROFL_BENCH_REPS", 2))

    # ---- stage 1: ElGamal vector add (server accumulate hot op) --------
    # baseline: 2.87 s per client pair-add at d=524288 (BASELINE.md,
    # large/bench_paper_addelgamal-524288) = 182.7k pairs/s
    try:
        d1 = int(os.environ.get("ROFL_BENCH_D_ADD", 131072))
        ks = jnp.asarray(pedersen.rnd_scalar_limbs(d1, rng))
        base = curve.basepoint((d1,))
        pts = curve.PointArray(
            *[jnp.broadcast_to(c, (16, d1)) for c in base])

        def pair_add():
            # one homomorphic accumulate = 2 point adds per param (L and R)
            a = curve.add(pts, pts)
            b = curve.add(pts, pts)
            return a.x, b.x

        t0 = time.time()
        jax.block_until_ready(pair_add())
        warm1 = time.time() - t0
        times = []
        for _ in range(max(reps, 3)):
            t0 = time.time()
            r = pair_add()
            np.asarray(r[0][0, :1])  # force device sync via host transfer
            times.append(time.time() - t0)
        dt = min(times)
        pairs_per_s = d1 / dt
        emit({
            "metric": "addelgamal_pairs_per_sec",
            "value": round(pairs_per_s, 1),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_s / (524288 / 2.87), 3),
            "d": d1, "best_s": round(dt, 4), "warmup_s": round(warm1, 1),
            "device": device,
        })
    except Exception as e:  # keep going — later stages may still land
        emit({"metric": "addelgamal_error", "value": 0, "unit": "",
              "vs_baseline": 0, "error": repr(e)[:200]})

    # ---- stages 2+3: the L2 path (north star) --------------------------
    n_part = int(os.environ.get("ROFL_BENCH_PART", 16))
    # one dim by default: stage 1 already guarantees an early parseable
    # line, and the d=4096 L2 stage costs ~13 min of trace+cache-load on
    # its own (measured warm, RESULTS_r4.md) without informing the
    # headline — run it via ROFL_BENCH_D=4096,50000 when wanted
    dims = os.environ.get("ROFL_BENCH_D", "50000")
    for d in [int(x) for x in dims.split(",") if x]:
        try:
            run_l2_path(P, pedersen, fp, d, n_part, reps, device)
        except Exception as e:
            emit({"metric": f"l2_path_error_d{d}", "value": 0, "unit": "",
                  "vs_baseline": 0, "error": repr(e)[:200]})


def run_l2_path(P, pedersen, fp, d, n_part, reps, device):
    import numpy as np
    import jax.numpy as jnp

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
        emit({"metric": f"l2_path_error_d{d}", "value": 0,
              "unit": "", "vs_baseline": 0, "error": "verify failed"})
        sys.exit(1)

    prove_s = min(prove_times)
    verify_s = min(verify_times)
    total = prove_s + verify_s
    # c5d.4xlarge AVX2 @ d=50k = 21.7 s (docstring); per-param costs
    # dominate, so scale linearly for other dims
    baseline_total = 21.7 * d / 50000.0
    emit({
        "metric": f"l2_path_prove_verify_s_d{d}",
        "value": round(total, 3),
        "unit": "s",
        "vs_baseline": round(baseline_total / total, 3),
        "prove_s": round(prove_s, 3),
        "verify_s": round(verify_s, 3),
        "prove_params_per_s": round(d / prove_s, 1),
        "d": d,
        "n_partition": n_part,
        "warmup_s": round(warm + verify_warm, 1),
        "device": device,
    })


if __name__ == "__main__":
    main()
