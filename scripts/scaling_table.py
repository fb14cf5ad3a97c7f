#!/usr/bin/env python
"""Prove-path scaling table (VERDICT r3 item 4).

Runs the chunk-batched range-proof prover single-device and mesh-sharded
over N virtual CPU devices, checks the proofs are byte-identical, and
writes benchmarks/SCALING_r4.md with wall times and per-device work.

Interpretation caveat (stated in the output): virtual CPU devices SHARE
the host's physical cores, so wall-clock does not improve with N here —
the table demonstrates (a) correctness of the distribution and (b) the
per-device lane-count reduction, which is what rides ICI on a real pod
slice. The 1-chip absolute numbers come from bench.py on the real TPU.

Usage: python scripts/scaling_table.py [--d 4096] [--parts 8]
"""
import argparse
import os
import sys
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from rofl_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=4096)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--out", default="benchmarks/SCALING_r5.md")
    args = ap.parse_args()

    from rofl_tpu.crypto import pedersen
    from rofl_tpu.crypto import range_proof_vec as rpv
    from rofl_tpu.crypto.fp_codec import FpConfig
    from rofl_tpu.parallel import mesh as pmesh

    fp = FpConfig(16, 7)
    d, parts = args.d, args.parts
    rng = np.random.default_rng(9)
    lo, hi = fp.clip_bounds(8)
    vals = (rng.uniform(lo, hi, d) * 0.5).astype(np.float32)
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, np.random.default_rng(3)))

    def run(mesh):
        return rpv.create_rangeproof(
            vals, blind, fp, 8, parts, np.random.default_rng(7), mesh=mesh)

    rows = []
    # warm + time single-device
    run(None)
    t0 = time.time()
    ref_proofs, _ = run(None)
    t1 = time.time() - t0
    rows.append(("1 (no mesh)", d * 8, round(t1, 2)))

    for n_dev in (2, 4, 8):
        mesh = pmesh.param_mesh(n_dev)
        with mesh:
            run(mesh)                      # warm
            t0 = time.time()
            proofs, _ = run(mesh)
            dt = time.time() - t0
        assert all(a.to_bytes() == b.to_bytes()
                   for a, b in zip(ref_proofs, proofs)), "proofs diverged"
        rows.append((str(n_dev), d * 8 // n_dev, round(dt, 2)))

    # -- verify mega-MSM (server side; VERDICT r4 item 4) ------------------
    _, commits = run(None)
    vrows = []

    def vrun(mesh):
        return rpv.verify_rangeproof(ref_proofs, commits, fp, 8,
                                     np.random.default_rng(21), mesh=mesh)

    assert vrun(None)
    t0 = time.time()
    assert vrun(None)
    vrows.append(("1 (no mesh)", 2 * d * 8, round(time.time() - t0, 2)))
    for n_dev in (2, 4, 8):
        mesh = pmesh.param_mesh(n_dev)
        with mesh:
            assert vrun(mesh)              # warm + correct
            t0 = time.time()
            assert vrun(mesh)
            dt = time.time() - t0
        vrows.append((str(n_dev), 2 * d * 8 // n_dev, round(dt, 2)))

    # -- Σ-plane (per-param hot loop of Range mode; r4 missing #6) ---------
    from rofl_tpu.crypto import sigma

    m_limbs = jnp.asarray(fp.f32_to_scalar_limbs(vals))
    srows = []

    def srun(mesh):
        p, c = sigma.rand_proof_prove(
            m_limbs, blind, np.random.default_rng(13), mesh=mesh)
        ok = sigma.rand_proof_verify(p, c, mesh=mesh)
        return p, c, bool(np.asarray(ok).all())

    ref_sp, ref_sc, ok = srun(None)
    assert ok
    t0 = time.time()
    srun(None)
    srows.append(("1 (no mesh)", d, round(time.time() - t0, 2)))
    for n_dev in (2, 4, 8):
        mesh = pmesh.param_mesh(n_dev)
        with mesh:
            sp, scm, ok = srun(mesh)       # warm + correct
            assert ok
            t0 = time.time()
            srun(mesh)
            dt = time.time() - t0
        assert np.array_equal(np.asarray(ref_sp.z_m), np.asarray(sp.z_m))
        assert np.array_equal(np.asarray(ref_sp.z_r), np.asarray(sp.z_r))
        srows.append((str(n_dev), -(-d // n_dev), round(dt, 2)))

    lines = [
        "# Prove-path scaling (virtual CPU mesh)",
        "",
        f"Chunk-batched range-proof prover, d={d}, n_partition={parts}, "
        "A/S + IPA L/R MSMs mesh-routed over 'param' "
        "(crypto/range_proof.py:_msm_grouped).",
        "",
        "Proofs verified BYTE-IDENTICAL to the single-device prover at "
        "every mesh size.",
        "",
        "| devices | MSM term-lanes per device | prove wall s |",
        "|---|---|---|",
    ]
    for name, lanes, dt in rows:
        lines.append(f"| {name} | {lanes} | {dt} |")
    lines += [
        "",
        "## Verify mega-MSM (server side)",
        "",
        f"All {parts} chunks verify as one random-linear-combination MSM; "
        "terms shard over 'param' (parallel/mesh.py sharded_msm: local "
        "MSM + all_gather of single-point partials on ICI).",
        "",
        "| devices | MSM term-lanes per device | verify wall s |",
        "|---|---|---|",
    ]
    for name, lanes, dt in vrows:
        lines.append(f"| {name} | {lanes} | {dt} |")
    lines += [
        "",
        "## Σ-plane (batched RandProof prove+verify)",
        "",
        "Per-lane elementwise cores under explicit 'param' lane shardings "
        "(crypto/sigma.py mesh routing) — zero collectives; z_m/z_r "
        "responses asserted bit-identical at every mesh size.",
        "",
        "| devices | Σ lanes per device | prove+verify wall s |",
        "|---|---|---|",
    ]
    for name, lanes, dt in srows:
        lines.append(f"| {name} | {lanes} | {dt} |")
    lines += [
        "",
        "Caveat: virtual devices share this host's 2 physical cores, so",
        "wall-clock cannot improve with N here; the table demonstrates",
        "correct distribution and the per-device work reduction that",
        "translates to real chips over ICI (chunks are device-local; the",
        "prove flow has no cross-device collective). Absolute 1-chip",
        "numbers: benchmarks/RESULTS_r5.md (bench.py on the real v5e).",
        "",
    ]
    with open(os.path.join(REPO, args.out), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
