#!/usr/bin/env python
"""Measure XLA:CPU compile cost of each crypto building block on the
8-virtual-device mesh — the budget model for dryrun_multichip and the test
suite (round-3: the r2 dryrun regression was a single fused Σ-protocol jit
whose GSPMD compile never finished)."""
import os
import time

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rofl_tpu.ops import curve, fe, sc  # noqa: E402
from rofl_tpu.parallel.mesh import make_mesh  # noqa: E402

mesh = make_mesh(2, 4)
N = 64


def t(name, fn):
    t0 = time.time()
    r = fn()
    jax.tree.map(lambda x: np.asarray(x), r)
    print(f"{name:42s} {time.time()-t0:7.2f}s", flush=True)
    return r


limbs = jnp.ones((16, N), jnp.uint32)
pt = curve.basepoint((N,))
pt = curve.PointArray(*[jnp.broadcast_to(c, (16, N)) for c in pt])
sh = NamedSharding(mesh, P(None, "param"))
limbs_sh = jax.device_put(limbs, sh)
pt_sh = curve.PointArray(*[jax.device_put(c, sh) for c in pt])

t("fe.mul", lambda: fe.mul(limbs, limbs))
t("fe.mul sharded", lambda: fe.mul(limbs_sh, limbs_sh))
t("curve.add", lambda: curve.add(pt, pt))
t("curve.add sharded", lambda: curve.add(pt_sh, pt_sh))
t("curve.scalar_mul (ladder)", lambda: curve.scalar_mul(pt, limbs))
t("curve.scalar_mul sharded", lambda: curve.scalar_mul(pt_sh, limbs_sh))
t("curve.compress", lambda: curve.compress(pt))
t("curve.compress sharded", lambda: curve.compress(pt_sh))
t("curve.tree_sum", lambda: curve.tree_sum(pt))

from rofl_tpu.ops import fixed_base  # noqa: E402
from rofl_tpu.crypto import pedersen  # noqa: E402

tb = pedersen.base_B().table
t("fixed_base.mul", lambda: fixed_base.mul(tb, limbs))
t("fixed_base.mul sharded", lambda: fixed_base.mul(tb, limbs_sh))

from rofl_tpu.crypto.batch_transcript import BatchTranscript  # noqa: E402


def transcript_prog():
    @jax.jit
    def f(cols):
        bt = BatchTranscript(b"x", N)
        bt.append_message(b"C", cols)
        return bt.challenge_scalars(b"c")

    return f(jnp.zeros((32, N), jnp.uint32))


t("batch transcript (1 absorb + chal)", transcript_prog)

from rofl_tpu.crypto import sigma  # noqa: E402

rng = np.random.default_rng(0)
m = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
r = jnp.asarray(pedersen.rnd_scalar_limbs(N, rng))
t("sigma.rand_proof_prove (fused jit)", lambda: sigma.rand_proof_prove(m, r, rng)[0].z_m)
m_sh = jax.device_put(m, sh)
r_sh = jax.device_put(r, sh)
t("sigma.rand_proof_prove SHARDED", lambda: sigma.rand_proof_prove(m_sh, r_sh, rng)[0].z_m)
