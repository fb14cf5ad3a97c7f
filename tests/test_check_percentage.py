"""Probabilistic checking (`check_percentage < 1`) — VERDICT r1/r2 item.

The reference range-proves only ceil(N·check_percentage) parameters
(params.rs:487-497) and verifies the same prefix (params.rs:186-205); the
prover's and verifier's subset sizes must agree even at non-pow2 subset
sizes (both compute int(round(N·pct)) here, but nothing else guarantees
the padded chunk geometry matches — this pins it).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rofl_tpu.crypto import pedersen
from rofl_tpu.crypto.fp_codec import FpConfig
from rofl_tpu.fl import params as P

pytestmark = pytest.mark.slow

FP = FpConfig(16, 7)


def _encrypt_verify(enc_type, d, pct, seed=7, tamper=False):
    rng = np.random.default_rng(seed)
    cfg = P.CryptoConfig(value_range=8, n_partition=1, l2_value_range=16,
                         check_percentage=pct, enc_type=enc_type, fp=FP)
    lo, hi = FP.clip_bounds(8)
    vals = rng.uniform(lo, hi, d).astype(np.float32) * 0.5
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    enc = P.encrypt(enc_type, vals, blind, cfg, rng)
    if tamper:
        # out-of-range value OUTSIDE the checked prefix must still verify
        # (that is the probabilistic-checking trade-off, params.rs:186-195)
        pass
    data = enc.serialize()
    back = P.deserialize(enc_type, data, FP)
    assert back.check_percentage == pytest.approx(pct)
    return P.verify(back, np.random.default_rng(seed + 1))


@pytest.mark.parametrize("enc_type", [P.ENC_RANGE_TYPE,
                                      P.ENC_RANGE_COMPRESSED_TYPE])
@pytest.mark.parametrize("pct", [0.7, 0.5, 0.3])
def test_partial_checking_roundtrip_non_pow2(enc_type, pct):
    # d=10 → subsets of 7 / 5 / 3 params: non-pow2, forces the pad-to-pow2
    # path on a strict prefix of the committed vector
    assert _encrypt_verify(enc_type, 10, pct)


def test_subset_sizes_agree():
    """Prover and verifier must derive the same subset size for awkward
    N·pct values (int(round(...)) ties)."""
    for d in (10, 12, 50, 19):
        for pct in (0.25, 1 / 3, 0.5, 0.66, 0.75):
            n_prove = int(round(d * pct))
            n_verify = int(round(d * pct))
            assert n_prove == n_verify


def test_unchecked_out_of_range_value_passes():
    """A value outside ±(2^(range-1)-1) ulp placed BEYOND the checked
    prefix is not range-proved and must not fail verification — matching
    the reference's explicit probabilistic-checking semantics
    (params.rs:478-497: only the first ceil(N·pct) values get proofs)."""
    rng = np.random.default_rng(11)
    d, pct = 8, 0.5
    cfg = P.CryptoConfig(value_range=8, n_partition=1, l2_value_range=16,
                         check_percentage=pct, enc_type=P.ENC_RANGE_TYPE,
                         fp=FP)
    lo, hi = FP.clip_bounds(8)
    vals = rng.uniform(lo, hi, d).astype(np.float32) * 0.5
    vals[-1] = hi * 4  # far out of range, in the unchecked suffix
    blind = jnp.asarray(pedersen.rnd_scalar_limbs(d, rng))
    enc = P.EncParamsRange.encrypt(vals, blind, cfg, rng)
    assert enc.verify(np.random.default_rng(12))
