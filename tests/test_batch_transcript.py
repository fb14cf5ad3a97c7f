"""Batched keccak + batched Merlin vs the (vector-pinned) spec."""

import hashlib

import numpy as np
import jax.numpy as jnp

from rofl_tpu.crypto.batch_transcript import BatchTranscript, scalar_byte_cols
from rofl_tpu.ops import keccak_batch, sc
from rofl_tpu.spec import keccak as SK
from rofl_tpu.spec import scalar as SS
from rofl_tpu.spec.merlin import Transcript

import pytest

# default tier (VERDICT r4 item 5): completes in tens of
# seconds on 2 CPU cores with a warm cache — lockstep STROBE vs spec merlin at small N

rng = np.random.default_rng(5)


def test_batched_keccak_matches_spec():
    states = np.stack([np.frombuffer(rng.bytes(200), np.uint8) for _ in range(5)])
    words = jnp.asarray(keccak_batch.state_from_bytes(states))
    out = keccak_batch.state_to_bytes(np.asarray(keccak_batch.keccak_f1600(words)))
    for i in range(5):
        want = bytearray(states[i].tobytes())
        SK.keccak_f1600(want)
        assert bytes(out[i]) == bytes(want)


def test_batch_transcript_matches_spec():
    n = 4
    bt = BatchTranscript(b"test protocol", n)
    # per-element data: scalars
    vals = [int.from_bytes(rng.bytes(32), "little") % SS.L for _ in range(n)]
    cols = scalar_byte_cols(jnp.asarray(sc.pack_scalars(vals)))
    bt.append_message(b"some label", b"some data")
    bt.append_message(b"scalar", cols)
    chal = np.asarray(bt.challenge_bytes(b"challenge", 32))  # (32, n)
    scal = np.asarray(bt.challenge_scalars(b"c"))

    for i in range(n):
        t = Transcript(b"test protocol")
        t.append_message(b"some label", b"some data")
        t.append_message(b"scalar", SS.to_bytes(vals[i]))
        want = t.challenge_bytes(b"challenge", 32)
        assert bytes(chal[:, i].astype(np.uint8)) == want
        want_s = t.challenge_scalar(b"c")
        assert sc.unpack_scalars(scal[:, i : i + 1])[0] == want_s


def test_batch_transcript_long_absorb():
    # > STROBE_R bytes to cross permutation boundaries
    n = 2
    data = rng.integers(0, 256, size=(400, n), dtype=np.uint32)
    bt = BatchTranscript(b"proto", n)
    bt.append_message(b"big", jnp.asarray(data))
    got = np.asarray(bt.challenge_bytes(b"out", 48))
    for i in range(n):
        t = Transcript(b"proto")
        t.append_message(b"big", bytes(data[:, i].astype(np.uint8)))
        assert bytes(got[:, i].astype(np.uint8)) == t.challenge_bytes(b"out", 48)
