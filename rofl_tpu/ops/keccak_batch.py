"""Batched Keccak-f[1600] on device — uint32 lane pairs, (50, N) layout.

Powers the batched Merlin transcripts (crypto.batch_transcript): the
reference runs one fresh Merlin transcript PER PARAMETER for the Σ-protocol
vectors (rand_proof_vec/mod.rs:30-33 — rayon); here all N transcripts are
data-parallel sponge states and one permutation call advances every
transcript at once on the VPU.

64-bit lanes are split into (lo, hi) uint32 halves: lane l of the state
lives at rows 2l (low 32 bits) and 2l+1 (high). Validated against
spec.keccak (hashlib-pinned).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol64(lo, hi, r):
    r %= 64
    if r == 0:
        return lo, hi
    if r >= 32:
        lo, hi = hi, lo
        r -= 32
    if r == 0:
        return lo, hi
    return (lo << r) | (hi >> (32 - r)), (hi << r) | (lo >> (32 - r))


def _round(lanes, rc_lo, rc_hi):
    """One Keccak-f round on 5×5 (lo, hi) lane pairs; rc as uint32 halves
    (traced scalars under jit so all 24 rounds share ONE loop body — the
    unrolled form was ~10k HLO ops per permutation and the dominant
    compile cost of every transcript-bearing jit)."""
    # theta
    C = []
    for x in range(5):
        lo = lanes[x][0][0]
        hi = lanes[x][0][1]
        for y in range(1, 5):
            lo = lo ^ lanes[x][y][0]
            hi = hi ^ lanes[x][y][1]
        C.append((lo, hi))
    D = []
    for x in range(5):
        rl, rh = _rol64(C[(x + 1) % 5][0], C[(x + 1) % 5][1], 1)
        D.append((C[(x - 1) % 5][0] ^ rl, C[(x - 1) % 5][1] ^ rh))
    for x in range(5):
        for y in range(5):
            lanes[x][y] = (lanes[x][y][0] ^ D[x][0], lanes[x][y][1] ^ D[x][1])
    # rho + pi
    B = [[None] * 5 for _ in range(5)]
    for x in range(5):
        for y in range(5):
            B[y][(2 * x + 3 * y) % 5] = _rol64(*lanes[x][y], _ROT[x][y])
    # chi
    for x in range(5):
        for y in range(5):
            lanes[x][y] = (
                B[x][y][0] ^ (~B[(x + 1) % 5][y][0] & B[(x + 2) % 5][y][0]),
                B[x][y][1] ^ (~B[(x + 1) % 5][y][1] & B[(x + 2) % 5][y][1]),
            )
    # iota
    lanes[0][0] = (lanes[0][0][0] ^ rc_lo, lanes[0][0][1] ^ rc_hi)
    return lanes


def _to_lanes(state):
    return [
        [(state[2 * (x + 5 * y)], state[2 * (x + 5 * y) + 1]) for y in range(5)]
        for x in range(5)
    ]


def _from_lanes(lanes, xp):
    out = [None] * 50
    for x in range(5):
        for y in range(5):
            out[2 * (x + 5 * y)] = lanes[x][y][0]
            out[2 * (x + 5 * y) + 1] = lanes[x][y][1]
    return xp.stack(out)


def _f1600_body(state, xp):
    """Backend-generic permutation body (xp = jnp under trace, np on host)."""
    lanes = [
        [(state[2 * (x + 5 * y)], state[2 * (x + 5 * y) + 1]) for y in range(5)]
        for x in range(5)
    ]

    for rc in _RC:
        # theta
        C = []
        for x in range(5):
            lo = lanes[x][0][0]
            hi = lanes[x][0][1]
            for y in range(1, 5):
                lo = lo ^ lanes[x][y][0]
                hi = hi ^ lanes[x][y][1]
            C.append((lo, hi))
        D = []
        for x in range(5):
            rl, rh = _rol64(C[(x + 1) % 5][0], C[(x + 1) % 5][1], 1)
            D.append((C[(x - 1) % 5][0] ^ rl, C[(x - 1) % 5][1] ^ rh))
        for x in range(5):
            for y in range(5):
                lanes[x][y] = (lanes[x][y][0] ^ D[x][0], lanes[x][y][1] ^ D[x][1])
        # rho + pi
        B = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B[y][(2 * x + 3 * y) % 5] = _rol64(*lanes[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                lanes[x][y] = (
                    B[x][y][0] ^ (~B[(x + 1) % 5][y][0] & B[(x + 2) % 5][y][0]),
                    B[x][y][1] ^ (~B[(x + 1) % 5][y][1] & B[(x + 2) % 5][y][1]),
                )
        # iota
        lanes[0][0] = (
            lanes[0][0][0] ^ xp.uint32(rc & 0xFFFFFFFF),
            lanes[0][0][1] ^ xp.uint32(rc >> 32),
        )

    out = [None] * 50
    for x in range(5):
        for y in range(5):
            out[2 * (x + 5 * y)] = lanes[x][y][0]
            out[2 * (x + 5 * y) + 1] = lanes[x][y][1]
    return xp.stack(out)


_RC_ARR = np.array(
    [[rc & 0xFFFFFFFF, rc >> 32] for rc in _RC], dtype=np.uint32)


@jax.jit
def keccak_f1600(state: jnp.ndarray) -> jnp.ndarray:
    """state: (50, N) uint32; rows (2l, 2l+1) = lane A[x][y], l = x + 5y.

    fori_loop over the 24 rounds (identical bodies, RC table-indexed): the
    traced graph is one round (~400 ops) instead of 24 unrolled — this is
    what makes transcript-bearing jits compile in seconds rather than tens
    of minutes on XLA:CPU (round-2 dryrun regression root cause)."""
    rc = jnp.asarray(_RC_ARR)

    def body(i, st):
        lanes = _round(_to_lanes(st), rc[i, 0], rc[i, 1])
        return _from_lanes(lanes, jnp)

    return jax.lax.fori_loop(0, 24, body, state)


def keccak_f1600_np(state: np.ndarray) -> np.ndarray:
    """Host (numpy) permutation for eager transcript driving: vectorized
    over N, no per-op XLA dispatch."""
    return _f1600_body(np.asarray(state), np)


def state_from_bytes(b: np.ndarray) -> np.ndarray:
    """(N, 200) uint8 → (50, N) uint32 words (little-endian)."""
    b = np.asarray(b, dtype=np.uint32).reshape(-1, 200)
    words = (
        b[:, 0::4] | (b[:, 1::4] << 8) | (b[:, 2::4] << 16) | (b[:, 3::4] << 24)
    )  # (N, 50)
    return words.T.copy()


def state_to_bytes(words: np.ndarray) -> np.ndarray:
    """(50, N) uint32 → (N, 200) uint8."""
    words = np.asarray(words)
    n = words.shape[1]
    out = np.zeros((n, 200), dtype=np.uint8)
    w = words.T
    out[:, 0::4] = w & 0xFF
    out[:, 1::4] = (w >> 8) & 0xFF
    out[:, 2::4] = (w >> 16) & 0xFF
    out[:, 3::4] = (w >> 24) & 0xFF
    return out
