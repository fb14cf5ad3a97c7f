"""N data-parallel Merlin transcripts with a shared static schedule.

The reference proves each parameter under its own fresh transcript
(`Transcript::new(b"RandProof")` per element, rand_proof_vec/mod.rs:30-33).
Because every element runs the SAME sequence of appends/challenges (only the
absorbed bytes differ), the STROBE byte positions, flags and permutation
points are identical across the batch — so all N sponges advance in lockstep
with batched keccak-f1600 calls (ops.keccak_batch) on TPU, while the
schedule itself (pos/pos_begin/flags) stays static Python.

Bit-exact with spec.merlin (which is pinned to merlin's published vector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import keccak_batch, sc
from ..spec.merlin import (
    FLAG_A, FLAG_C, FLAG_I, FLAG_K, FLAG_M, FLAG_T, STROBE_R, Strobe128,
)


def _u32le_bytes(n: int) -> bytes:
    return int(n).to_bytes(4, "little")


class BatchStrobe:
    """Batched STROBE-128; data is (L, N) uint32 byte columns or const bytes.

    Runs on the host (numpy) until traced data arrives: eager use pays zero
    per-byte XLA dispatches, and under jit the constant schedule prefix
    (protocol label, domain separators) is folded on the host at trace time —
    only post-promotion ops enter the traced program.
    """

    def __init__(self, n: int, template: Strobe128):
        state_bytes = np.tile(np.frombuffer(bytes(template.state), np.uint8), (n, 1))
        self.state = keccak_batch.state_from_bytes(state_bytes)  # numpy
        self.on_device = False
        self.n = n
        self.pos = template.pos
        self.pos_begin = template.pos_begin
        self.cur_flags = template.cur_flags

    # -- backend handling ---------------------------------------------------

    @property
    def xp(self):
        return jnp if self.on_device else np

    def _promote(self):
        if not self.on_device:
            self.state = jnp.asarray(self.state)
            self.on_device = True

    def _coerce(self, val):
        """Route array data to the current backend; tracers force promotion."""
        if isinstance(val, jax.core.Tracer):
            self._promote()
            return val
        if isinstance(val, jax.Array):
            return val if self.on_device else np.asarray(val)
        return val

    # -- internals ---------------------------------------------------------

    def _xor_byte(self, pos: int, val):
        w, sh = divmod(pos, 4)
        if isinstance(val, (int, np.integer)):
            if val == 0:
                return
            v = self.xp.uint32(int(val) << (8 * sh))
        else:
            val = self._coerce(val)
            v = val.astype(self.xp.uint32) << (8 * sh)
        if self.on_device:
            self.state = self.state.at[w].set(self.state[w] ^ v)
        else:
            self.state[w] = self.state[w] ^ v

    def _set_byte(self, pos: int, val):
        w, sh = divmod(pos, 4)
        mask = self.xp.uint32(~(0xFF << (8 * sh)) & 0xFFFFFFFF)
        if isinstance(val, (int, np.integer)):
            v = self.xp.uint32(int(val) << (8 * sh))
        else:
            val = self._coerce(val)
            v = val.astype(self.xp.uint32) << (8 * sh)
        if self.on_device:
            self.state = self.state.at[w].set((self.state[w] & mask) | v)
        else:
            self.state[w] = (self.state[w] & mask) | v

    def _get_byte(self, pos: int):
        w, sh = divmod(pos, 4)
        return (self.state[w] >> (8 * sh)) & self.xp.uint32(0xFF)

    def _run_f(self):
        self._xor_byte(self.pos, self.pos_begin)
        self._xor_byte(self.pos + 1, 0x04)
        self._xor_byte(STROBE_R + 1, 0x80)
        if self.on_device:
            self.state = keccak_batch.keccak_f1600(self.state)
        else:
            self.state = keccak_batch.keccak_f1600_np(self.state)
        self.pos = 0
        self.pos_begin = 0

    def _xor_segment(self, rows: list):
        """XOR `rows` (byte values: ints and/or (N,) vectors) into the state
        at byte positions pos..pos+len-1, as word-aligned ops.

        One dynamic-free slice-XOR per segment instead of one scatter per
        byte — the per-byte form made every transcript-bearing jit's graph
        ~30x larger and was a main driver of the round-2 compile blowups."""
        pos, seg = self.pos, len(rows)
        if seg == 0:
            return
        w0, off = pos // 4, pos % 4
        W = (off + seg + 3) // 4
        if all(isinstance(b, (int, np.integer)) for b in rows):
            buf = np.zeros(4 * W, np.uint8)
            buf[off:off + seg] = rows
            b32 = buf.astype(np.uint32)
            words = (b32[0::4] | (b32[1::4] << 8)
                     | (b32[2::4] << 16) | (b32[3::4] << 24))
            if not words.any():
                return
            delta = words[:, None].astype(np.uint32)
            if self.on_device:
                delta = jnp.asarray(delta)
        else:
            xp = self.xp
            zero = None
            full = []
            for b in rows:
                if isinstance(b, (int, np.integer)):
                    if zero is None:
                        zero = xp.zeros_like(self._coerce(next(
                            r for r in rows
                            if not isinstance(r, (int, np.integer)))))
                    full.append(zero + xp.uint32(int(b)) if int(b) else zero)
                else:
                    full.append(self._coerce(b).astype(xp.uint32))
            pad_front = [xp.zeros_like(full[0])] * off
            pad_back = [xp.zeros_like(full[0])] * (4 * W - off - seg)
            arr = xp.stack(pad_front + full + pad_back)        # (4W, N)
            delta = (arr[0::4] | (arr[1::4] << 8) | (arr[2::4] << 16)
                     | (arr[3::4] << 24))
        if self.on_device:
            self.state = self.state.at[w0:w0 + W].set(
                self.state[w0:w0 + W] ^ delta)
        else:
            self.state[w0:w0 + W] ^= delta

    def _absorb_iter(self, byte_iter):
        rows = list(byte_iter)
        i = 0
        while i < len(rows):
            seg = min(STROBE_R - self.pos, len(rows) - i)
            self._xor_segment(rows[i:i + seg])
            self.pos += seg
            i += seg
            if self.pos == STROBE_R:
                self._run_f()

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert self.cur_flags == flags
            return
        assert flags & FLAG_T == 0
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_iter([old_begin, flags])
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    def _iter_data(self, data) -> list:
        """bytes → list of const ints; array (L, N) → list of row vectors."""
        if isinstance(data, (bytes, bytearray)):
            return list(data)
        data = self._coerce(data)
        return [data[i] for i in range(data.shape[0])]

    # -- STROBE ops used by merlin ----------------------------------------

    def meta_ad(self, data, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb_iter(self._iter_data(data))

    def ad(self, data, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_iter(self._iter_data(data))

    def prf(self, n_bytes: int, more: bool):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        xp = self.xp
        chunks = []
        taken = 0
        while taken < n_bytes:
            seg = min(STROBE_R - self.pos, n_bytes - taken)
            w0, off = self.pos // 4, self.pos % 4
            W = (off + seg + 3) // 4
            words = self.state[w0:w0 + W]                      # (W, N)
            rows = [None] * (4 * W)
            for s in range(4):
                sh = (words >> xp.uint32(8 * s)) & xp.uint32(0xFF)
                for w in range(W):
                    rows[4 * w + s] = sh[w]
            chunks.append(xp.stack(rows[off:off + seg]))       # (seg, N)
            # zeroize the read bytes (KEY/PRF semantics): constant per-word
            # masks, partial boundary words keep their other bytes
            mask = np.full(W, 0xFFFFFFFF, np.uint32)
            for i in range(seg):
                w, sh = divmod(off + i, 4)
                mask[w] &= ~np.uint32(0xFF << (8 * sh))
            if self.on_device:
                self.state = self.state.at[w0:w0 + W].set(
                    words & jnp.asarray(mask[:, None]))
            else:
                self.state[w0:w0 + W] = words & mask[:, None]
            self.pos += seg
            taken += seg
            if self.pos == STROBE_R:
                self._run_f()
        return xp.concatenate(chunks) if len(chunks) > 1 else chunks[0]


class BatchTranscript:
    """merlin::Transcript × N, lockstep schedule."""

    def __init__(self, label: bytes, n: int):
        # Constant prefix (protocol init + domain-sep label) is computed once
        # on the host spec implementation and broadcast.
        template = Strobe128(b"Merlin v1.0")
        template.meta_ad(b"dom-sep", False)
        template.meta_ad(_u32le_bytes(len(label)), True)
        template.ad(label, False)
        self.strobe = BatchStrobe(n, template)
        self.n = n

    def append_message(self, label: bytes, message, length: int | None = None):
        """message: bytes (broadcast) or (L, N) uint32 byte columns."""
        if isinstance(message, (bytes, bytearray)):
            length = len(message)
        else:
            length = message.shape[0] if length is None else length
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le_bytes(length), True)
        self.strobe.ad(message, False)

    def challenge_bytes(self, label: bytes, n_bytes: int) -> jnp.ndarray:
        self.strobe.meta_ad(label, False)
        self.strobe.meta_ad(_u32le_bytes(n_bytes), True)
        return self.strobe.prf(n_bytes, False)

    def challenge_scalars(self, label: bytes) -> jnp.ndarray:
        """64 challenge bytes → canonical scalars (16, N), on device
        (rand_proof/transcript.rs:40-44 semantics)."""
        return sc.reduce_wide_bytes(self.challenge_bytes(label, 64))


# -- byte-column helpers -----------------------------------------------------


def scalar_byte_cols(limbs: jnp.ndarray) -> jnp.ndarray:
    """Canonical scalar limbs (16, N) → (32, N) byte columns (LE)."""
    rows = []
    for k in range(16):
        rows.append(limbs[k] & 0xFF)
        rows.append((limbs[k] >> 8) & 0xFF)
    return jnp.stack(rows)


def field_byte_cols(limbs: jnp.ndarray) -> jnp.ndarray:
    """Canonical field-element limbs (e.g. compressed points) → (32, N)."""
    return scalar_byte_cols(limbs)


def concat_cols(*cols) -> jnp.ndarray:
    return jnp.concatenate(cols, axis=0)
