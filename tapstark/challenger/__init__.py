"""Blake3 duplex-sponge Fiat-Shamir challenger.

Behavioral port of the reference BfChallenger
(/root/reference/basic/src/challenger/mod.rs):

- State: 16 u32 words (64 bytes). Rate = WIDTH/2 = 8 words.
- Permutation (`Blake3Permutation::permute_mut`, mod.rs:34-48): blake3-hash
  the 64-byte LE state; new state = 8 zero words || 8 hash words.
- observe(word): clears the output buffer, buffers the word; duplexes when
  8 words are buffered (input words overwrite state[0..len]).
- sample: pops from the END of the output buffer (state[15] first); base
  sample = 1 word mod p, extension sample = 4 words (coefficients in pop
  order), duplexing whenever inputs are pending or outputs are exhausted.
- sample_bits(b) = first-base-coefficient >> (32 - b)  (mod.rs:341-348).
- PoW grind: witness w such that after observe(w) + observe(0)*7,
  sample_bits(bits) == 0 (mod.rs:94-114). The reference searches with rayon
  find_any (nondeterministic winner); this implementation deterministically
  returns the SMALLEST witness, searched as a vectorized blake3 batch.

The transcript is host-side state machine; the grind is the only heavy part
and runs as a batched kernel (numpy on host, jnp on device).
"""

from __future__ import annotations

import numpy as np

from ..field.constants import P
from ..field.scalar import EF4, F
from ..hashes.blake3 import blake3, compress_batch

WIDTH = 16
RATE = WIDTH // 2


def _jnp():
    import jax.numpy as jnp

    return jnp


def jnp_argwhere_first(ok):
    """Index of the first True, or len(ok) when none (jit-friendly)."""
    jnp = _jnp()
    any_hit = jnp.any(ok)
    first = jnp.argmax(ok)
    return jnp.where(any_hit, first, ok.shape[0])


class Blake3Permutation:
    def permute(self, words: list[int]) -> list[int]:
        data = b"".join(int(w).to_bytes(4, "little") for w in words)
        h = blake3(data)
        return [0] * 8 + [int.from_bytes(h[i * 4 : i * 4 + 4], "little") for i in range(8)]


class BfChallenger:
    """field='ext' samples EF4 (the protocol's Challenge field); field='base'
    samples BabyBear. PF = u32 words."""

    def __init__(self, field: str = "ext", permutation: Blake3Permutation | None = None):
        assert field in ("base", "ext")
        self.field = field
        self.permutation = permutation or Blake3Permutation()
        self.sponge_state: list[int] = [0] * WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []
        # Records for the Bitcoin-script challenger replay (DSL layer).
        self.permutation_input_records: list[list[int]] = []
        self.permutation_output_records: list[list[int]] = []
        self.sample_input: list[list[int]] = []
        self.sample_output: list[object] = []
        self.grind_bits: int | None = None
        self.grind_output: object = None
        # Operation log for the challenger-consistency script replay
        # (the DSL layer's equivalent of the reference's BfChallengerExpr).
        self.op_log: list[tuple] = []

    # -- core sponge -------------------------------------------------------
    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= WIDTH
        for i, w in enumerate(self.input_buffer):
            self.sponge_state[i] = w
        self.input_buffer.clear()
        self.permutation_input_records.append(list(self.sponge_state))
        self.sponge_state = self.permutation.permute(self.sponge_state)
        self.permutation_output_records.append(list(self.sponge_state[RATE:]))
        self.output_buffer = list(self.sponge_state[RATE:])

    def observe(self, word: int) -> None:
        self.op_log.append(("observe", int(word) & 0xFFFFFFFF))
        self.output_buffer.clear()
        self.input_buffer.append(int(word) & 0xFFFFFFFF)
        if len(self.input_buffer) == RATE:
            self._duplexing()

    def observe_u32s(self, words) -> None:
        for w in words:
            self.observe(w)

    def observe_commitment(self, roots: list[list[int]]) -> None:
        """Observe a TapTreeMmcs commitment: Vec<[U32; 8]> word by word."""
        for root in roots:
            self.observe_u32s(root)

    def _pop(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    # -- sampling ----------------------------------------------------------
    def sample(self):
        words = []
        if self.field == "base":
            w = self._pop()
            words.append(w)
            res = F(w % P)
        else:
            coeffs = []
            for _ in range(4):
                w = self._pop()
                words.append(w)
                coeffs.append(w % P)
            res = EF4(coeffs)
        self.sample_input.append(words)
        self.sample_output.append(res)
        self.op_log.append(("sample", self.field, words, res))
        return res

    def sample_bits(self, bits: int) -> int:
        assert bits < 64
        rand_f = self.sample()
        rand_usize = rand_f.as_canonical_u32() if isinstance(rand_f, F) else rand_f.as_usize()
        result = rand_usize >> (32 - bits)
        self.op_log.append(("sample_bits", bits, result))
        return result

    # -- proof of work -----------------------------------------------------
    def check_witness(self, bits: int, witness: int) -> bool:
        self.observe(witness)
        for _ in range(7):
            self.observe(0)
        return self.sample_bits(bits) == 0

    def _grind_batch_ok(self, ws, bits: int, xp=np):
        """Vectorized check over candidate witnesses (current sponge capacity)."""
        cap = self.sponge_state[RATE:]
        shape = ws.shape
        blocks = [xp.asarray(ws, dtype=xp.uint32)]
        blocks += [xp.zeros(shape, xp.uint32)] * 7
        blocks += [xp.full(shape, w, xp.uint32) for w in cap]
        out = compress_batch(xp, blocks)
        first = out[7] % xp.uint32(P)  # sample pops state[15] = hash word 7 first
        return (first >> xp.uint32(32 - bits)) == 0

    def grind(self, bits: int, batch: int | None = None, use_device: bool | None = None) -> int:
        """Deterministic: returns the smallest valid witness and advances the
        transcript exactly like check_witness on it. High-difficulty grinds
        (>= 20 bits) run the blake3 batch as a jitted device kernel."""
        assert not self.input_buffer, "grind expects a drained input buffer"
        if use_device is None:
            use_device = bits >= 20
        if batch is None:
            batch = 1 << 22 if use_device else 1 << 14
        check_fn = None
        if use_device:
            import jax

            check_fn = jax.jit(
                lambda ws: jnp_argwhere_first(self._grind_batch_ok(ws, bits, _jnp()))
            )
        start = 0
        witness = None
        while start < 1 << 32:
            ws = np.arange(start, min(start + batch, 1 << 32), dtype=np.uint64).astype(
                np.uint32
            )
            if check_fn is not None:
                hit = int(check_fn(ws))
                idx = np.array([hit]) if hit < ws.size else np.array([], dtype=int)
                idx = idx[idx >= 0]
            else:
                idx = np.flatnonzero(self._grind_batch_ok(ws, bits))
            if idx.size:
                witness = int(ws[idx[0]])
                break
            start += batch
        if witness is None:
            raise RuntimeError("failed to find grind witness")
        assert self.check_witness(bits, witness)
        self.grind_bits = bits
        self.grind_output = self.sample_output[-1]
        return witness


class TestPermutation:
    """Deterministic fake permutation (state reversal) for fast protocol
    tests — the reference's only fake backend (fri/tests/fri.rs:34-48)."""

    def permute(self, words: list[int]) -> list[int]:
        return list(reversed(words))
