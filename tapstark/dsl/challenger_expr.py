"""Challenger-consistency script: replays the Fiat-Shamir transcript
on-chain.

Reference parity: script_expr/src/challenger_expr.rs (BfChallengerExpr) — the
byte-level DSL twin of BfChallenger. This builder consumes the op_log of a
natively-run challenger and emits ONE script that:

  - recomputes every sponge permutation with the in-script blake3 gadget,
    carrying the capacity (output words) forward on the stack so successive
    permutations are genuinely chained;
  - converts sampled output words to field limbs mod p in-script and
    OP_EQUALVERIFYs them against the claimed challenge values
    (alpha, zeta, FRI betas, ...);
  - checks sample_bits extractions (query indices, PoW) via high-bit
    extraction on the sampled word.

Observed words (commitment roots, the PoW witness) enter as script constants
— on-chain these become the bit-committed values of the BitVM2 flow.
"""

from __future__ import annotations

from ..challenger import RATE
from ..field.scalar import EF4, F
from ..hashes.blake3 import blake3
from ..script import opcodes as op
from ..script.builder import ScriptBuilder
from .blake3_gadget import blake3_compress_gadget
from .u32 import (
    drop_xor_table,
    push_xor_table,
    u32_extract_high_bits,
    u32_pick,
    u32_push,
    u32_to_u31_f,
)


class ChallengerScriptBuilder:
    def __init__(self):
        self.sb = ScriptBuilder()
        self.pending: list[int] = []
        self.have_output = False
        self.buffer_len = 0  # unread output words (buffer = h_0..h_{len-1})
        self.state_cap: list[int] = [0] * 8  # host mirror of the capacity
        self.buffer_words: list[int] = []
        self.last_sample_first_word_j: int | None = None

    # -- script plumbing ---------------------------------------------------
    def _duplex(self) -> None:
        sb = self.sb
        m_lo = [self.pending[i] if i < len(self.pending) else 0 for i in range(RATE)]
        if self.have_output:
            # park h0..h7 (h7 popped first), push rate constants, restore
            for _ in range(32):
                sb.emit(op.OP_TOALTSTACK)
            for w in m_lo:
                sb.extend(u32_push(w))
            for _ in range(32):
                sb.emit(op.OP_FROMALTSTACK)
        else:
            for w in m_lo:
                sb.extend(u32_push(w))
            for _ in range(8):
                sb.extend(u32_push(0))
        sb.extend(blake3_compress_gadget())
        # host mirror
        data = b"".join(
            w.to_bytes(4, "little") for w in (m_lo + self.state_cap)
        )
        digest = blake3(data)
        out_words = [
            int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(8)
        ]
        self.state_cap = out_words
        self.buffer_words = list(out_words)
        self.buffer_len = 8
        self.have_output = True
        self.pending = []

    # -- transcript ops ----------------------------------------------------
    def observe(self, word: int) -> None:
        self.buffer_len = 0
        self.pending.append(word)
        if len(self.pending) == RATE:
            self._duplex()

    def sample(self, kind: str, words: list[int], value) -> None:
        limbs = value.as_u32_vec() if isinstance(value, (F, EF4)) else [value]
        n = 1 if kind == "base" else 4
        assert len(limbs) == n
        for l in range(n):
            if self.pending or self.buffer_len == 0:
                self._duplex()
            j = self.buffer_len - 1  # popped word = h_j
            assert self.buffer_words[j] == words[l], "op_log/sponge divergence"
            if l == 0:
                self.last_sample_first_word_j = j
            self.sb.extend(u32_pick(7 - j))
            self.sb.extend(u32_to_u31_f())
            self.sb.num(limbs[l]).emit(op.OP_EQUALVERIFY)
            self.buffer_len -= 1

    def sample_bits(self, bits: int, result: int) -> None:
        # sample_bits shifts the mod-p REDUCED first coefficient
        # (reference basic/src/challenger/mod.rs:341-348)
        from .gadgets import u31_shr_const

        j = self.last_sample_first_word_j
        assert j is not None
        self.sb.extend(u32_pick(7 - j))
        self.sb.extend(u32_to_u31_f())
        self.sb.extend(u31_shr_const(32 - bits))
        self.sb.num(result).emit(op.OP_EQUALVERIFY)

    # -- assembly ----------------------------------------------------------
    def finish(self) -> bytes:
        sb = ScriptBuilder()
        sb.extend(push_xor_table())
        sb.extend(self.sb)
        if self.have_output:
            for _ in range(16):
                sb.emit(op.OP_2DROP)
        sb.extend(drop_xor_table())
        sb.emit(op.OP_1)
        return sb.build()


def build_challenger_script(op_log: list[tuple]) -> bytes:
    """Compile a challenger op_log into the consistency script."""
    b = ChallengerScriptBuilder()
    for entry in op_log:
        if entry[0] == "observe":
            b.observe(entry[1])
        elif entry[0] == "sample":
            b.sample(entry[1], entry[2], entry[3])
        elif entry[0] == "sample_bits":
            b.sample_bits(entry[1], entry[2])
        else:
            raise AssertionError(entry[0])
    return b.finish()
