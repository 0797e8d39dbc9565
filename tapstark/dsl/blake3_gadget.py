"""Blake3 compression in Bitcoin Script.

Reference parity: scripts/src/hashes/blake3.rs (BitVM-style: state and
message words as u32 byte-quads, XOR via the half-bit table, G function with
rrot16/12/8/7). Used by the challenger-consistency scripts: the Fiat-Shamir
permutation is blake3 over the 64-byte sponge state, single block with
CHUNK_START|CHUNK_END|ROOT flags.

Gadget contract (single 64-byte block):
  stack in : [xor_table, m0..m15 quads (m15's LSB on top)]
  stack out: [xor_table, h0..h7 quads (h7's LSB on top)]
where h0..h7 are the first 8 output words (the 32-byte digest).
"""

from __future__ import annotations

from ..hashes.blake3 import CHUNK_END, CHUNK_START, IV, MSG_PERMUTATION, ROOT
from ..script import opcodes as op
from ..script.builder import ScriptBuilder
from .u32 import u32_pick, u32_push, u32_roll, u32_xor, u32_add, u32_rrot

_ROTS = (16, 12, 8, 7)


class _Env:
    """Tracks the order of u32 quads above the xor table (bottom first)."""

    def __init__(self, sb: ScriptBuilder, order: list[str]):
        self.sb = sb
        self.order = order

    def _qdepth(self, name: str) -> int:
        idx = self.order.index(name)
        return len(self.order) - 1 - idx

    def roll(self, name: str) -> None:
        self.sb.extend(u32_roll(self._qdepth(name)))
        self.order.remove(name)
        self.order.append(name)

    def pick(self, name: str, as_name: str = "_tmp") -> None:
        self.sb.extend(u32_pick(self._qdepth(name)))
        self.order.append(as_name)

    def add_top2(self, result: str) -> None:
        """[.., x, y] -> [.., x+y]"""
        self.sb.extend(u32_add())
        self.order.pop()
        self.order.pop()
        self.order.append(result)

    def xor_top2(self, result: str) -> None:
        junk = 4 * (len(self.order) - 2)
        self.sb.extend(u32_xor(table_junk=junk))
        self.order.pop()
        self.order.pop()
        self.order.append(result)

    def rrot_top(self, n: int) -> None:
        self.sb.extend(u32_rrot(n))


def blake3_compress_gadget(
    counter: int = 0,
    block_len: int = 64,
    flags: int = CHUNK_START | CHUNK_END | ROOT,
) -> ScriptBuilder:
    sb = ScriptBuilder()
    env = _Env(sb, [f"m{i}" for i in range(16)])

    # push the initial state v0..v15
    init = list(IV[:8]) + list(IV[:4]) + [
        counter & 0xFFFFFFFF,
        (counter >> 32) & 0xFFFFFFFF,
        block_len,
        flags,
    ]
    for i, w in enumerate(init):
        sb.extend(u32_push(w))
        env.order.append(f"v{i}")

    # message schedule: round r uses msg[perm^r]
    msg = [f"m{i}" for i in range(16)]

    def g(a: str, b: str, c: str, d: str, mx: str, my: str) -> None:
        # va = va + vb + mx
        env.roll(a)
        env.pick(b)
        env.add_top2("_t")
        env.pick(mx)
        env.add_top2(a)
        # vd = rrot16(vd ^ va)
        env.roll(d)
        env.pick(a)
        env.xor_top2("_t")
        env.rrot_top(16)
        env.order[-1] = d
        # vc = vc + vd
        env.roll(c)
        env.pick(d)
        env.add_top2(c)
        # vb = rrot12(vb ^ vc)
        env.roll(b)
        env.pick(c)
        env.xor_top2("_t")
        env.rrot_top(12)
        env.order[-1] = b
        # va = va + vb + my
        env.roll(a)
        env.pick(b)
        env.add_top2("_t")
        env.pick(my)
        env.add_top2(a)
        # vd = rrot8(vd ^ va)
        env.roll(d)
        env.pick(a)
        env.xor_top2("_t")
        env.rrot_top(8)
        env.order[-1] = d
        # vc = vc + vd
        env.roll(c)
        env.pick(d)
        env.add_top2(c)
        # vb = rrot7(vb ^ vc)
        env.roll(b)
        env.pick(c)
        env.xor_top2("_t")
        env.rrot_top(7)
        env.order[-1] = b

    for rnd in range(7):
        g("v0", "v4", "v8", "v12", msg[0], msg[1])
        g("v1", "v5", "v9", "v13", msg[2], msg[3])
        g("v2", "v6", "v10", "v14", msg[4], msg[5])
        g("v3", "v7", "v11", "v15", msg[6], msg[7])
        g("v0", "v5", "v10", "v15", msg[8], msg[9])
        g("v1", "v6", "v11", "v12", msg[10], msg[11])
        g("v2", "v7", "v8", "v13", msg[12], msg[13])
        g("v3", "v4", "v9", "v14", msg[14], msg[15])
        if rnd != 6:
            msg = [msg[p] for p in MSG_PERMUTATION]

    # outputs: h_i = v_i ^ v_{i+8}, parked on the altstack h7-first so the
    # final restore leaves [h0 .. h7(top)] (capacity-carry friendly order)
    for i in range(7, -1, -1):
        env.roll(f"v{i}")
        env.roll(f"v{i + 8}")
        env.xor_top2("_out")
        env.order.pop()
        for _ in range(4):
            sb.emit(op.OP_TOALTSTACK)
    # drop the 16 message quads (64 bytes)
    for _ in range(32):
        sb.emit(op.OP_2DROP)
    # restore outputs: [h0 .. h7(top)]
    for _ in range(32):
        sb.emit(op.OP_FROMALTSTACK)
    return sb
