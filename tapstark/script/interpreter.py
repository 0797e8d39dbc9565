"""Tapscript interpreter — the simulator backend for every emitted script.

Fills the role bitcoin-scriptexec plays in the reference
(/root/reference/scripts/src/lib.rs:97-164): every verifier/commitment script
is actually executed in tests. Implements the Tapscript rules the framework's
scripts rely on: minimal data/number encodings, MINIMALIF, 4-byte numeric
operands, the 1000-element combined stack limit and 520-byte element limit.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from ..hashes.ripemd160 import hash160, ripemd160
from . import opcodes as op
from .builder import decode_num, encode_num

MAX_STACK = 1000
MAX_ELEMENT = 520


class ScriptError(Exception):
    pass


@dataclass
class ExecutionResult:
    success: bool
    final_stack: list[bytes]
    error: str | None = None
    op_count: int = 0
    max_stack: int = 0


def _truthy(b: bytes) -> bool:
    for i, v in enumerate(b):
        if v != 0:
            return not (i == len(b) - 1 and v == 0x80)
    return False


@dataclass
class _Exec:
    script: bytes
    stack: list[bytes]
    alt: list[bytes] = field(default_factory=list)
    pc: int = 0
    op_count: int = 0
    max_stack: int = 0
    stack_limit: int = MAX_STACK
    # each entry: (branch_taken, in_else)
    cond: list[bool] = field(default_factory=list)

    def pop(self) -> bytes:
        if not self.stack:
            raise ScriptError("stack underflow")
        return self.stack.pop()

    def popn(self) -> int:
        return decode_num(self.pop())

    def push(self, b: bytes) -> None:
        if len(b) > MAX_ELEMENT:
            raise ScriptError("element too large")
        self.stack.append(b)
        self._track()

    def pushn(self, n: int) -> None:
        self.push(encode_num(n))

    def _track(self) -> None:
        depth = len(self.stack) + len(self.alt)
        if depth > self.stack_limit:
            raise ScriptError("stack size limit exceeded")
        if depth > self.max_stack:
            self.max_stack = depth


def execute_script(
    script: bytes,
    witness: list[bytes] | None = None,
    stack_limit: int = MAX_STACK,
) -> ExecutionResult:
    """Run a script with an optional witness (initial stack; last item on top).

    success == ran to completion AND the final stack is exactly one truthy
    element (Tapscript spend semantics, matching scriptexec's notion used by
    the reference tests).

    stack_limit defaults to the 1000-element consensus limit; callers
    committing wide traces (whose leaf witnesses structurally exceed Bitcoin's
    limit — also true of the reference's wide-table "estimate" rows) may
    relax it for simulation."""
    ex = _Exec(script=script, stack=list(witness or []), stack_limit=stack_limit)
    ex._track()
    try:
        _run(ex)
    except ScriptError as e:
        return ExecutionResult(
            False, ex.stack, str(e), ex.op_count, ex.max_stack
        )
    ok = len(ex.stack) == 1 and _truthy(ex.stack[0])
    err = None if ok else "final stack not a single truthy element"
    return ExecutionResult(ok, ex.stack, err, ex.op_count, ex.max_stack)


def _run(ex: _Exec) -> None:
    s = ex.script
    n = len(s)
    while ex.pc < n:
        opcode = s[ex.pc]
        ex.pc += 1

        # push opcodes execute even inside untaken branches? No — skipped, but
        # must still be parsed to find the branch end.
        if opcode <= op.OP_PUSHDATA4:
            data, ex.pc = _read_push(s, ex.pc, opcode)
            if _executing(ex):
                ex.push(data)
            continue

        if opcode in (op.OP_IF, op.OP_NOTIF):
            if _executing(ex):
                top = ex.pop()
                if top not in (b"", b"\x01"):
                    raise ScriptError("MINIMALIF violation")
                val = _truthy(top)
                if opcode == op.OP_NOTIF:
                    val = not val
                ex.cond.append(val)
            else:
                ex.cond.append(False)  # nested in dead branch
                ex.cond[-1] = None  # type: ignore  # sentinel: never executes
            continue
        if opcode == op.OP_ELSE:
            if not ex.cond:
                raise ScriptError("OP_ELSE without OP_IF")
            if ex.cond[-1] is not None:
                ex.cond[-1] = not ex.cond[-1]
            continue
        if opcode == op.OP_ENDIF:
            if not ex.cond:
                raise ScriptError("OP_ENDIF without OP_IF")
            ex.cond.pop()
            continue

        if not _executing(ex):
            continue

        ex.op_count += 1
        _step(ex, opcode)
    if ex.cond:
        raise ScriptError("unbalanced conditional")


def _executing(ex: _Exec) -> bool:
    return all(c is True for c in ex.cond)


def _read_push(s: bytes, pc: int, opcode: int) -> tuple[bytes, int]:
    if opcode == op.OP_0:
        return b"", pc
    if opcode <= 0x4B:
        ln = opcode
    elif opcode == op.OP_PUSHDATA1:
        ln = s[pc]
        pc += 1
    elif opcode == op.OP_PUSHDATA2:
        ln = int.from_bytes(s[pc : pc + 2], "little")
        pc += 2
    else:
        ln = int.from_bytes(s[pc : pc + 4], "little")
        pc += 4
    if pc + ln > len(s):
        raise ScriptError("push past end of script")
    return s[pc : pc + ln], pc + ln


def _step(ex: _Exec, opcode: int) -> None:
    st = ex.stack
    if opcode == op.OP_1NEGATE:
        ex.pushn(-1)
    elif op.OP_1 <= opcode <= op.OP_16:
        ex.pushn(opcode - op.OP_1 + 1)
    elif opcode == op.OP_NOP:
        pass
    elif opcode == op.OP_VERIFY:
        if not _truthy(ex.pop()):
            raise ScriptError("OP_VERIFY failed")
    elif opcode == op.OP_RETURN:
        raise ScriptError("OP_RETURN")
    elif opcode == op.OP_TOALTSTACK:
        ex.alt.append(ex.pop())
    elif opcode == op.OP_FROMALTSTACK:
        if not ex.alt:
            raise ScriptError("altstack underflow")
        ex.push(ex.alt.pop())
    elif opcode == op.OP_2DROP:
        ex.pop(), ex.pop()
    elif opcode == op.OP_2DUP:
        if len(st) < 2:
            raise ScriptError("stack underflow")
        a, b = st[-2], st[-1]
        ex.push(a)
        ex.push(b)
    elif opcode == op.OP_3DUP:
        if len(st) < 3:
            raise ScriptError("stack underflow")
        a, b, c = st[-3], st[-2], st[-1]
        ex.push(a)
        ex.push(b)
        ex.push(c)
    elif opcode == op.OP_2OVER:
        if len(st) < 4:
            raise ScriptError("stack underflow")
        a, b = st[-4], st[-3]
        ex.push(a)
        ex.push(b)
    elif opcode == op.OP_2ROT:
        if len(st) < 6:
            raise ScriptError("stack underflow")
        a, b = st[-6], st[-5]
        del st[-6:-4]
        ex.push(a)
        ex.push(b)
    elif opcode == op.OP_2SWAP:
        if len(st) < 4:
            raise ScriptError("stack underflow")
        st[-4], st[-3], st[-2], st[-1] = st[-2], st[-1], st[-4], st[-3]
    elif opcode == op.OP_IFDUP:
        if not st:
            raise ScriptError("stack underflow")
        if _truthy(st[-1]):
            ex.push(st[-1])
    elif opcode == op.OP_DEPTH:
        ex.pushn(len(st))
    elif opcode == op.OP_DROP:
        ex.pop()
    elif opcode == op.OP_DUP:
        if not st:
            raise ScriptError("stack underflow")
        ex.push(st[-1])
    elif opcode == op.OP_NIP:
        if len(st) < 2:
            raise ScriptError("stack underflow")
        del st[-2]
    elif opcode == op.OP_OVER:
        if len(st) < 2:
            raise ScriptError("stack underflow")
        ex.push(st[-2])
    elif opcode in (op.OP_PICK, op.OP_ROLL):
        k = ex.popn()
        if k < 0 or k >= len(st):
            raise ScriptError("pick/roll out of range")
        item = st[-k - 1]
        if opcode == op.OP_ROLL:
            del st[-k - 1]
        ex.push(item)
    elif opcode == op.OP_ROT:
        if len(st) < 3:
            raise ScriptError("stack underflow")
        item = st[-3]
        del st[-3]
        ex.push(item)
    elif opcode == op.OP_SWAP:
        if len(st) < 2:
            raise ScriptError("stack underflow")
        st[-1], st[-2] = st[-2], st[-1]
    elif opcode == op.OP_TUCK:
        if len(st) < 2:
            raise ScriptError("stack underflow")
        st.insert(-2, st[-1])
        ex._track()
    elif opcode == op.OP_SIZE:
        if not st:
            raise ScriptError("stack underflow")
        ex.pushn(len(st[-1]))
    elif opcode in (op.OP_EQUAL, op.OP_EQUALVERIFY):
        a = ex.pop()
        b = ex.pop()
        eq = a == b
        if opcode == op.OP_EQUAL:
            ex.push(b"\x01" if eq else b"")
        elif not eq:
            raise ScriptError(f"OP_EQUALVERIFY failed: {a.hex()} != {b.hex()}")
    elif opcode == op.OP_1ADD:
        ex.pushn(ex.popn() + 1)
    elif opcode == op.OP_1SUB:
        ex.pushn(ex.popn() - 1)
    elif opcode == op.OP_NEGATE:
        ex.pushn(-ex.popn())
    elif opcode == op.OP_ABS:
        ex.pushn(abs(ex.popn()))
    elif opcode == op.OP_NOT:
        ex.pushn(int(ex.popn() == 0))
    elif opcode == op.OP_0NOTEQUAL:
        ex.pushn(int(ex.popn() != 0))
    elif opcode == op.OP_ADD:
        b, a = ex.popn(), ex.popn()
        ex.pushn(a + b)
    elif opcode == op.OP_SUB:
        b, a = ex.popn(), ex.popn()
        ex.pushn(a - b)
    elif opcode == op.OP_BOOLAND:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a != 0 and b != 0))
    elif opcode == op.OP_BOOLOR:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a != 0 or b != 0))
    elif opcode in (op.OP_NUMEQUAL, op.OP_NUMEQUALVERIFY):
        b, a = ex.popn(), ex.popn()
        if opcode == op.OP_NUMEQUAL:
            ex.pushn(int(a == b))
        elif a != b:
            raise ScriptError("OP_NUMEQUALVERIFY failed")
    elif opcode == op.OP_NUMNOTEQUAL:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a != b))
    elif opcode == op.OP_LESSTHAN:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a < b))
    elif opcode == op.OP_GREATERTHAN:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a > b))
    elif opcode == op.OP_LESSTHANOREQUAL:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a <= b))
    elif opcode == op.OP_GREATERTHANOREQUAL:
        b, a = ex.popn(), ex.popn()
        ex.pushn(int(a >= b))
    elif opcode == op.OP_MIN:
        b, a = ex.popn(), ex.popn()
        ex.pushn(min(a, b))
    elif opcode == op.OP_MAX:
        b, a = ex.popn(), ex.popn()
        ex.pushn(max(a, b))
    elif opcode == op.OP_WITHIN:
        mx, mn, x = ex.popn(), ex.popn(), ex.popn()
        ex.pushn(int(mn <= x < mx))
    elif opcode == op.OP_RIPEMD160:
        ex.push(ripemd160(ex.pop()))
    elif opcode == op.OP_SHA256:
        ex.push(hashlib.sha256(ex.pop()).digest())
    elif opcode == op.OP_HASH160:
        ex.push(hash160(ex.pop()))
    elif opcode == op.OP_HASH256:
        ex.push(hashlib.sha256(hashlib.sha256(ex.pop()).digest()).digest())
    else:
        raise ScriptError(f"unimplemented opcode 0x{opcode:02x}")
