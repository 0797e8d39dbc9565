"""Adversarial consensus-edge-case pass on the Tapscript interpreter.

Every soundness claim routes through `script/interpreter.py` (the
bitcoin-scriptexec role, /root/reference/scripts/src/lib.rs:97-164), so the
simulator's edges are probed against Bitcoin Core semantics directly:
CScriptNum 4-byte overflow boundaries, minimal-number and minimal-push
(CheckMinimalPush) rules, the 520-byte element limit on pushes AND initial
witness elements, the 1000-element combined stack limit, and MINIMALIF.

Documented safe divergence: BIP342 OP_SUCCESSx opcodes auto-SUCCEED on
Bitcoin; this simulator fails on them instead. The framework never emits
them, and auto-success would be the dangerous direction for a verifier
simulator to err.
"""

import pytest

from tapstark.script import opcodes as op
from tapstark.script.builder import decode_num, encode_num, push_bytes, push_int
from tapstark.script.interpreter import execute_script


def run(script: bytes, witness=None, **kw):
    return execute_script(script, witness, **kw)


# -- CScriptNum boundaries --------------------------------------------------


def test_scriptnum_4byte_operands_ok():
    # 2^31 - 1 (max positive 4-byte) + 0 decodes and adds fine
    s = push_int(2**31 - 1) + push_int(0) + bytes([op.OP_ADD])
    s += push_int(2**31 - 1) + bytes([op.OP_EQUAL])
    assert run(s).success


def test_scriptnum_5byte_result_allowed_but_not_reusable():
    # max + max = 2^32 - 2 encodes as 5 bytes: producing it is legal...
    s = push_int(2**31 - 1) + push_int(2**31 - 1) + bytes([op.OP_ADD])
    r = run(s + bytes([op.OP_SIZE]) + push_int(5) + bytes([op.OP_EQUALVERIFY, op.OP_DROP, op.OP_1]))
    assert r.success
    # ...but feeding the 5-byte result back into arithmetic must fail
    # (CScriptNum overflow, interpreter.cpp nMaxNumSize=4)
    r2 = run(
        push_int(2**31 - 1)
        + push_int(2**31 - 1)
        + bytes([op.OP_ADD])
        + push_int(1)
        + bytes([op.OP_ADD])
    )
    assert not r2.success and "overflow" in r2.error


def test_scriptnum_negative_zero_rejected():
    # 0x80 is negative zero: non-minimal, must be rejected as a number
    s = bytes([0x01, 0x80]) + push_int(0) + bytes([op.OP_ADD])
    r = run(s)
    assert not r.success and "non-minimal" in r.error


def test_scriptnum_nonminimal_trailing_zero_rejected():
    # 0x0100 (1 with a useless high zero byte)
    s = bytes([0x02, 0x01, 0x00]) + push_int(0) + bytes([op.OP_ADD])
    r = run(s)
    assert not r.success and "non-minimal" in r.error


def test_scriptnum_minimal_boundary_0x80_extension():
    # 128 needs the 0x00 extension byte (0x8000): minimal and decodable
    assert encode_num(128) == b"\x80\x00"
    assert decode_num(b"\x80\x00") == 128
    # -128 is 0x8080
    assert encode_num(-128) == b"\x80\x80"
    assert decode_num(b"\x80\x80") == -128
    s = push_int(128) + push_int(-128) + bytes([op.OP_ADD]) + push_int(0) + bytes([op.OP_EQUAL])
    assert run(s).success


# -- minimal push forms (CheckMinimalPush) ----------------------------------


def test_minimal_push_smallint_via_data_rejected():
    # pushing 0x01 as a 1-byte data push must use OP_1
    r = run(bytes([0x01, 0x01]))
    assert not r.success and "OP_1..OP_16" in r.error


def test_minimal_push_negate_via_data_rejected():
    r = run(bytes([0x01, 0x81]))
    assert not r.success and "OP_1NEGATE" in r.error


def test_minimal_push_pushdata1_for_short_rejected():
    # 5 bytes via PUSHDATA1 — direct length byte fits
    r = run(bytes([op.OP_PUSHDATA1, 5]) + b"abcde")
    assert not r.success and "direct length" in r.error


def test_minimal_push_pushdata2_for_byte_rejected():
    r = run(bytes([op.OP_PUSHDATA2]) + (80).to_bytes(2, "little") + bytes(80))
    assert not r.success and "PUSHDATA1 fits" in r.error


def test_builder_pushes_are_minimal():
    # the builder must emit forms the hardened compiler accepts
    for v in (0, 1, 16, 17, 127, 128, 255, 256, 2**31 - 1, -1, -127, -128):
        s = push_int(v) + bytes([op.OP_DROP, op.OP_1])
        assert run(s).success, v
    for n in (1, 75, 76, 255, 256, 519, 520):
        data = bytes(n) if n != 1 else b"\x17"
        s = push_bytes(data) + bytes([op.OP_DROP, op.OP_1])
        assert run(s).success, n


# -- element / stack limits --------------------------------------------------


def test_element_520_ok_521_rejected():
    ok = push_bytes(bytes(520)) + bytes([op.OP_DROP, op.OP_1])
    assert run(ok).success
    bad = push_bytes(bytes(521)) + bytes([op.OP_DROP, op.OP_1])
    r = run(bad)
    assert not r.success and "too large" in r.error


def test_witness_element_521_rejected():
    r = run(bytes([op.OP_DROP, op.OP_1]), witness=[bytes(521)])
    assert not r.success and "witness element too large" in r.error


def test_stack_limit_includes_altstack():
    # fill to exactly 1000 (999 pushes + witness 1): OK; one more: fail
    s = bytes([op.OP_TOALTSTACK]) + bytes([op.OP_1]) * 999
    r = run(s + bytes([op.OP_FROMALTSTACK, op.OP_DROP]) + bytes([op.OP_2DROP]) * 499 + bytes([op.OP_DROP]), witness=[b"\x01"])
    assert r.max_stack == 1000
    s2 = bytes([op.OP_TOALTSTACK]) + bytes([op.OP_1]) * 1000
    r2 = run(s2, witness=[b"\x01"])
    assert not r2.success and "stack size" in r2.error


# -- MINIMALIF ----------------------------------------------------------------


def test_minimalif_rejects_nonminimal_true():
    # 0x0200 is truthy but not minimal for OP_IF (2-byte form also dodges
    # the small-int minimal-push rule, isolating the MINIMALIF check)
    s = push_bytes(b"\x02\x00") + bytes([op.OP_IF, op.OP_1, op.OP_ELSE, op.OP_1, op.OP_ENDIF])
    r = run(s)
    assert not r.success and "MINIMALIF" in r.error


def test_minimalif_accepts_empty_and_one():
    s = bytes([op.OP_0, op.OP_IF, op.OP_0, op.OP_ELSE, op.OP_1, op.OP_ENDIF])
    assert run(s).success
    s2 = bytes([op.OP_1, op.OP_IF, op.OP_1, op.OP_ELSE, op.OP_0, op.OP_ENDIF])
    assert run(s2).success


# -- misc edges ---------------------------------------------------------------


def test_truthiness_negative_zero_false():
    # 0x80 (negative zero) is falsy as a boolean (but OP_VERIFY pops it
    # without numeric decode, so no minimality error)
    s = push_bytes(b"\x00") + bytes([op.OP_VERIFY, op.OP_1])
    r = run(s)
    assert not r.success  # 0x00 is falsy -> VERIFY fails


def test_unbalanced_conditionals_rejected():
    r = run(bytes([op.OP_1, op.OP_IF, op.OP_1]))
    assert not r.success and "unbalanced" in r.error
    r2 = run(bytes([op.OP_ELSE, op.OP_1]))
    assert not r2.success
    r3 = run(bytes([op.OP_ENDIF, op.OP_1]))
    assert not r3.success


def test_op_success_range_fails_closed():
    # OP_SUCCESSx (e.g. 0x50, 0x89) auto-succeed on Bitcoin; the simulator
    # fails closed instead (documented divergence — the safe direction)
    r = run(bytes([0x50]))
    assert not r.success
