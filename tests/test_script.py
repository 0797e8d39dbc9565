"""Script layer tests: number encoding, interpreter semantics, Winternitz
sign/verify roundtrips under the interpreter (mirrors reference
scripts/src/bit_comm tests), bit-commitment recover scripts."""

import numpy as np
import pytest

from tapstark.commit.bitcomm import (
    COMMIT_TYPE_U128,
    COMMIT_TYPE_U32,
    BcManager,
    BitCommitmentU32,
)
from tapstark.commit.winternitz import N0, Winternitz, checksum, to_digits, u32_compress
from tapstark.script import ScriptBuilder, decode_num, encode_num, execute_script
from tapstark.script import opcodes as op


def test_script_num_encoding():
    cases = {
        0: b"",
        1: b"\x01",
        127: b"\x7f",
        128: b"\x80\x00",
        255: b"\xff\x00",
        256: b"\x00\x01",
        -1: b"\x81",
        -127: b"\xff",
        -128: b"\x80\x80",
        0x7FFFFFFF: b"\xff\xff\xff\x7f",
    }
    for n, enc in cases.items():
        assert encode_num(n) == enc, n
        assert decode_num(enc, max_size=5) == n, n
    with pytest.raises(ValueError):
        decode_num(b"\x01\x00")  # non-minimal


def test_interpreter_basics():
    sb = ScriptBuilder().num(2).num(3).emit(op.OP_ADD).num(5).emit(op.OP_EQUAL)
    assert execute_script(sb.build()).success

    sb = ScriptBuilder().num(10).num(3).emit(op.OP_SUB).num(7).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    assert execute_script(sb.build()).success

    # failure leaves success False with error
    sb = ScriptBuilder().num(1).num(2).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    r = execute_script(sb.build())
    assert not r.success and "EQUALVERIFY" in r.error


def test_interpreter_if_else():
    for cond, want in ((1, 11), (0, 22)):
        sb = ScriptBuilder().num(cond)
        sb.emit(op.OP_IF).num(11).emit(op.OP_ELSE).num(22).emit(op.OP_ENDIF)
        sb.num(want).emit(op.OP_EQUAL)
        assert execute_script(sb.build()).success, cond


def test_interpreter_altstack_pick_roll():
    sb = (
        ScriptBuilder()
        .num(1)
        .num(2)
        .num(3)
        .num(2)
        .emit(op.OP_PICK)  # copies depth-2 item (1)
        .num(1)
        .emit(op.OP_EQUALVERIFY)
        .num(2)
        .emit(op.OP_ROLL)  # moves 1 to top
        .num(1)
        .emit(op.OP_EQUALVERIFY)
        .emit(op.OP_ADD)
        .num(5)
        .emit(op.OP_EQUAL)
    )
    assert execute_script(sb.build()).success


def test_interpreter_witness_zero_case():
    # reference scripts/src/bit_comm/winternitz.rs test_zero_input
    sb = ScriptBuilder().num(0xA).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    assert execute_script(sb.build(), [b"\x0a"]).success
    sb = ScriptBuilder().num(0).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    assert execute_script(sb.build(), [b""]).success


def test_to_digits_and_checksum():
    # reference winternitz.rs test_checksum
    assert to_digits(0x87654321, N0) == [1, 2, 3, 4, 5, 6, 7, 8]
    assert checksum([1, 2, 3, 4, 5, 6, 7, 8]) == 84
    assert to_digits(84, 2) == [4, 5]
    assert to_digits(0xED65002F, N0) == [0xF, 2, 0, 0, 5, 6, 0xD, 0xE]


def test_winternitz_sign_and_checksig():
    # reference winternitz.rs test_winternitz: recover bytes LSB-first
    w = Winternitz(b"\x12\x34")
    msg = to_digits(0x87654321, N0)
    sig = [x if x != b"\x00" else b"" for x in w.sign(msg)]
    sb = w.checksig_verify()
    sb.num(0x21).emit(op.OP_EQUALVERIFY)
    sb.num(0x43).emit(op.OP_EQUALVERIFY)
    sb.num(0x65).emit(op.OP_EQUALVERIFY)
    sb.num(0x87).emit(op.OP_EQUAL)
    r = execute_script(sb.build(), sig)
    assert r.success, r.error

    # zero digits and high digits (committed values are always < 2^31:
    # canonical BabyBear limbs or query indices)
    for value in (0x6D65002F, 0x00000000, 0x7FFFFFFF, 12345):
        bc = BitCommitmentU32(b"\x12\x34", value)
        sig = bc.signature()
        sb = bc.locking_script()
        sb.num(value).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        r = execute_script(sb.build(), sig)
        assert r.success, (hex(value), r.error)


def test_winternitz_rejects_wrong_value():
    bc = BitCommitmentU32(b"\x12\x34", 12345)
    sig = bc.signature()
    sb = bc.locking_script()
    sb.num(54321).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    assert not execute_script(sb.build(), sig).success


def test_u32_compress_only():
    # direct compress of 4 byte-values pushed b3..b0
    v = 0x11654321
    sb = ScriptBuilder()
    for b in [(v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF]:
        sb.num(b)
    sb.extend(u32_compress())
    sb.num(v).emit(op.OP_EQUAL)
    assert execute_script(sb.build()).success


def test_multi_limb_bit_commitment():
    mgr = BcManager()
    bc = mgr.assign_bc(COMMIT_TYPE_U128)
    limbs = [1, 2, 3, 2013265920]
    bc.set_values(limbs)
    sb = bc.locking_script()
    for v in reversed(limbs):
        sb.num(v).emit(op.OP_EQUALVERIFY)
    sb.emit(op.OP_1)
    r = execute_script(sb.build(), bc.witness())
    assert r.success, r.error


def test_bc_manager_deterministic_and_unique():
    m1, m2 = BcManager(), BcManager()
    a = m1.assign_bc(COMMIT_TYPE_U32)
    b = m2.assign_bc(COMMIT_TYPE_U32)
    assert a.commitments[0].winternitz.pub_key == b.commitments[0].winternitz.pub_key
    c = m1.assign_bc(COMMIT_TYPE_U32)
    assert a.commitments[0].winternitz.pub_key != c.commitments[0].winternitz.pub_key
