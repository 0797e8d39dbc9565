"""Blake3-in-script gadget vs the host blake3 (64-byte single-block inputs,
the challenger permutation shape)."""

import numpy as np

from tapstark.dsl.blake3_gadget import blake3_compress_gadget
from tapstark.dsl.u32 import drop_xor_table, push_xor_table, u32_push, u32_equalverify
from tapstark.hashes import blake3
from tapstark.script import ScriptBuilder, execute_script
from tapstark.script import opcodes as op


def _run_gadget(data: bytes) -> None:
    assert len(data) == 64
    words = [int.from_bytes(data[4 * i : 4 * i + 4], "little") for i in range(16)]
    digest = blake3(data)
    h = [int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(8)]

    sb = ScriptBuilder()
    sb.extend(push_xor_table())
    for w in words:
        sb.extend(u32_push(w))
    sb.extend(blake3_compress_gadget())
    # stack: [table, h0..h7(top)]
    for i in range(7, -1, -1):
        sb.extend(u32_push(h[i]))
        sb.extend(u32_equalverify())
    sb.extend(drop_xor_table())
    sb.emit(op.OP_1)
    r = execute_script(sb.build())
    assert r.success, r.error


def test_blake3_gadget_zero_block():
    _run_gadget(bytes(64))


def test_blake3_gadget_random_blocks():
    rng = np.random.default_rng(0)
    for _ in range(2):
        _run_gadget(bytes(rng.integers(0, 256, 64, dtype=np.uint8)))


def test_blake3_gadget_sponge_shape():
    # the challenger's permutation input: 8 observed words || 8 capacity words
    rng = np.random.default_rng(1)
    data = bytes(rng.integers(0, 256, 32, dtype=np.uint8)) + bytes(
        rng.integers(0, 256, 32, dtype=np.uint8)
    )
    _run_gadget(data)


def _run_var_length(data: bytes) -> None:
    from tapstark.dsl.blake3_gadget import (
        blake3_hash_equalverify,
        blake3_var_length_gadget,
    )

    digest = blake3(data)
    h = [int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(8)]

    sb = ScriptBuilder()
    sb.extend(push_xor_table())
    for b in reversed(data):  # byte 0 ends on top
        sb.num(b)
    sb.extend(blake3_var_length_gadget(len(data)))
    # stack: [table, h0..h7(top)]; push expected in reversed quad order
    for i in range(7, -1, -1):
        sb.extend(u32_push(h[i]))
    sb.extend(blake3_hash_equalverify())
    sb.extend(drop_xor_table())
    sb.emit(op.OP_1)
    r = execute_script(sb.build())
    assert r.success, r.error


def test_blake3_var_length_single_block():
    rng = np.random.default_rng(2)
    for n in (1, 17, 40, 63, 64):
        _run_var_length(bytes(rng.integers(0, 256, n, dtype=np.uint8)))


def test_blake3_var_length_multi_block():
    rng = np.random.default_rng(3)
    for n in (65, 128, 200):
        _run_var_length(bytes(rng.integers(0, 256, n, dtype=np.uint8)))


def test_blake3_var_length_512():
    rng = np.random.default_rng(4)
    _run_var_length(bytes(rng.integers(0, 256, 512, dtype=np.uint8)))


def test_blake3_160_gadget():
    from tapstark.dsl.blake3_gadget import (
        blake3_160_gadget,
        blake3_160_hash_equalverify,
    )

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 256, 40, dtype=np.uint8))
    digest = blake3(data)[:20]
    h = [int.from_bytes(digest[4 * i : 4 * i + 4], "little") for i in range(5)]

    sb = ScriptBuilder()
    sb.extend(push_xor_table())
    for b in reversed(data):
        sb.num(b)
    sb.extend(blake3_160_gadget())
    for i in range(4, -1, -1):
        sb.extend(u32_push(h[i]))
    sb.extend(blake3_160_hash_equalverify())
    sb.extend(drop_xor_table())
    sb.emit(op.OP_1)
    r = execute_script(sb.build())
    assert r.success, r.error
