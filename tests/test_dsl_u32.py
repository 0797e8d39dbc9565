"""u32 byte-quad gadget tests under the interpreter (mirror reference
scripts/src/u32 tests): add, xor via half-bit table, rotations."""

import numpy as np

from tapstark.dsl import u32 as U
from tapstark.script import ScriptBuilder, execute_script
from tapstark.script import opcodes as op

rng = np.random.default_rng(0)


def _rand_u32():
    return int(rng.integers(0, 1 << 32))


def _quad_check(sb: ScriptBuilder, want: int) -> None:
    # verify quad equals want, then drop the xor table if present is caller's job
    sb.extend(U.u32_push(want))
    sb.extend(U.u32_equalverify())


def test_u32_add():
    for _ in range(10):
        a, b = _rand_u32(), _rand_u32()
        sb = ScriptBuilder()
        sb.extend(U.u32_push(a)).extend(U.u32_push(b)).extend(U.u32_add())
        _quad_check(sb, (a + b) & 0xFFFFFFFF)
        sb.emit(op.OP_1)
        r = execute_script(sb.build())
        assert r.success, (hex(a), hex(b), r.error)
    # carry chains
    for a, b in [(0xFFFFFFFF, 1), (0xFF00FF00, 0x00FF00FF), (0, 0)]:
        sb = ScriptBuilder()
        sb.extend(U.u32_push(a)).extend(U.u32_push(b)).extend(U.u32_add())
        _quad_check(sb, (a + b) & 0xFFFFFFFF)
        sb.emit(op.OP_1)
        assert execute_script(sb.build()).success


def test_u32_xor():
    for _ in range(8):
        a, b = _rand_u32(), _rand_u32()
        sb = ScriptBuilder()
        sb.extend(U.push_xor_table())
        sb.extend(U.u32_push(a)).extend(U.u32_push(b))
        sb.extend(U.u32_xor(table_junk=0))
        _quad_check(sb, a ^ b)
        sb.extend(U.drop_xor_table())
        sb.emit(op.OP_1)
        r = execute_script(sb.build())
        assert r.success, (hex(a), hex(b), r.error)


def test_u32_rotations():
    for n in (1, 4, 7, 8, 12, 16, 24, 31):
        for _ in range(4):
            v = _rand_u32()
            want = ((v >> n) | (v << (32 - n))) & 0xFFFFFFFF
            sb = ScriptBuilder()
            sb.extend(U.u32_push(v)).extend(U.u32_rrot(n))
            _quad_check(sb, want)
            sb.emit(op.OP_1)
            r = execute_script(sb.build())
            assert r.success, (hex(v), n, r.error)


def test_u32_roll_pick_drop():
    a, b, c = _rand_u32(), _rand_u32(), _rand_u32()
    sb = ScriptBuilder()
    for v in (a, b, c):
        sb.extend(U.u32_push(v))
    sb.extend(U.u32_roll(2))  # bring a to top
    _quad_check(sb, a)
    sb.extend(U.u32_pick(1))  # copy b
    _quad_check(sb, b)
    sb.extend(U.u32_drop())  # drop c... order: stack now [b, c]; drop c
    _quad_check(sb, c)
    sb.emit(op.OP_1)
    r = execute_script(sb.build())
    # after dropping c the remaining quad is b — the sequence above checks c
    # where b remains, so this must FAIL; rebuild correctly:
    sb2 = ScriptBuilder()
    for v in (a, b, c):
        sb2.extend(U.u32_push(v))
    sb2.extend(U.u32_roll(2))
    _quad_check(sb2, a)  # consumes a; stack [b, c]
    sb2.extend(U.u32_pick(0))  # copy c (top quad)
    _quad_check(sb2, c)
    sb2.extend(U.u32_drop())  # drop c
    _quad_check(sb2, b)
    sb2.emit(op.OP_1)
    r2 = execute_script(sb2.build())
    assert r2.success, r2.error
