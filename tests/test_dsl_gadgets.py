"""In-script field arithmetic gadgets tested under the Tapscript interpreter
against exact host arithmetic (mirrors reference scripts/src/u31 tests)."""

import numpy as np
import pytest

from tapstark.dsl import gadgets as g
from tapstark.field import EF4, F, P
from tapstark.script import ScriptBuilder, execute_script
from tapstark.script.builder import encode_num
from tapstark.script import opcodes as op

rng = np.random.default_rng(0)


def _run(sb: ScriptBuilder) -> None:
    r = execute_script(sb.build())
    assert r.success, r.error


def _rand_f():
    return int(rng.integers(0, P))


def _rand_ef():
    return EF4(list(rng.integers(0, P, 4)))


def _push_ef(sb, e: EF4):
    sb.extend(g.u31ext_push(list(e.c)))


def test_u31_add_sub_neg_double():
    for _ in range(20):
        a, b = _rand_f(), _rand_f()
        sb = ScriptBuilder().num(a).num(b)
        sb.extend(g.u31_add()).num((a + b) % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)
        sb = ScriptBuilder().num(a).num(b)
        sb.extend(g.u31_sub()).num((a - b) % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)
        sb = ScriptBuilder().num(a)
        sb.extend(g.u31_neg()).num((-a) % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)
        sb = ScriptBuilder().num(a)
        sb.extend(g.u31_double()).num(2 * a % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)
    # edges
    for a, b in [(0, 0), (P - 1, P - 1), (P - 1, 1), (0, P - 1)]:
        sb = ScriptBuilder().num(a).num(b)
        sb.extend(g.u31_add()).num((a + b) % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)
    sb = ScriptBuilder().num(0)
    sb.extend(g.u31_neg()).num(0).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
    _run(sb)


def test_u31_mul():
    cases = [(0, 5), (1, P - 1), (P - 1, P - 1), (2, 3)]
    cases += [(_rand_f(), _rand_f()) for _ in range(8)]
    for a, b in cases:
        sb = ScriptBuilder().num(a).num(b)
        sb.extend(g.u31_mul()).num(a * b % P).emit(op.OP_EQUALVERIFY).emit(op.OP_1)
        _run(sb)


def test_u31_mul_by_constant():
    for c in [0, 1, 2, 11, P - 1, 123456789]:
        a = _rand_f()
        sb = ScriptBuilder().num(a)
        sb.extend(g.u31_mul_by_constant(c)).num(a * c % P).emit(op.OP_EQUALVERIFY).emit(
            op.OP_1
        )
        _run(sb)


def test_u31ext_add_sub_neg():
    for _ in range(8):
        a, b = _rand_ef(), _rand_ef()
        for fn, want in [
            (g.u31ext_add, a + b),
            (g.u31ext_sub, a - b),
        ]:
            sb = ScriptBuilder()
            _push_ef(sb, a)
            _push_ef(sb, b)
            sb.extend(fn())
            _push_ef(sb, want)
            sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
            _run(sb)
        sb = ScriptBuilder()
        _push_ef(sb, a)
        sb.extend(g.u31ext_neg())
        _push_ef(sb, -a)
        sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
        _run(sb)
        sb = ScriptBuilder()
        _push_ef(sb, a)
        sb.extend(g.u31ext_double())
        _push_ef(sb, a + a)
        sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
        _run(sb)


def test_u31ext_mul():
    for _ in range(4):
        a, b = _rand_ef(), _rand_ef()
        sb = ScriptBuilder()
        _push_ef(sb, a)
        _push_ef(sb, b)
        sb.extend(g.u31ext_mul())
        _push_ef(sb, a * b)
        sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
        _run(sb)


def test_u31ext_mul_u31():
    for _ in range(4):
        a = _rand_ef()
        b = _rand_f()
        sb = ScriptBuilder()
        _push_ef(sb, a)
        sb.num(b)
        sb.extend(g.u31ext_mul_u31())
        _push_ef(sb, a * F(b))
        sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
        _run(sb)


def test_u31_to_u31ext():
    a = _rand_f()
    sb = ScriptBuilder().num(a)
    sb.extend(g.u31_to_u31ext())
    _push_ef(sb, EF4((a, 0, 0, 0)))
    sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
    _run(sb)


def test_u31ext_equalverify_rejects():
    a = _rand_ef()
    b = a + EF4.one()
    sb = ScriptBuilder()
    _push_ef(sb, a)
    _push_ef(sb, b)
    sb.extend(g.u31ext_equalverify()).emit(op.OP_1)
    r = execute_script(sb.build())
    assert not r.success


def test_u31_mul_by_constant_naf_fuzz():
    """The constant multiplier picks the shorter of binary/NAF chains; both
    must agree with field multiplication."""
    import random

    rng = random.Random(11)
    for t in range(40):
        a = rng.randrange(P)
        c = [0, 1, 2, P - 1, (1 << 16) + 1][t] if t < 5 else rng.randrange(P)
        sb = ScriptBuilder()
        sb.extend(g.u31_mul_by_constant(c))
        sb.num(a * c % P).emit(op.OP_EQUALVERIFY, op.OP_1)
        res = execute_script(sb.build(), [encode_num(a)])
        assert res.success, (t, c, res.error)


def test_u31ext_mul_by_constant_fuzz():
    import random

    rng = random.Random(12)
    for t in range(40):
        a = EF4([rng.randrange(P) for _ in range(4)])
        if t % 4 == 0:
            limbs = [0, 0, 0, 0]
            limbs[rng.randrange(4)] = rng.randrange(P)
            c = EF4(limbs)
        elif t % 4 == 1:
            c = EF4([rng.randrange(P), 0, 0, 0])
        else:
            c = EF4([rng.randrange(P) for _ in range(4)])
        expect = a * c
        sb = ScriptBuilder()
        sb.extend(g.u31ext_mul_by_constant([int(x) for x in c.c]))
        sb.extend(g.u31ext_push([int(x) for x in expect.c]))
        sb.extend(g.u31ext_equalverify())
        sb.emit(op.OP_1)
        w = [encode_num(int(x)) for x in reversed(a.c)]
        res = execute_script(sb.build(), w)
        assert res.success, (t, res.error)
