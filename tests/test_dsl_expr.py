"""DSL expression graph + compiler tests: arithmetic roundtrips under the
interpreter, CSE of shared subexpressions, inputs/hints via InputManager
(mirrors reference script_expr/src/input_manager.rs tests), index opcodes."""

import numpy as np
import pytest

from tapstark.dsl.expr import (
    Expr,
    InputManager,
    ManagerAssign,
    compile_program,
    simulate_with_inputs,
)
from tapstark.field import EF4, F, P
from tapstark.script.interpreter import execute_script
from tapstark.utils import reverse_bits_len

rng = np.random.default_rng(0)


def _rand_f() -> F:
    return F(int(rng.integers(0, P)))


def _rand_ef() -> EF4:
    return EF4(list(rng.integers(0, P, 4)))


def _check(m: InputManager, expr_value_pairs):
    for e, v in expr_value_pairs:
        m.set_exec_dsl(e.equal_verify_for_f(v))
    got = simulate_with_inputs(m.exec_exprs, m.inputs)
    m.run()


def test_base_arithmetic_with_inputs():
    m = InputManager("base")
    a, b = _rand_f(), _rand_f()
    ea = m.assign_input_f(a)
    eb = m.assign_input_f(b)
    _check(
        m,
        [
            (ea + eb, a + b),
            (ea - eb, a - b),
            (ea * eb, a * b),
            (-ea, -a),
            (ea.square(), a * a),
            (ea.double(), a + a),
            (ea.exp_const(5), a.exp(5)),
        ],
    )


def test_ext_arithmetic_with_inputs():
    m = InputManager("ext")
    a, b = _rand_ef(), _rand_ef()
    c = _rand_f()
    ea = m.assign_input_f(a)
    eb = m.assign_input_f(b)
    ec = m.assign_input_f(c)
    _check(
        m,
        [
            (ea + eb, a + b),
            (ea - eb, a - b),
            (ea * eb, a * b),
            (ea * ec, a * c),
            (ec * ea, a * c),
            (ec + ea, a + EF4.from_base(c)),
            (ea - ec, a - EF4.from_base(c)),
            (ec - ea, EF4.from_base(c) - a),
            (-ea, -a),
            (ea.square(), a * a),
            (ea.exp_const(7), a.exp(7)),
        ],
    )


def test_constants_and_mixed():
    m = InputManager("const")
    a = _rand_ef()
    ea = m.assign_input_f(a)
    k = _rand_f()
    _check(
        m,
        [
            (ea + Expr.constant(k), a + EF4.from_base(k)),
            (ea * Expr.constant(EF4.one() + EF4.one()), a + a),
            (Expr.constant(k) * ea, a * k),
        ],
    )


def test_cse_shared_subexpression():
    m = InputManager("cse")
    a, b = _rand_ef(), _rand_ef()
    ea = m.assign_input_f(a)
    eb = m.assign_input_f(b)
    shared = ea * eb  # used 3 times
    e1 = shared + shared
    e2 = shared * shared
    want1 = a * b + a * b
    want2 = (a * b) * (a * b)
    m.set_exec_dsl(e1.equal_verify_for_f(want1))
    m.set_exec_dsl(e2.equal_verify_for_f(want2))
    m.run()
    # sharing must reduce script size vs recomputation
    shared_len = m.get_script_len()
    m2 = InputManager("nocse")
    ea2 = m2.assign_input_f(a)
    eb2 = m2.assign_input_f(b)
    m2.set_exec_dsl(((ea2 * eb2) + (ea2 * eb2)).equal_verify_for_f(want1))
    m2.set_exec_dsl(((ea2 * eb2) * (ea2 * eb2)).equal_verify_for_f(want2))
    m2.run()
    assert shared_len < m2.get_script_len()


def test_hint_verify_inverse():
    # the FRI pattern: prover supplies x^{-1} as a hint, verified in-script
    m = InputManager("hints")
    x = _rand_ef()
    ex = m.assign_input_f(x)
    inv = m.assign_hint_input_f(x.inverse())
    m.add_hint_verify((ex * inv).equal_verify_for_f(EF4.one()))
    m.set_exec_dsl((ex * inv).equal_verify_for_f(EF4.one()))
    m.run()

    # wrong hint must fail
    m2 = InputManager("badhint")
    ex2 = m2.assign_input_f(x)
    bad = m2.assign_hint_input_f(x.inverse() + EF4.one())
    m2.add_hint_verify((ex2 * bad).equal_verify_for_f(EF4.one()))
    with pytest.raises(AssertionError):
        m2.run()


def test_index_ops():
    m = InputManager("index")
    idx = 0b1011010
    e = m.assign_input_num(idx)
    bits = 7
    m.set_exec_dsl(
        e.reverse_bits_len(bits).num_to_field().equal_verify_for_f(
            F(reverse_bits_len(idx, bits))
        )
    )
    m.set_exec_dsl(
        e.index_to_rou(bits).equal_verify_for_f(
            F.two_adic_generator(bits).exp(reverse_bits_len(idx, bits))
        )
    )
    m.run()


def test_equal_bool_and_manager_assign():
    ma = ManagerAssign()
    m1 = ma.next_manager("m1")
    a = _rand_f()
    e = m1.assign_input_f(a)
    m1.set_exec_dsl(e.equal_for_f(a))
    m2 = ma.next_manager("m2")
    b = _rand_ef()
    e2 = m2.assign_input_f(b)
    m2.set_exec_dsl(e2.equal_for_f(b))
    sizes = ma.run_all()
    assert set(sizes) == {"m1", "m2"}

    # failing equal
    m3 = InputManager("m3")
    e3 = m3.assign_input_f(a)
    m3.set_exec_dsl(e3.equal_for_f(a + F(1)))
    with pytest.raises(AssertionError):
        m3.run()


def test_table_lookup_dynamic_index():
    """Table/Lookup opcodes (reference script_gen.rs:38-41): the table is
    retained once; lookups PICK entries by an on-stack index."""
    from tapstark.dsl.expr import Expr, InputManager
    from tapstark.field.scalar import F

    m = InputManager("lookup")
    tbl = Expr.from_table([F(10), F(20), F(30), F(40), F(50)])
    idx = m.assign_input_num(3)
    m.set_exec_dsl((tbl.lookup(idx) * Expr.constant(F(2))).equal_verify_for_f(F(80)))
    m.set_exec_dsl(tbl.lookup(Expr.constant_num(0)).equal_verify_for_f(F(10)))
    m.set_exec_dsl(tbl.lookup(Expr.constant_num(4)).equal_verify_for_f(F(50)))
    m.run()


def test_table_lookup_simulation_matches_script():
    from tapstark.dsl.expr import Expr, simulate
    from tapstark.field.scalar import F

    tbl = Expr.from_table([F(7), F(8), F(9)])
    v = tbl.lookup(Expr.constant_num(2))
    assert simulate(v) == F(9)


def test_run_debug_names_failing_node():
    """run(debug=True) reports the DSL node containing the failing opcode
    (the reference's stack.debug() breakpoint facility)."""
    import pytest

    from tapstark.dsl.expr import InputManager
    from tapstark.field.scalar import F

    m = InputManager("dbg")
    a = m.assign_input_f(F(5))
    m.set_exec_dsl(a.equal_verify_for_f(F(6)))
    with pytest.raises(AssertionError, match=r"in node \[equal_verify"):
        m.run(debug=True)
