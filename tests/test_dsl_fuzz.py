"""DSL compiler fuzz: random expression DAGs (mixed base/ext, shared
subexpressions, hints) compiled and executed under the interpreter must agree
with host simulation."""

import numpy as np

from tapstark.dsl.expr import Expr, InputManager, simulate
from tapstark.field import EF4, F, P


def _run_random_dag(seed: int) -> None:
    rng = np.random.default_rng(seed)
    m = InputManager(f"fuzz{seed}")
    pool: list[Expr] = []
    values: dict[int, object] = {}

    def record(e: Expr, v) -> Expr:
        pool.append(e)
        values[e.id] = v
        return e

    # seed inputs and constants
    for _ in range(3):
        v = F(int(rng.integers(0, P)))
        record(m.assign_input_f(v), v)
    for _ in range(2):
        v = EF4(list(rng.integers(0, P, 4)))
        record(m.assign_input_f(v), v)
    record(Expr.constant(F(int(rng.integers(0, P)))), None)
    values[pool[-1].id] = pool[-1].meta
    record(Expr.constant(EF4(list(rng.integers(0, P, 4)))), None)
    values[pool[-1].id] = pool[-1].meta

    def val(e):
        return values[e.id]

    def as_ef(v):
        return EF4.from_base(v) if isinstance(v, F) else v

    for _ in range(25):
        op = rng.choice(["add", "sub", "mul", "neg", "square", "double", "exp"])
        a = pool[int(rng.integers(0, len(pool)))]
        b = pool[int(rng.integers(0, len(pool)))]
        va, vb = val(a), val(b)
        if op == "add":
            e, v = a + b, (as_ef(va) + as_ef(vb)) if (
                isinstance(va, EF4) or isinstance(vb, EF4)
            ) else va + vb
        elif op == "sub":
            e, v = a - b, (as_ef(va) - as_ef(vb)) if (
                isinstance(va, EF4) or isinstance(vb, EF4)
            ) else va - vb
        elif op == "mul":
            e, v = a * b, (as_ef(va) * as_ef(vb)) if (
                isinstance(va, EF4) or isinstance(vb, EF4)
            ) else va * vb
        elif op == "neg":
            e, v = -a, -va
        elif op == "square":
            e, v = a.square(), va * va
        elif op == "double":
            e, v = a.double(), va + va
        else:
            n = int(rng.integers(1, 9))
            e, v = a.exp_const(n), va.exp(n)
        record(e, v)

    # verify several random nodes (forces deep sharing in one program)
    for _ in range(4):
        e = pool[int(rng.integers(7, len(pool)))]
        m.set_exec_dsl(e.equal_verify_for_f(val(e)))
    # plus a hint with in-script verification
    x = val(pool[3])  # an ext input
    inv = m.assign_hint_input_f(as_ef(x).inverse())
    m.add_hint_verify((pool[3] * inv).equal_verify_for_f(EF4.one()))
    m.run()


def test_dsl_fuzz_many_seeds():
    for seed in range(12):
        _run_random_dag(seed)
