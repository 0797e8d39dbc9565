"""ScriptConstraintBuilder — an AirBuilder whose expressions are DSL nodes.

Reference parity: script_expr/src/script_builder.rs:14-196. Evaluates the AIR
once more to build the in-script constraint accumulator
acc = ((c0 * alpha + c1) * alpha + c2) ... from the trace openings at zeta.
Trace openings and public values enter the script as witness inputs.
"""

from __future__ import annotations

from ..air import AirBuilder, TwoRowMatrixView
from ..field.scalar import EF4, F
from .expr import Expr, InputManager


class ScriptConstraintBuilder(AirBuilder):
    def __init__(
        self,
        manager: InputManager,
        trace_local: list[EF4],
        trace_next: list[EF4],
        public_values: list[F],
        is_first_row: Expr,
        is_last_row: Expr,
        is_transition: Expr,
        alpha: EF4,
    ):
        self.manager = manager
        local_in = [manager.assign_input_f(v) for v in trace_local]
        next_in = [manager.assign_input_f(v) for v in trace_next]
        self._main = TwoRowMatrixView(local_in, next_in)
        self._public = [manager.assign_input_f(v) for v in public_values]
        self._first = is_first_row
        self._last = is_last_row
        self._transition = is_transition
        self._alpha = Expr.constant(alpha)
        self.constraints: list[Expr] = []

    def main(self):
        return self._main

    def is_first_row(self):
        return self._first

    def is_last_row(self):
        return self._last

    def is_transition_window(self, size: int):
        assert size == 2
        return self._transition

    def public_values(self):
        return self._public

    def assert_zero(self, x):
        if not isinstance(x, Expr):
            x = Expr.constant(x)
        self.constraints.append(x)

    def accumulator_expr(self) -> Expr:
        acc = self.constraints[0]
        for c in self.constraints[1:]:
            acc = acc * self._alpha + c
        return acc
