"""Constraint folders: device-vectorized prover folder, exact verifier folder.

Reference parity: uni-stark/src/folder.rs. Both accumulate
`acc = acc * alpha + constraint` per assert_zero; the prover evaluates over
the whole quotient coset at once ((m,) / (m,4) Montgomery device arrays —
the TPU-native replacement for the reference's packed-SIMD rows +
rayon row parallelism), the verifier over EF4 scalars at zeta.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field.device import (
    ef_add,
    ef_const,
    ef_from_base,
    ef_mul,
    ef_mul_base,
    ef_neg,
    ef_sub,
    fp_add,
    fp_const,
    fp_mul,
    fp_neg,
    fp_sub,
)
from ..field.scalar import EF4, F
from . import AirBuilder, TwoRowMatrixView


class DExpr:
    """Device field expression: (m,) base or (m,4) extension Montgomery array
    (or scalar-shaped constants). Overloads field ops for AIR eval code."""

    __slots__ = ("arr", "ext")

    def __init__(self, arr, ext: bool):
        self.arr = arr
        self.ext = ext

    @staticmethod
    def const(v) -> "DExpr":
        if isinstance(v, int):
            v = F(v)
        if isinstance(v, F):
            return DExpr(fp_const(v.v), False)
        if isinstance(v, EF4):
            return DExpr(ef_const(v), True)
        raise TypeError(type(v))

    def _coerce(self, other) -> "DExpr":
        if isinstance(other, DExpr):
            return other
        return DExpr.const(other)

    @staticmethod
    def _promote(a: "DExpr", b: "DExpr"):
        if a.ext == b.ext:
            return a, b, a.ext
        if a.ext:
            return a, DExpr(ef_from_base(b.arr), True), True
        return DExpr(ef_from_base(a.arr), True), b, True

    def __add__(self, other):
        a, b, ext = self._promote(self, self._coerce(other))
        return DExpr(ef_add(a.arr, b.arr) if ext else fp_add(a.arr, b.arr), ext)

    __radd__ = __add__

    def __sub__(self, other):
        a, b, ext = self._promote(self, self._coerce(other))
        return DExpr(ef_sub(a.arr, b.arr) if ext else fp_sub(a.arr, b.arr), ext)

    def __rsub__(self, other):
        return self._coerce(other).__sub__(self)

    def __mul__(self, other):
        other = self._coerce(other)
        if self.ext and not other.ext:
            return DExpr(ef_mul_base(self.arr, other.arr), True)
        if other.ext and not self.ext:
            return DExpr(ef_mul_base(other.arr, self.arr), True)
        if self.ext:
            return DExpr(ef_mul(self.arr, other.arr), True)
        return DExpr(fp_mul(self.arr, other.arr), False)

    __rmul__ = __mul__

    def __neg__(self):
        return DExpr(ef_neg(self.arr) if self.ext else fp_neg(self.arr), self.ext)


class ProverConstraintFolder(AirBuilder):
    """Evaluates all rows of the quotient coset at once.

    local/next rows: `next` is the trace rolled by -next_step (the coset point
    multiplied by the trace-domain generator), matching
    vertically_packed_row(i + next_step) wraparound (prover.rs:162-166)."""

    def __init__(
        self,
        trace_on_quotient_domain,  # (m, width) base Montgomery, natural order
        next_step: int,
        public_values: list[F],
        sels,  # LagrangeSelectors of device (m,) arrays
        alpha: EF4,
        next_rows=None,  # precomputed rolled rows (chunked quotient path)
    ):
        m, width = trace_on_quotient_domain.shape
        nxt = (
            jnp.roll(trace_on_quotient_domain, -next_step, axis=0)
            if next_rows is None
            else next_rows
        )
        self._main = TwoRowMatrixView(
            [DExpr(trace_on_quotient_domain[:, j], False) for j in range(width)],
            [DExpr(nxt[:, j], False) for j in range(width)],
        )
        self._public = public_values
        self._sels = sels
        # alpha: host EF4 scalar, a DExpr, or a traced (4,) Montgomery array
        if isinstance(alpha, DExpr):
            self._alpha = alpha
        elif isinstance(alpha, (EF4, F, int)):
            self._alpha = DExpr.const(alpha)
        else:
            self._alpha = DExpr(alpha, True)
        self.accumulator = DExpr(jnp.zeros((m, 4), jnp.uint32), True)

    def main(self):
        return self._main

    def is_first_row(self):
        return DExpr(self._sels.is_first_row, False)

    def is_last_row(self):
        return DExpr(self._sels.is_last_row, False)

    def is_transition_window(self, size: int):
        assert size == 2
        return DExpr(self._sels.is_transition, False)

    def public_values(self):
        return self._public

    def assert_zero(self, x):
        self.accumulator = self.accumulator * self._alpha + x


class VerifierConstraintFolder(AirBuilder):
    """Exact host evaluation at zeta (EF4 scalars)."""

    def __init__(
        self,
        trace_local: list[EF4],
        trace_next: list[EF4],
        public_values: list[F],
        sels,  # LagrangeSelectors of EF4 scalars
        alpha: EF4,
    ):
        self._main = TwoRowMatrixView(trace_local, trace_next)
        self._public = public_values
        self._sels = sels
        self._alpha = alpha
        self.accumulator = EF4.zero()

    def main(self):
        return self._main

    def is_first_row(self):
        return self._sels.is_first_row

    def is_last_row(self):
        return self._sels.is_last_row

    def is_transition_window(self, size: int):
        assert size == 2
        return self._sels.is_transition

    def public_values(self):
        return self._public

    def assert_zero(self, x):
        if isinstance(x, int):
            x = EF4((x, 0, 0, 0))
        if isinstance(x, F):
            x = EF4.from_base(x)
        self.accumulator = self.accumulator * self._alpha + x
