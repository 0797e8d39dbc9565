"""Two-adic multiplicative coset domains (host algebra + device selectors).

Reference parity: p3-commit TwoAdicMultiplicativeCoset
(used throughout /root/reference/uni-stark/src/prover.rs and verifier.rs):
create_disjoint_domain, split_domains, split_evals, zp_at_point,
selectors_at_point, selectors_on_coset, next_point.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..field.constants import P
from ..field.device import MONT_ONE, fp_inv, fp_mul, fp_pow, fp_sub, np_to_mont
from ..field.scalar import EF4, F
from ..utils import log2_ceil, log2_strict


@dataclass(frozen=True)
class LagrangeSelectors:
    """Unnormalized Lagrange selectors (Plonky3 convention — prover and
    verifier use the same unnormalized definition, so the missing 1/n cancels)."""

    is_first_row: object
    is_last_row: object
    is_transition: object
    inv_zeroifier: object


@dataclass(frozen=True)
class TwoAdicMultiplicativeCoset:
    log_n: int
    shift: int  # canonical u32

    def size(self) -> int:
        return 1 << self.log_n

    def first_point(self) -> F:
        return F(self.shift)

    def gen(self) -> F:
        return F.two_adic_generator(self.log_n)

    def next_point(self, x: EF4) -> EF4:
        return x * EF4.from_base(self.gen())

    def create_disjoint_domain(self, min_size: int) -> "TwoAdicMultiplicativeCoset":
        return TwoAdicMultiplicativeCoset(
            log_n=log2_ceil(min_size),
            shift=self.shift * F.generator().v % P,
        )

    def split_domains(self, num_chunks: int) -> list["TwoAdicMultiplicativeCoset"]:
        log_chunks = log2_strict(num_chunks)
        g = self.gen()
        return [
            TwoAdicMultiplicativeCoset(
                log_n=self.log_n - log_chunks,
                shift=self.shift * g.exp(i).v % P,
            )
            for i in range(num_chunks)
        ]

    def split_evals(self, num_chunks: int, evals):
        """Vertically-strided split of a (size, w) device/numpy matrix:
        chunk i holds rows i, i+num_chunks, ... (Plonky3 split_evals)."""
        return [evals[i::num_chunks] for i in range(num_chunks)]

    def zp_at_point(self, point: EF4) -> EF4:
        shift_inv = F(self.shift).inverse()
        return (point * EF4.from_base(shift_inv)).exp_power_of_2(self.log_n) - EF4.one()

    def selectors_at_point(self, point: EF4) -> LagrangeSelectors:
        unshifted = point * EF4.from_base(F(self.shift).inverse())
        z_h = unshifted.exp_power_of_2(self.log_n) - EF4.one()
        sub_last = EF4.from_base(self.gen().inverse())
        return LagrangeSelectors(
            is_first_row=z_h * (unshifted - EF4.one()).inverse(),
            is_last_row=z_h * (unshifted - sub_last).inverse(),
            is_transition=unshifted - sub_last,
            inv_zeroifier=z_h.inverse(),
        )

    def selectors_on_coset(self, coset: "TwoAdicMultiplicativeCoset") -> LagrangeSelectors:
        """Selectors of this (shift-1) domain evaluated over `coset`, as
        device (coset.size(),) base Montgomery arrays, natural order.

        Runs as ONE jitted program with the coset points generated on
        device: the eager form paid a coset-sized host table upload plus
        ~130 dispatches of inverse pow-chains per prove (seconds over the
        remote relay)."""
        assert self.shift == 1, "selectors_on_coset expects the natural domain"
        assert self.log_n <= coset.log_n
        sels = _selectors_on_coset_jit(
            gen=coset.gen().v,
            shift=coset.shift,
            log_m=coset.log_n,
            trace_size=self.size(),
            sub_last=self.gen().inverse().v,
        )
        return LagrangeSelectors(*sels)

def _selectors_impl(gen: int, shift: int, log_m: int, trace_size: int, sub_last: int):
    from .powers import _geom_powers_mont_impl, _scalar_mont

    xs = _geom_powers_mont_impl(_scalar_mont(gen), _scalar_mont(shift), log_m)
    one = jnp.uint32(MONT_ONE)
    zh = fp_sub(fp_pow(xs, trace_size), jnp.broadcast_to(one, xs.shape))
    last = jnp.uint32(int(np_to_mont(np.array([sub_last], np.uint32))[0]))
    xs_minus_one = fp_sub(xs, jnp.broadcast_to(one, xs.shape))
    xs_minus_last = fp_sub(xs, jnp.broadcast_to(last, xs.shape))
    return (
        fp_mul(zh, fp_inv(xs_minus_one)),
        fp_mul(zh, fp_inv(xs_minus_last)),
        xs_minus_last,
        fp_inv(zh),
    )


import functools as _functools  # noqa: E402


@_functools.lru_cache(maxsize=None)
def _selectors_on_coset_jit_fn():
    import jax

    return jax.jit(
        _selectors_impl,
        static_argnames=("gen", "shift", "log_m", "trace_size", "sub_last"),
    )


def _selectors_on_coset_jit(**kw):
    return _selectors_on_coset_jit_fn()(**kw)
