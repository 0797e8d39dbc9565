"""Chunked quotient evaluation (stark/prover.py): the lax.map row-chunked
program must produce EXACTLY the whole-coset program's accumulator.

The chunked path bounds XLA's live constraint intermediates for wide AIRs
(the 2^17x1548 Blake3 AIR peaked >80 GB whole-coset — OOM); correctness
requires every constraint input to be sliced by the same row partition with
the next-row roll applied BEFORE chunking. Reference anchor for the quotient
semantics: /root/reference/uni-stark/src/prover.rs:121-194.
"""

import numpy as np

from tapstark.airs import FibonacciAir, generate_fibonacci_trace
from tapstark.field import F
from tapstark.field.device import np_from_mont, to_mont
from tapstark.field.scalar import EF4
from tapstark.fri.pcs import _lde_jit
from tapstark.poly.ntt import bit_reverse_rows
from tapstark.stark import prover as prover_mod
from tapstark.stark.prover import quotient_values
from tapstark.utils import log2_strict


def _quotient(air, trace, public_values, alpha, log_blowup=1):
    degree = trace.shape[0]
    from tapstark.poly.domain import TwoAdicMultiplicativeCoset

    trace_domain = TwoAdicMultiplicativeCoset(log2_strict(degree), 1)
    quotient_domain = trace_domain.create_disjoint_domain(degree << log_blowup)
    shift = (F.generator() * F(trace_domain.shift).inverse()).v
    lde = _lde_jit(to_mont(trace), log_blowup, shift)
    # natural order rows of the quotient coset
    tq = lde
    return quotient_values(
        air, public_values, trace_domain, quotient_domain, tq, alpha
    )


def test_chunked_matches_whole_coset():
    air = FibonacciAir()
    n = 1 << 8
    trace = generate_fibonacci_trace(0, 1, n)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    alpha = EF4([3, 5, 7, 11])

    prover_mod._quotient_jit_cache.clear()
    whole = np_from_mont(np.asarray(_quotient(air, trace, pis, alpha)))

    saved = (
        prover_mod._QUOTIENT_CHUNK_ROWS,
        prover_mod._QUOTIENT_CHUNK_THRESHOLD,
    )
    prover_mod._QUOTIENT_CHUNK_ROWS = 1 << 5
    prover_mod._QUOTIENT_CHUNK_THRESHOLD = 1
    prover_mod._QUOTIENT_CHUNK_FORCE = True
    prover_mod._quotient_jit_cache.clear()
    try:
        chunked = np_from_mont(np.asarray(_quotient(air, trace, pis, alpha)))
    finally:
        (
            prover_mod._QUOTIENT_CHUNK_ROWS,
            prover_mod._QUOTIENT_CHUNK_THRESHOLD,
        ) = saved
        prover_mod._QUOTIENT_CHUNK_FORCE = False
        prover_mod._quotient_jit_cache.clear()

    assert whole.shape == chunked.shape
    assert (whole == chunked).all()
