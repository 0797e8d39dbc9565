"""Script-verifier emission tests (mirror reference uni-stark/tests/fib_air.rs
test_generate_script_expr, 6 queries): every emitted segment executes
successfully under the Tapscript interpreter; tampered proofs fail."""

import numpy as np
import pytest

from tapstark.airs import FibonacciAir, generate_fibonacci_trace
from tapstark.airs.mul import MulAir, generate_mul_trace
from tapstark.air.symbolic import get_log_quotient_degree
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import EF4, F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import check_constraints, prove, verify
from tapstark.stark.script_verifier import generate_script_verifier


def _make_pcs(num_queries, log_blowup, pow_bits=8):
    fri_cfg = FriConfig(
        log_blowup=log_blowup,
        num_queries=num_queries,
        proof_of_work_bits=pow_bits,
        mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
    )
    return TwoAdicFriPcs(TapTreeMmcs(BcManager(), num_queries, ext=False), fri_cfg)


def test_fib_generate_script_verifier():
    # reference test_generate_script_expr parameters: 2^3 rows, blowup 2^2,
    # 6 queries, 8 PoW bits
    num_queries = 6
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)

    report = generate_script_verifier(
        pcs, FibonacciAir(), BfChallenger(), proof, pis
    )
    # 6 FRI-query segments + quotient + constraints
    assert len(report.segment_script_bytes) == num_queries + 3
    assert report.total_script_bytes > 0
    assert report.distinct_u32_count > 0
    names = list(report.segment_script_bytes)
    assert any("fri-pcs-verify" in n for n in names)
    assert "compute-quotient" in names
    assert "trace-constraints" in names


def test_mul_air_native_and_script():
    air = MulAir()
    assert get_log_quotient_degree(air, 3) == 1  # two quotient chunks
    n = 1 << 3
    trace = generate_mul_trace(3, 5, n)
    pis = [F(3), F(5), F(int(trace[-1, 0]))]
    check_constraints(air, trace, pis)

    num_queries = 2
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2, pow_bits=4)
    proof = prove(pcs, air, BfChallenger(), trace, pis, debug=True)
    verify(pcs, air, BfChallenger(), proof, pis)

    report = generate_script_verifier(pcs, air, BfChallenger(), proof, pis)
    assert len(report.segment_script_bytes) == num_queries + 3


def test_script_verifier_rejects_tampered_openings():
    num_queries = 2
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2, pow_bits=4)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)
    proof.opened_values.quotient_chunks[0][0] = (
        proof.opened_values.quotient_chunks[0][0] + EF4.one()
    )
    with pytest.raises(Exception):
        generate_script_verifier(pcs, FibonacciAir(), BfChallenger(), proof, pis)


def test_fold_hint_tamper_rejected():
    """The multiplied-through fold identity binds the committed folded
    value: corrupting a query's g hint must fail that query's script."""
    num_queries = 2
    pcs = _make_pcs(num_queries=num_queries, log_blowup=1, pow_bits=2)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    challenger = BfChallenger()
    proof = prove(pcs, FibonacciAir(), challenger, trace, pis)

    ch = BfChallenger()
    ch.observe_commitment(proof.commitments.trace)
    ch.sample()  # alpha
    ch.observe_commitment(proof.commitments.quotient_chunks)
    zeta = ch.sample()
    from tapstark.poly.domain import TwoAdicMultiplicativeCoset

    trace_domain = pcs.natural_domain_for_degree(1 << proof.degree_bits)
    zeta_next = trace_domain.next_point(zeta)
    from tapstark.air.symbolic import get_log_quotient_degree as qd

    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (proof.degree_bits + qd(FibonacciAir(), len(pis)))
    )
    chunks = quotient_domain.split_domains(1 << qd(FibonacciAir(), len(pis)))
    ov = proof.opened_values
    ma = pcs.generate_verify_expr(
        [
            (proof.commitments.trace,
             [(trace_domain, [(zeta, ov.trace_local), (zeta_next, ov.trace_next)])]),
            (proof.commitments.quotient_chunks,
             [(d, [(zeta, v)]) for d, v in zip(chunks, ov.quotient_chunks)]),
        ],
        proof.opening_proof,
        ch,
    )
    m = ma.managers[0]
    m.run()  # untampered passes
    # corrupt the first EF4 hint input (a fold g or a ro group quotient)
    from tapstark.field.constants import P as _P

    hint = next(iv for iv in m.inputs if iv.is_hint and isinstance(iv.value, EF4))
    bad = list(hint.value.c)
    bad[0] = (bad[0] + 1) % _P
    hint.value = EF4(bad)
    with pytest.raises(AssertionError):
        m.run()
