"""End-to-end uni-STARK tests: the Fibonacci golden path
(mirrors reference uni-stark/tests/fib_air.rs test_public_value: 2^3 rows,
blowup 2^2, 28 queries, 8 PoW bits), plus rejection tests."""

import numpy as np
import pytest

from tapstark.airs import FibonacciAir, generate_fibonacci_trace
from tapstark.air.symbolic import get_log_quotient_degree
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import VerificationError, check_constraints, prove, verify


def _make_pcs(num_queries, log_blowup, pow_bits=8):
    fri_cfg = FriConfig(
        log_blowup=log_blowup,
        num_queries=num_queries,
        proof_of_work_bits=pow_bits,
        mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
    )
    return TwoAdicFriPcs(TapTreeMmcs(BcManager(), num_queries, ext=False), fri_cfg)


def test_fib_constraint_degree():
    assert get_log_quotient_degree(FibonacciAir(), 3) == 0


def test_fib_check_constraints():
    trace = generate_fibonacci_trace(0, 1, 8)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    check_constraints(FibonacciAir(), trace, pis)
    bad = trace.copy()
    bad[3, 0] = 12345
    with pytest.raises(AssertionError):
        check_constraints(FibonacciAir(), bad, pis)


def test_fib_prove_verify_golden():
    # reference fib_air.rs test_public_value parameters
    num_queries = 28
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]

    p_ch = BfChallenger()
    proof = prove(pcs, FibonacciAir(), p_ch, trace, pis, debug=True)

    v_ch = BfChallenger()
    verify(pcs, FibonacciAir(), v_ch, proof, pis)

    # prover/verifier transcripts fully synchronized
    assert p_ch.sample_bits(10) == v_ch.sample_bits(10)
    assert proof.degree_bits == 3


def test_fib_wrong_public_values_rejected():
    num_queries = 4
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)

    bad_pis = [F(0), F(1), F(int(trace[-1, 1]) + 1)]
    with pytest.raises(VerificationError):
        verify(pcs, FibonacciAir(), BfChallenger(), proof, bad_pis)


def test_fib_tampered_proof_rejected():
    num_queries = 4
    pcs = _make_pcs(num_queries=num_queries, log_blowup=2)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)

    from tapstark.field import EF4

    proof.opened_values.trace_local[0] = proof.opened_values.trace_local[0] + EF4.one()
    with pytest.raises(VerificationError):
        verify(pcs, FibonacciAir(), BfChallenger(), proof, pis)


def test_fib_larger_trace():
    num_queries = 2
    pcs = _make_pcs(num_queries=num_queries, log_blowup=1, pow_bits=4)
    trace = generate_fibonacci_trace(0, 1, 1 << 5)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    p_ch = BfChallenger()
    proof = prove(pcs, FibonacciAir(), p_ch, trace, pis)
    v_ch = BfChallenger()
    verify(pcs, FibonacciAir(), v_ch, proof, pis)
    assert p_ch.sample_bits(10) == v_ch.sample_bits(10)
