"""Blake3 G-chain AIR: constraint correctness, end-to-end prove/verify with
the wide bit-decomposed trace, script-verifier emission (sizes only)."""

import numpy as np
import pytest

from tapstark.airs.blake3g import NUM_COLS, Blake3GAir, generate_blake3g_trace
from tapstark.air.symbolic import get_log_quotient_degree, get_max_constraint_degree
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import check_constraints, prove, verify


def test_blake3g_trace_and_constraints():
    trace, pis = generate_blake3g_trace((1, 2, 3, 0xDEADBEEF), 16)
    assert trace.shape == (16, NUM_COLS)
    air = Blake3GAir()
    assert get_max_constraint_degree(air, len(pis)) == 2
    assert get_log_quotient_degree(air, len(pis)) == 0
    check_constraints(air, trace, [F(x) for x in pis])

    # corrupt one xor output bit -> constraint failure
    bad = trace.copy()
    from tapstark.airs.blake3g import _OFFSETS

    bad[3, _OFFSETS["d1"] + 5] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad, [F(x) for x in pis])

    # corrupt a carry bit -> addition constraint failure
    bad2 = trace.copy()
    bad2[2, _OFFSETS["ca1"]] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad2, [F(x) for x in pis])


def test_blake3g_prove_verify():
    num_queries = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=num_queries,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), num_queries, ext=False), fri)
    trace, pis = generate_blake3g_trace((7, 8, 9, 10), 8)
    pis_f = [F(x) for x in pis]
    air = Blake3GAir()
    p_ch = BfChallenger()
    proof = prove(pcs, air, p_ch, trace, pis_f)
    v_ch = BfChallenger()
    verify(pcs, air, v_ch, proof, pis_f)
    assert p_ch.sample_bits(10) == v_ch.sample_bits(10)

    # wrong initial state rejected
    bad_pis = list(pis_f)
    bad_pis[0] = bad_pis[0] + F(1)
    from tapstark.stark import VerificationError

    with pytest.raises(VerificationError):
        verify(pcs, air, BfChallenger(), proof, bad_pis)
