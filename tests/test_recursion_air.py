"""RecursionAir (the circuit-real 163-col recursion-shaped wide table):
constraint correctness, tamper rejection, and an end-to-end prove/verify
with the sharded script verifier executing every segment."""

import pytest

from tapstark.airs.recursion import (
    NUM_COLS,
    RecursionAir,
    generate_recursion_trace,
)
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import check_constraints, prove, verify


def test_recursion_air_shape():
    assert NUM_COLS == 163
    trace, pis = generate_recursion_trace(8)
    assert trace.shape == (8, 163)
    assert len(pis) == 12


def test_recursion_air_constraints():
    trace, pis = generate_recursion_trace(8)
    check_constraints(RecursionAir(), trace, [F(x) for x in pis])


@pytest.mark.parametrize(
    "r,c",
    [
        (2, 5),  # x bit
        (3, 70),  # z bit (xor/rot relation)
        (4, 129),  # carry bit
        (5, 140),  # m bit
        (2, 150),  # e1 component (breaks facc chaining)
        (3, 156),  # bacc component
        (6, 160),  # facc component
    ],
)
def test_recursion_air_tamper_rejected(r, c):
    trace, pis = generate_recursion_trace(8)
    bad = trace.copy()
    bad[r, c] = (int(bad[r, c]) + 1) % 1000003
    with pytest.raises(AssertionError):
        check_constraints(RecursionAir(), bad, [F(x) for x in pis])


def test_recursion_air_prove_verify_script():
    nq = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    trace, pis = generate_recursion_trace(8)
    pis_f = [F(x) for x in pis]
    air = RecursionAir()
    proof = prove(pcs, air, BfChallenger(), trace, pis_f, debug=True)
    verify(pcs, air, BfChallenger(), proof, pis_f)

    from tapstark.stark.script_verifier import generate_script_verifier

    report = generate_script_verifier(
        pcs, air, BfChallenger(), proof, pis_f
    )
    # every segment executed (run_scripts defaults True); the wide shape
    # must shard the constraint accumulator and spill the reduced opening
    names = list(report.segment_script_bytes)
    assert any("trace-constraints" in n for n in names)
    assert report.distinct_u32_count > 0
