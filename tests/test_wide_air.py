"""WideAir: constraint correctness and a small end-to-end prove/verify."""

import pytest

from tapstark.airs.wide import WideAir, generate_wide_trace
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import check_constraints, prove, verify


def test_wide_air_constraints():
    trace, pis = generate_wide_trace(17, 8)
    check_constraints(WideAir(17), trace, [F(x) for x in pis])
    bad = trace.copy()
    bad[2, 5] = (int(bad[2, 5]) + 1) % 7
    with pytest.raises(AssertionError):
        check_constraints(WideAir(17), bad, [F(x) for x in pis])


def test_wide_air_prove_verify():
    nq = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    # the full 163-column config (BASELINE.md wide-table shape): 163 values
    # per interleaved leaf -> 5 column shards, each within the real Bitcoin
    # stack limit (see test_sharded_commit.py)
    trace, pis = generate_wide_trace(163, 8)
    pis_f = [F(x) for x in pis]
    proof = prove(pcs, WideAir(163), BfChallenger(), trace, pis_f, debug=True)
    verify(pcs, WideAir(163), BfChallenger(), proof, pis_f)
    from tapstark.commit.tcs import shard_bounds
    assert len(proof.commitments.trace[0]) == 8 * len(shard_bounds(163))


def test_wide_air_script_verifier_spills_and_executes():
    """163 columns exceed the 1000-element stack in a single script: the FRI
    reduced-opening spills into chained ro-part scripts (fri/pcs.py) and the
    constraint segment shards into accumulator-chunk scripts
    (dsl/constraint_builder.py:emit_sharded_constraints). Every emitted
    segment must EXECUTE under the Tapscript interpreter (run_scripts=True
    inside generate_script_verifier) — the reference can only estimate this
    shape (/root/reference/README.md:90,101)."""
    nq = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    trace, pis = generate_wide_trace(163, 8)
    pis_f = [F(x) for x in pis]
    air = WideAir(163)
    challenger = BfChallenger()
    proof = prove(pcs, air, challenger, trace, pis_f)

    from tapstark.stark.script_verifier import generate_script_verifier

    report = generate_script_verifier(pcs, air, BfChallenger(), proof, pis_f)
    seg = report.segment_script_bytes
    assert any("ro-part" in k for k in seg), "FRI reduced-opening must spill"
    assert any("trace-constraints part:" in k for k in seg), (
        "constraint segment must shard"
    )
    # the spilled pieces replace, not duplicate, the monolithic segments
    assert "trace-constraints" not in seg
    assert report.total_script_bytes == sum(seg.values())
