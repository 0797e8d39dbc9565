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


def test_sharded_constraint_chain_tamper_rejected():
    """The chunked constraint accumulator binds through bit-committed
    boundary values: corrupting a chunk's incoming accumulator (equivocation
    at the commitment layer) must make that chunk's script fail."""
    from tapstark.dsl.constraint_builder import (
        ScriptConstraintBuilder,
        emit_sharded_constraints,
    )
    from tapstark.dsl.expr import Expr, ManagerAssign, simulate
    import numpy as np

    from tapstark.field import EF4
    from tapstark.field.constants import P as _P

    rng = np.random.default_rng(5)
    w = 120
    local = [EF4([int(x) for x in rng.integers(0, _P, 4)]) for _ in range(w)]
    nxt = [EF4([int(x) for x in rng.integers(0, _P, 4)]) for _ in range(w)]
    alpha = EF4([3, 1, 4, 1])
    one = Expr.constant(F(1))
    rec = ScriptConstraintBuilder(None, local, nxt, [], one, one, one, alpha)
    main = rec.main()
    for j in range(w):
        rec.assert_zero(
            main.row(0)[j] * main.row(0)[(j + 1) % w] - main.row(1)[j]
        )

    # native fold
    cache = dict(rec.values)
    acc = None
    for c in rec.constraints:
        v = simulate(c, cache)
        v = v if isinstance(v, EF4) else EF4.from_base(v)
        acc = v if acc is None else acc * alpha + v
    ma = ManagerAssign()
    emit_sharded_constraints(ma, rec, alpha, acc)
    assert len(ma.managers) > 1, "must shard at this width"
    for m in ma.managers:
        m.run()  # all pass untampered

    # corrupt chunk 1's incoming accumulator (its first assigned input)
    victim = ma.managers[1]
    iv = victim.inputs[0]
    bad = list(iv.value.c)
    bad[0] = (bad[0] + 1) % _P
    iv.value = EF4(bad)
    with pytest.raises(AssertionError):
        victim.run()
