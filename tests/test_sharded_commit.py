"""Wide-trace commitment sharding: leaves wider than MAX_LEAF_VALUES split
column-wise into multiple taptrees so every leaf script executes within
Bitcoin's real 1000-element stack limit (the reference cannot do this — its
wide-table rows are estimates, /root/reference/README.md:90)."""

import numpy as np
import pytest

from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.commit.tcs import (
    MAX_LEAF_VALUES,
    TCS,
    FMatrix,
    ShardedCommitedProof,
    shard_bounds,
)
from tapstark.field import F
from tapstark.field.constants import P
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.script.interpreter import MAX_STACK, execute_script
from tapstark.stark import prove, verify
from tapstark.stark.serde import proof_from_bytes, proof_to_bytes


def test_shard_bounds():
    assert shard_bounds(1) == [(0, 1)]
    assert shard_bounds(MAX_LEAF_VALUES) == [(0, MAX_LEAF_VALUES)]
    for v in (MAX_LEAF_VALUES + 1, 100, 326, 500):
        b = shard_bounds(v)
        assert b[0][0] == 0 and b[-1][1] == v
        assert all(hi - lo <= MAX_LEAF_VALUES for lo, hi in b)
        assert all(b[i][1] == b[i + 1][0] for i in range(len(b) - 1))
        sizes = [hi - lo for lo, hi in b]
        assert max(sizes) - min(sizes) <= 1  # balanced


def test_sharded_commit_open_verify_real_stack_limit():
    rng = np.random.default_rng(7)
    width = 60  # 60 values/leaf (base, 8 rows -> interleave keeps 2 rows/leaf)
    mat = FMatrix(rng.integers(0, P, (8, width)).astype(np.uint32))
    tcs = TCS(BcManager())
    data = tcs.commit_polys([mat])
    assert len(data.trees) > 1  # actually sharded
    roots = data.root_words()
    assert len(roots) == 8 * len(data.trees)

    proof = data.query_proof(3)
    assert isinstance(proof, ShardedCommitedProof)
    limbs = data.leaf_limbs(3)
    assert TCS.verify_words(roots, proof, limbs)

    # every shard's leaf script must execute under Bitcoin's REAL limit
    from tapstark.commit.tcs import _leaf_witness

    bounds = shard_bounds(len(limbs))
    for (lo, hi), sp in zip(bounds, proof.shards):
        witness = _leaf_witness(sp.use_bcs, sp.query_index, limbs[lo:hi])
        assert len(witness) < MAX_STACK
        res = execute_script(sp.leaf.script, witness, stack_limit=MAX_STACK)
        assert res.success, "shard leaf script must fit the consensus stack"

    # tamper: wrong opened value in the last shard
    bad = [list(x) for x in limbs]
    bad[-1][0] = (bad[-1][0] + 1) % P
    assert not TCS.verify_words(roots, proof, bad)

    # tamper: swap two shard proofs
    if len(proof.shards) > 1:
        swapped = ShardedCommitedProof(shards=list(reversed(proof.shards)))
        assert not TCS.verify_words(roots, swapped, limbs)


def test_sharded_wide_air_prove_verify_serde():
    nq = 2
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    from tapstark.airs.wide import WideAir, generate_wide_trace

    cols = 60  # 60 values per interleaved leaf -> 2 shards
    trace, pis = generate_wide_trace(cols, 8)
    pis_f = [F(x) for x in pis]
    proof = prove(pcs, WideAir(cols), BfChallenger(), trace, pis_f)
    verify(pcs, WideAir(cols), BfChallenger(), proof, pis_f)

    # trace commitment carries one root per shard per query repetition
    assert len(proof.commitments.trace[0]) == 8 * 2

    blob = proof_to_bytes(proof)
    rt = proof_from_bytes(blob)
    assert proof_to_bytes(rt) == blob
    verify(pcs, WideAir(cols), BfChallenger(), rt, pis_f)


def test_sharded_trace_script_verifier():
    """The Bitcoin-script verifier emission runs over a SHARDED trace
    commitment: every emitted segment executes under the interpreter."""
    from tapstark.airs.wide import WideAir, generate_wide_trace
    from tapstark.stark.script_verifier import generate_script_verifier

    nq = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    cols = 44  # just past MAX_LEAF_VALUES -> 2 shards
    trace, pis = generate_wide_trace(cols, 8)
    pis_f = [F(x) for x in pis]
    proof = prove(pcs, WideAir(cols), BfChallenger(), trace, pis_f)
    assert len(proof.commitments.trace[0]) == 16  # sharded
    rep = generate_script_verifier(pcs, WideAir(cols), BfChallenger(), proof, pis_f)
    assert rep.total_script_bytes > 0
    assert len(rep.segment_script_bytes) == nq + 3
