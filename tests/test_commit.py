"""Commitment layer tests: taptree build/inclusion/index permutation,
padding_matrix interleave (vs the reference's documented expected leaves,
basic/src/tcs/mod.rs:594-602), TCS commit/open/verify roundtrips, TapTreeMmcs
over mixed-height matrices × query repetitions (mirrors
basic/src/mmcs/taptree_mmcs.rs:121-232)."""

import numpy as np

from tapstark.commit import (
    BcManager,
    FMatrix,
    TapTreeMmcs,
    TCS,
    build_taptree,
    padding_matrix,
    verify_inclusion,
)
from tapstark.field import EF4, F, P
from tapstark.script import ScriptBuilder
from tapstark.script import opcodes as op


def _mk_scripts(nums):
    return [ScriptBuilder().num(int(n)).emit(op.OP_ADD).build() for n in nums]


def test_taptree_build_and_logical_indexing():
    # mirrors complete_taptree.rs test_build_tree: logical index i must always
    # retrieve the i-th script despite hash-ordering swaps
    scripts = _mk_scripts(range(16))
    tree = build_taptree(scripts)
    assert tree.leaf_count() == 16
    for i, s in enumerate(scripts):
        leaf = tree.get_tapleaf(i)
        assert leaf.script == s, i
        assert verify_inclusion(tree.root_hash, leaf), i
        assert len(leaf.merkle_branch) == 4


def test_taptree_tamper_detection():
    scripts = _mk_scripts(range(8))
    tree = build_taptree(scripts)
    leaf = tree.get_tapleaf(3)
    # wrong root
    assert not verify_inclusion(b"\x00" * 32, leaf)
    # tampered script
    import copy

    bad = copy.deepcopy(leaf)
    bad.script = bad.script + b"\x51"
    assert not verify_inclusion(tree.root_hash, bad)


def _ref_matrices():
    mat_1 = FMatrix(np.array([[0, 1], [2, 1], [2, 2], [1, 0]], np.uint32))
    mat_2 = FMatrix(
        np.array(
            [[0, 1, 2, 1], [2, 2, 1, 0], [0, 1, 2, 1], [2, 2, 1, 0]], np.uint32
        )
    )
    mat_3 = FMatrix(np.array([[0], [1], [2], [1], [2], [2], [1], [0]], np.uint32))
    return mat_1, mat_2, mat_3


def test_padding_matrix_reference_vectors():
    # expected leaves documented in reference basic/src/tcs/mod.rs:594-602
    mat_1, mat_2, mat_3 = _ref_matrices()
    leaf_ys = padding_matrix([mat_1, mat_2, mat_3])
    expected = [
        [0, 0, 1, 0, 1, 2, 1],
        [1, 0, 1, 0, 1, 2, 1],
        [2, 2, 1, 2, 2, 1, 0],
        [1, 2, 1, 2, 2, 1, 0],
        [2, 2, 2, 0, 1, 2, 1],
        [2, 2, 2, 0, 1, 2, 1],
        [1, 1, 0, 2, 2, 1, 0],
        [0, 1, 0, 2, 2, 1, 0],
    ]
    got = [[limbs[0] for limbs in ys] for ys in leaf_ys]
    assert got == expected


def test_tcs_commit_open_verify():
    # mirrors tcs/mod.rs test_taptree_mmcs
    mat_1, mat_2, mat_3 = _ref_matrices()
    tcs = TCS(BcManager())
    data = tcs.commit_poly_with_query_times([mat_1, mat_2, mat_3], 1)
    root = data[0].commit_taptree.root_hash
    for index in range(8):
        proof, limbs = tcs.open_with_one_query(0, index, data)
        assert TCS.verify(root, proof, limbs), index
    # wrong values rejected
    proof, limbs = tcs.open_with_one_query(0, 0, data)
    bad = [list(l) for l in limbs]
    bad[0][0] = (bad[0][0] + 1) % 7
    assert not TCS.verify(root, proof, bad)


def test_tcs_deterministic_roots():
    mat_1, mat_2, mat_3 = _ref_matrices()
    r1 = TCS(BcManager()).commit_polys([mat_1, mat_2, mat_3]).commit_taptree.root_hash
    m1b = FMatrix(mat_1.values.copy())
    m2b = FMatrix(mat_2.values.copy())
    m3b = FMatrix(mat_3.values.copy())
    r2 = TCS(BcManager()).commit_polys([m1b, m2b, m3b]).commit_taptree.root_hash
    assert r1 == r2


def test_taptree_mmcs_roundtrip_multi_query():
    # mirrors taptree_mmcs.rs test: tallest-first inputs, 8 indices x query reps
    mat_1, mat_2, mat_3 = _ref_matrices()
    query_times = 3
    mmcs = TapTreeMmcs(BcManager(), query_times, ext=False)
    commits, prover_data = mmcs.commit([mat_3, mat_2, mat_1])
    assert len(commits) == query_times and all(len(r) == 8 for r in commits)
    for query_index in range(8):
        for qti in range(query_times):
            openings, proof = mmcs.open_batch(qti, query_index, prover_data)
            assert [len(r) for r in openings] == [1, 4, 2]
            assert mmcs.verify_batch(qti, openings, proof, commits), (
                query_index,
                qti,
            )
    # query repetitions have distinct roots (fresh bit commitments)
    assert commits[0] != commits[1]
    # proof from one repetition fails against another root
    openings, proof = mmcs.open_batch(0, 2, prover_data)
    assert not mmcs.verify_batch(1, openings, proof, commits)


def test_taptree_mmcs_extension_field():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2013265921, (8, 2, 4)).astype(np.uint32)
    m = FMatrix(vals)
    mmcs = TapTreeMmcs(BcManager(), 2, ext=True)
    commits, data = mmcs.commit_matrix(m)
    for idx in range(8):
        openings, proof = mmcs.open_batch(0, idx, data)
        assert isinstance(openings[0][0], EF4)
        assert openings[0][0] == EF4([int(x) for x in vals[idx, 0]])
        assert mmcs.verify_batch(0, openings, proof, commits)
        # tampered opened value fails
        openings[0][1] = openings[0][1] + EF4.one()
        assert not mmcs.verify_batch(0, openings, proof, commits)


def test_device_commit_matches_host_roots():
    """The device (jnp) taptree path must be byte-identical to the host
    engine: same roots, same upper levels, same opened branches."""
    import os

    import numpy as np

    from tapstark.commit.tcs import TCS, FMatrix

    rng = np.random.default_rng(3)
    cases = [
        [FMatrix(rng.integers(0, P, (64, 2)).astype(np.uint32))],
        [FMatrix(rng.integers(0, P, (32, 2, 4)).astype(np.uint32))],
        [
            FMatrix(rng.integers(0, P, (64, 2)).astype(np.uint32)),
            FMatrix(rng.integers(0, P, (16, 3)).astype(np.uint32)),
        ],
        [FMatrix(rng.integers(0, P, (16, 60)).astype(np.uint32))],
    ]
    old = os.environ.get("TAPSTARK_DEVICE_COMMIT")
    try:
        for mats in cases:
            os.environ["TAPSTARK_DEVICE_COMMIT"] = "1"
            d1 = TCS(BcManager()).commit_poly_with_query_times(mats, 2)
            os.environ["TAPSTARK_DEVICE_COMMIT"] = "0"
            d2 = TCS(BcManager()).commit_poly_with_query_times(mats, 2)
            for r in range(2):
                assert [t.root_hash for t in d1[r].trees] == [
                    t.root_hash for t in d2[r].trees
                ]
                q1 = d1[r].query_proof(5)
                q2 = d2[r].query_proof(5)
                s1 = q1.shards if hasattr(q1, "shards") else [q1]
                s2 = q2.shards if hasattr(q2, "shards") else [q2]
                for a, b in zip(s1, s2):
                    assert a.leaf.script == b.leaf.script
                    assert a.leaf.leaf_hash == b.leaf.leaf_hash
                    assert a.leaf.merkle_branch == b.leaf.merkle_branch
    finally:
        if old is None:
            os.environ.pop("TAPSTARK_DEVICE_COMMIT", None)
        else:
            os.environ["TAPSTARK_DEVICE_COMMIT"] = old


def test_sign_many_matches_scalar_sign():
    """Native 8-lane batched digit signing produces exactly the witness items
    of the scalar Python sign() (winternitz.rs:139-153 semantics)."""
    from tapstark.commit.winternitz import N0, Winternitz, sign_many, to_digits

    rng = np.random.default_rng(7)
    wins = [Winternitz(bytes(rng.integers(0, 256, 20, dtype=np.uint8))) for _ in range(11)]
    msgs = [to_digits(int(v), N0) for v in rng.integers(0, 1 << 32, 11, dtype=np.uint64)]
    batched = sign_many(wins, msgs)
    scalar = [w.sign(m) for w, m in zip(wins, msgs)]
    assert batched == scalar
