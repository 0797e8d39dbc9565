"""Parity extras: taptree combine, TestPermutation fake backend, leaf-index
helper, device grind path."""

from tapstark.challenger import BfChallenger, TestPermutation
from tapstark.commit.taptree import build_taptree, combine_taptrees, verify_inclusion
from tapstark.fri.proof import get_leaf_index_by_query_index
from tapstark.script import ScriptBuilder
from tapstark.script import opcodes as op


def _mk_scripts(nums):
    return [ScriptBuilder().num(int(n)).emit(op.OP_ADD).build() for n in nums]


def test_combine_taptrees():
    # mirrors complete_taptree.rs test_combine_tree
    a = build_taptree(_mk_scripts(range(8)))
    b = build_taptree(_mk_scripts(range(8, 16)))
    c = combine_taptrees(a, b)
    for i in range(16):
        leaf = c.get_tapleaf(i)
        assert leaf.script == _mk_scripts([i])[0], i
        assert verify_inclusion(c.root_hash, leaf), i
    # reversed combination: b's leaves take the low logical indices
    c2 = combine_taptrees(b, a)
    expect = list(range(8, 16)) + list(range(8))
    for i, v in enumerate(expect):
        assert c2.get_tapleaf(i).script == _mk_scripts([v])[0]
        assert verify_inclusion(c2.root_hash, c2.get_tapleaf(i))


def test_combine_different_depths():
    a = build_taptree(_mk_scripts(range(8)))
    b = build_taptree(_mk_scripts(range(8, 12)))
    c = combine_taptrees(a, b)
    for i in range(12):
        assert c.get_tapleaf(i).script == _mk_scripts([i])[0]
        assert verify_inclusion(c.root_hash, c.get_tapleaf(i))


def test_fake_permutation_challenger():
    from tapstark.field import P

    ch = BfChallenger(field="ext", permutation=TestPermutation())
    ch.observe_u32s(range(8))
    s = ch.sample()
    # fake duplex step: mixed[i] = (cv[i]^block[i]) + block[i+8] + b + i,
    # output reversed; pop from the end -> first popped word is mixed[0]
    fake = TestPermutation()
    from tapstark.hashes.blake3 import IV

    out = fake.compress(list(IV), list(range(8)) + [0] * 8, 32)
    assert s.c[0] == out[7] % P and s.c[1] == out[6] % P


def test_leaf_index_helper():
    assert get_leaf_index_by_query_index(0b1101) == (0b11, 0b110, 0b111)


def test_device_grind_matches_host():
    ch1 = BfChallenger()
    ch1.observe_u32s([9] * 8)
    w1 = ch1.grind(5, use_device=False)
    ch2 = BfChallenger()
    ch2.observe_u32s([9] * 8)
    w2 = ch2.grind(5, use_device=True, batch=1 << 12)
    assert w1 == w2
    assert ch1.cv == ch2.cv
