"""Challenger tests: sponge semantics vs an independent step-by-step model,
duplexing rules, extension sampling order, sample_bits, PoW grind."""

import numpy as np

from tapstark.challenger import BfChallenger, Blake3Permutation
from tapstark.field import EF4, F, P
from tapstark.hashes import blake3


def _permute_model(words):
    data = b"".join(int(w).to_bytes(4, "little") for w in words)
    h = blake3(data)
    return [0] * 8 + [int.from_bytes(h[4 * i : 4 * i + 4], "little") for i in range(8)]


def test_permutation_semantics():
    words = list(range(16))
    assert Blake3Permutation().permute(words) == _permute_model(words)


def test_observe_8_triggers_duplex_and_sample_order():
    ch = BfChallenger(field="ext")
    obs = [10, 20, 30, 40, 50, 60, 70, 80]
    for w in obs:
        ch.observe(w)
    # model: state was zeros; inputs overwrite state[0..8]
    st = _permute_model(obs + [0] * 8)
    assert ch.sponge_state == st
    # ext sample pops state[15], 14, 13, 12 (mod p) as coefficients 0..3
    s = ch.sample()
    assert isinstance(s, EF4)
    assert s.c == tuple(st[15 - i] % P for i in range(4))
    # second ext sample continues popping 11, 10, 9, 8
    s2 = ch.sample()
    assert s2.c == tuple(st[11 - i] % P for i in range(4))
    # third sample: outputs exhausted → duplex with unchanged inputs
    st2 = _permute_model(st)
    s3 = ch.sample()
    assert s3.c == tuple(st2[15 - i] % P for i in range(4))


def test_observe_invalidates_outputs_and_partial_inputs():
    ch = BfChallenger(field="base")
    for w in range(8):
        ch.observe(w)
    _ = ch.sample()
    # a new observe invalidates remaining outputs; next sample re-duplexes
    ch.observe(99)
    st_before = list(ch.sponge_state)
    s = ch.sample()
    # pending input [99] overwrites state[0] then permute
    st = _permute_model([99] + st_before[1:])
    assert s == F(st[15] % P)


def test_base_vs_ext_sampling():
    ch = BfChallenger(field="base")
    ch.observe_u32s(range(8))
    st = _permute_model(list(range(8)) + [0] * 8)
    assert ch.sample() == F(st[15] % P)
    assert ch.sample() == F(st[14] % P)


def test_sample_bits():
    ch = BfChallenger(field="ext")
    ch.observe_u32s(range(8))
    st = _permute_model(list(range(8)) + [0] * 8)
    ch2 = BfChallenger(field="ext")
    ch2.observe_u32s(range(8))
    got = ch2.sample_bits(5)
    assert got == (st[15] % P) >> 27


def test_grind_and_check_witness():
    bits = 6
    ch = BfChallenger(field="ext")
    ch.observe_u32s([3, 1, 4, 1, 5, 9, 2, 6])
    ref_state = list(ch.sponge_state)
    w = ch.grind(bits)
    # independent scalar verification: smallest witness
    for cand in range(w):
        probe = BfChallenger(field="ext")
        probe.sponge_state = list(ref_state)
        assert not probe.check_witness(bits, cand), cand
    probe = BfChallenger(field="ext")
    probe.sponge_state = list(ref_state)
    assert probe.check_witness(bits, w)
    # transcript advanced identically
    assert probe.sponge_state == ch.sponge_state
    assert ch.grind_bits == bits


def test_commitment_observe_order():
    roots = [[i * 8 + j for j in range(8)] for i in range(2)]
    ch = BfChallenger(field="ext")
    ch.observe_commitment(roots)
    st = _permute_model(list(range(8)) + [0] * 8)
    st = _permute_model(list(range(8, 16)) + st[8:])
    assert ch.sponge_state == st
