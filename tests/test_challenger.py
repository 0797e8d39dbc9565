"""Challenger tests: duplex semantics vs an independent step-by-step model,
compression/buffer rules, extension sampling order, sample_bits, PoW grind.

Challenger v2 (see tapstark/challenger): duplex on the blake3 compression
function, cv chained from IV, 16-word absorb rate with zero-padded
length-bound partial blocks, 8 output words popped from the END (h7 first),
sample_bits pops ONE raw word.
"""

import numpy as np

from tapstark.challenger import FLAGS, BfChallenger
from tapstark.field import EF4, F, P
from tapstark.hashes.blake3 import IV, compress


def _step_model(cv, words):
    """Independent duplex step: compress the (zero-padded) pending words."""
    block = list(words) + [0] * (16 - len(words))
    return compress(cv, block, 0, 4 * len(words), FLAGS)[:8]


def test_observe_16_triggers_compression_and_sample_order():
    ch = BfChallenger(field="ext")
    obs = list(range(10, 170, 10))  # 16 words: one full block
    for w in obs:
        ch.observe(w)
    out = _step_model(list(IV), obs)
    assert ch.cv == out
    # ext sample pops h7, h6, h5, h4 (mod p) as coefficients 0..3
    s = ch.sample()
    assert isinstance(s, EF4)
    assert s.c == tuple(out[7 - i] % P for i in range(4))
    # second ext sample continues popping h3, h2, h1, h0
    s2 = ch.sample()
    assert s2.c == tuple(out[3 - i] % P for i in range(4))
    # third sample: outputs exhausted -> squeeze an empty block
    out2 = _step_model(out, [])
    s3 = ch.sample()
    assert s3.c == tuple(out2[7 - i] % P for i in range(4))


def test_partial_block_is_length_bound():
    a = BfChallenger(field="base")
    a.observe(7)
    sa = a.sample()
    # a zero word appended to the same prefix must change the challenge:
    # the partial block is bound by block_len, not just its padded bytes
    b = BfChallenger(field="base")
    b.observe(7)
    b.observe(0)
    sb = b.sample()
    assert sa != sb
    out = _step_model(list(IV), [7])
    assert sa == F(out[7] % P)


def test_observe_invalidates_outputs_and_partial_inputs():
    ch = BfChallenger(field="base")
    for w in range(5):
        ch.observe(w)
    _ = ch.sample()
    cv_after = list(ch.cv)
    # a new observe invalidates remaining outputs; next sample re-compresses
    ch.observe(99)
    s = ch.sample()
    out = _step_model(cv_after, [99])
    assert s == F(out[7] % P)


def test_base_vs_ext_sampling():
    ch = BfChallenger(field="base")
    ch.observe_u32s(range(8))
    out = _step_model(list(IV), list(range(8)))
    assert ch.sample() == F(out[7] % P)
    assert ch.sample() == F(out[6] % P)


def test_sample_bits_raw_word():
    ch = BfChallenger(field="ext")
    ch.observe_u32s(range(8))
    out = _step_model(list(IV), list(range(8)))
    got = ch.sample_bits(5)
    assert got == out[7] >> 27
    # sample_bits consumed ONE word; the next ext sample starts at h6
    s = ch.sample()
    assert s.c == tuple(out[6 - i] % P for i in range(4))


def test_grind_and_check_witness():
    bits = 6
    ch = BfChallenger(field="ext")
    ch.observe_u32s([3, 1, 4, 1, 5, 9, 2, 6])
    ch.sample()  # drain the input buffer through a squeeze
    ref_cv = list(ch.cv)
    ref_buf = list(ch.output_buffer)
    w = ch.grind(bits)
    # independent scalar verification: smallest witness
    for cand in range(w):
        probe = BfChallenger(field="ext")
        probe.cv = list(ref_cv)
        probe.output_buffer = list(ref_buf)
        assert not probe.check_witness(bits, cand), cand
    probe = BfChallenger(field="ext")
    probe.cv = list(ref_cv)
    probe.output_buffer = list(ref_buf)
    assert probe.check_witness(bits, w)
    # transcript advanced identically
    assert probe.cv == ch.cv
    assert ch.grind_bits == bits


def test_commitment_observe_digest():
    """observe_commitment (v3) absorbs the 8 LE words of blake3 over the
    rep roots' LE-word serialization — one half-block regardless of the
    repetition count — instead of 8 words per repetition."""
    from tapstark.hashes.blake3 import blake3

    roots = [[i * 8 + j for j in range(8)] for i in range(4)]
    ch = BfChallenger(field="ext")
    ch.observe_commitment(roots)
    data = b"".join(w.to_bytes(4, "little") for root in roots for w in root)
    digest_words = [
        int.from_bytes(blake3(data)[4 * i : 4 * i + 4], "little") for i in range(8)
    ]
    assert ch.input_buffer == digest_words  # half a block pending, no compress yet
    ch.observe_commitment(roots)  # second commitment fills the block
    assert ch.cv == _step_model(list(IV), digest_words + digest_words)
