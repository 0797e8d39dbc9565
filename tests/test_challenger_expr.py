"""Challenger-consistency script: replay a real Fiat-Shamir transcript
in-script and execute it under the interpreter."""

import numpy as np

from tapstark.challenger import BfChallenger
from tapstark.dsl.challenger_expr import build_challenger_script
from tapstark.script.interpreter import execute_script


def test_challenger_script_small_transcript():
    ch = BfChallenger(field="ext")
    ch.observe_u32s(range(8))  # one commitment-root worth of words
    _alpha = ch.sample()
    ch.observe_u32s(range(8, 16))
    _zeta = ch.sample()
    _idx = ch.sample_bits(5)

    script = build_challenger_script(ch.op_log)
    r = execute_script(script)
    assert r.success, r.error


def test_challenger_script_with_grind():
    ch = BfChallenger(field="ext")
    ch.observe_u32s([7] * 8)
    _beta = ch.sample()
    w = ch.grind(4)
    script = build_challenger_script(ch.op_log)
    r = execute_script(script)
    assert r.success, r.error


def test_challenger_script_detects_tampered_sample():
    ch = BfChallenger(field="ext")
    ch.observe_u32s(range(8))
    _ = ch.sample()
    log = list(ch.op_log)
    # tamper with the claimed sample value
    kind, words, value = log[-1][1], log[-1][2], log[-1][3]
    from tapstark.field import EF4

    log[-1] = ("sample", kind, words, value + EF4.one())
    script = build_challenger_script(log)
    assert not execute_script(script).success
