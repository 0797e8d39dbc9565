"""Full Blake3 compression AIR: the trace's claimed digest must equal the
real blake3 of the message, all constraints hold row-by-row, and tampering
anywhere (schedule, state flow, output) breaks a constraint.

The end-to-end prove (1548 columns, ~4600 constraints) takes ~100 s,
dominated by the device-graph compile."""

import numpy as np
import pytest

from tapstark.airs.blake3_compression import (
    NUM_COLS,
    NUM_PUBLIC,
    OFFSETS,
    Blake3CompressionAir,
    generate_blake3_compression_trace,
)
from tapstark.air.symbolic import get_log_quotient_degree, get_max_constraint_degree
from tapstark.field import F
from tapstark.hashes import blake3
from tapstark.stark import check_constraints


def test_blake3_compression_digest_and_constraints():
    rng = np.random.default_rng(0)
    message = bytes(rng.integers(0, 256, 64, dtype=np.uint8))
    trace, pis, digest = generate_blake3_compression_trace(message)
    # the AIR's digest IS blake3 (single 64-byte block)
    assert digest == blake3(message)
    assert trace.shape == (64, NUM_COLS)
    assert len(pis) == NUM_PUBLIC

    air = Blake3CompressionAir()
    assert get_max_constraint_degree(air, NUM_PUBLIC) == 3
    assert get_log_quotient_degree(air, NUM_PUBLIC) == 1
    check_constraints(air, trace, [F(x) for x in pis])


def test_blake3_compression_tamper_detection():
    message = bytes(range(64))
    trace, pis, _ = generate_blake3_compression_trace(message)
    air = Blake3CompressionAir()
    pis_f = [F(x) for x in pis]

    # tampered G output bit
    bad = trace.copy()
    bad[10, OFFSETS["b2"] + 3] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad, pis_f)

    # tampered state-copy (un-written word modified between rows)
    bad2 = trace.copy()
    bad2[30, OFFSETS["v7"] + 1] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad2, pis_f)

    # wrong claimed digest
    bad_pis = list(pis_f)
    bad_pis[33] = bad_pis[33] + F(1)
    with pytest.raises(AssertionError):
        check_constraints(air, trace, bad_pis)

    # selector smuggling: activate two positions at once
    bad3 = trace.copy()
    bad3[5, OFFSETS["sel"] + 9] = 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad3, pis_f)


def test_blake3_compression_prove_verify():
    from tapstark.challenger import BfChallenger
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove, verify

    nq = 1
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=2,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
    message = bytes(range(64))
    trace, pis, _ = generate_blake3_compression_trace(message)
    pis_f = [F(x) for x in pis]
    air = Blake3CompressionAir()
    proof = prove(pcs, air, BfChallenger(), trace, pis_f)
    verify(pcs, air, BfChallenger(), proof, pis_f)
