"""Blake3 sponge-chain AIR: the chained compressions must match the
Fiat-Shamir challenger's v2 duplex exactly, constraints hold, and
breaking the chaining-value carry between blocks is detected."""

import numpy as np
import pytest

from tapstark.airs.blake3_compression import (
    OFFSETS,
    Blake3SpongeChainAir,
    generate_blake3_sponge_trace,
)
from tapstark.air.symbolic import get_log_quotient_degree
from tapstark.challenger import BfChallenger
from tapstark.field import F
from tapstark.stark import check_constraints


def test_sponge_chain_matches_challenger():
    blocks = [
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3],
        [27, 18, 28, 18] + [0] * 12,
        [7] * 16,
    ]
    trace, pis, digest = generate_blake3_sponge_trace(blocks)

    # cross-check against the real challenger duplex (full 16-word blocks
    # compress eagerly, so cv after the stream == the chain digest)
    ch = BfChallenger()
    for blk in blocks:
        ch.observe_u32s(blk)
    assert digest == ch.cv

    air = Blake3SpongeChainAir()
    assert get_log_quotient_degree(air, len(pis)) == 1
    check_constraints(air, trace, [F(x) for x in pis])


def test_sponge_chain_tamper_detection():
    blocks = [list(range(1, 17)), list(range(17, 33))]
    trace, pis, _ = generate_blake3_sponge_trace(blocks)
    air = Blake3SpongeChainAir()
    pis_f = [F(x) for x in pis]
    check_constraints(air, trace, pis_f)

    # break the chaining-value carry into block 2 (cv word 0, row 64)
    bad = trace.copy()
    bad[64, OFFSETS["v0"] + 2] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad, pis_f)

    # break the fixed tail constants at a block boundary (v14 = block_len)
    bad2 = trace.copy()
    bad2[64, OFFSETS["v14"] + 6] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad2, pis_f)

    # wrong initial chaining value (cv must start at the blake3 IV)
    bad3 = trace.copy()
    bad3[0, OFFSETS["v0"]] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad3, pis_f)

    # message words must be copied down a block, not swapped mid-block
    bad4 = trace.copy()
    bad4[70, OFFSETS["m3"] + 5] ^= 1
    with pytest.raises(AssertionError):
        check_constraints(air, bad4, pis_f)

    # wrong final digest
    bad_pis = list(pis_f)
    bad_pis[0] = bad_pis[0] + F(1)
    with pytest.raises(AssertionError):
        check_constraints(air, trace, bad_pis)


def test_sponge_chain_prove_verify():
    """End-to-end STARK over a 4-block sponge chain (256 rows x 1548 cols):
    the prover commits, opens, and the verifier accepts the chained
    Fiat-Shamir compression trace."""
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
    blocks = [[b * 16 + w for w in range(16)] for b in range(4)]
    trace, pis, digest = generate_blake3_sponge_trace(blocks)
    ch = BfChallenger()
    for blk in blocks:
        ch.observe_u32s(blk)
    assert digest == ch.cv

    pis_f = [F(x) for x in pis]
    air = Blake3SpongeChainAir()
    proof = prove(pcs, air, BfChallenger(), trace, pis_f)
    verify(pcs, air, BfChallenger(), proof, pis_f)
