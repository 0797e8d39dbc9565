"""Proof serialization roundtrip: serialized proof re-verifies (the
reference's postcard-roundtrip story)."""

from tapstark.airs import FibonacciAir, generate_fibonacci_trace
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.stark import prove, verify
from tapstark.stark.serde import proof_from_bytes, proof_to_bytes
from tapstark.utils import profiling


def test_proof_serde_roundtrip_and_verify():
    num_queries = 2
    fri = FriConfig(
        log_blowup=2,
        num_queries=num_queries,
        proof_of_work_bits=4,
        mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), num_queries, ext=False), fri)
    trace = generate_fibonacci_trace(0, 1, 1 << 3)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]

    profiling.enable()
    profiling.reset()
    proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)
    rep = profiling.report()
    profiling.enable(False)
    assert "prove/commit-trace" in rep and rep["prove/open"]["calls"] == 1

    blob = proof_to_bytes(proof)
    proof2 = proof_from_bytes(blob)
    assert proof_to_bytes(proof2) == blob  # canonical

    verify(pcs, FibonacciAir(), BfChallenger(), proof2, pis)
