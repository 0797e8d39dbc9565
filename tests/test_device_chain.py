"""Device transcript chain (challenger/device_tail.py): the FRI commit-phase
observe_commitment -> sample(beta) step run on device must be word-identical
to the host BfChallenger for both compression backends, and a prove driven
through the chain must produce byte-identical proofs."""

import numpy as np

from tapstark.challenger import BfChallenger, TestPermutation
from tapstark.challenger import device_tail as dt
from tapstark.field.device import np_from_mont


def _random_roots(rng, reps):
    """(R, 8) uint32 big-endian SHA root words + the host-side commitment
    representation (per-rep LE root_words lists, as CommitedData.root_words)."""
    dev_words = rng.integers(0, 2**32, (reps, 8), dtype=np.uint64).astype(np.uint32)
    commitment = [
        [
            int.from_bytes(int(w).to_bytes(4, "big"), "little")
            for w in dev_words[r]
        ]
        for r in range(reps)
    ]
    return dev_words, commitment


def _run_chain(kind: str, pending_words: list[int], layers: int, reps: int):
    import jax.numpy as jnp

    perm = TestPermutation() if kind == "test" else None
    host = BfChallenger(permutation=perm)
    for w in pending_words:
        host.observe(w)
    chain = dt.DeviceTailChain(host)
    rng = np.random.default_rng(7 + reps + len(pending_words))
    for _ in range(layers):
        dev_words, commitment = _random_roots(rng, reps)
        beta_mont, beta_words = chain.step(jnp.asarray(dev_words))
        host.observe_commitment(commitment)
        beta = host.sample()
        assert [int(x) for x in np.asarray(beta_words)] == [
            int(w) for w in host.sample_input[-1]
        ]
        got = np_from_mont(np.asarray(beta_mont)[None, :])[0]
        assert [int(x) for x in got] == list(beta.c)


def test_chain_matches_host_blake3():
    # pending lengths cover: empty, partial (<8), the exact-compress case
    # (8), and a mid-absorb compress (>8)
    for pend in ([], [3], list(range(8)), list(range(11))):
        _run_chain("blake3", pend, layers=3, reps=5)


def test_chain_matches_host_test_permutation():
    for pend in ([], [123456789], list(range(8)), list(range(13))):
        _run_chain("test", pend, layers=3, reps=3)


def test_chain_supported_bounds():
    host = BfChallenger()
    assert dt.chain_supported(host, 28)
    assert dt.chain_supported(host, 32)
    assert not dt.chain_supported(host, 33)  # multi-chunk digest

    class Odd:
        def compress(self, cv, block, block_len):  # pragma: no cover
            return cv

    host2 = BfChallenger(permutation=Odd())
    assert not dt.chain_supported(host2, 4)


def test_prove_with_device_chain_engages_and_matches():
    """Forced device commit on CPU: the FRI commit phase must route through
    the device transcript chain (TOTAL_STEPS grows), every flush-time replay
    assert passes, and the proof bytes equal the chain-disabled run."""
    import os

    from tapstark.airs import FibonacciAir, generate_fibonacci_trace
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.field import F
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove, verify
    from tapstark.stark.serde import proof_to_bytes

    def run():
        nq = 3
        fri = FriConfig(
            log_blowup=2,
            num_queries=nq,
            proof_of_work_bits=4,
            mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
        )
        pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)
        trace = generate_fibonacci_trace(0, 1, 256)
        pis = [F(0), F(1), F(int(trace[-1, 1]))]
        proof = prove(pcs, FibonacciAir(), BfChallenger(), trace, pis)
        verify(pcs, FibonacciAir(), BfChallenger(), proof, pis)
        return proof_to_bytes(proof)

    old_commit = os.environ.get("TAPSTARK_DEVICE_COMMIT")
    old_chain = os.environ.get("TAPSTARK_DEVICE_CHALLENGER")
    try:
        os.environ["TAPSTARK_DEVICE_COMMIT"] = "1"
        os.environ.pop("TAPSTARK_DEVICE_CHALLENGER", None)
        before = dt.TOTAL_STEPS
        with_chain = run()
        assert dt.TOTAL_STEPS > before, "device chain did not engage"
        os.environ["TAPSTARK_DEVICE_CHALLENGER"] = "0"
        without_chain = run()
    finally:
        for k, v in (
            ("TAPSTARK_DEVICE_COMMIT", old_commit),
            ("TAPSTARK_DEVICE_CHALLENGER", old_chain),
        ):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert with_chain == without_chain
