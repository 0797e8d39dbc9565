"""Device taptree hashing: byte-exactness against the host implementations
(script.builder push encodings, hashes.sha256 tagged hashing, taptree)."""

import hashlib

import jax.numpy as jnp
import numpy as np

from tapstark.commit import device_commit as dc
from tapstark.commit.tcs import _leaf_script_from_row, _max_tail_len
from tapstark.field.constants import P
from tapstark.hashes import sha256_device as sd
from tapstark.hashes.sha256 import tagged_hash, tapbranch_hash, tapleaf_hash


def test_sha256_blocks_matches_hashlib():
    rng = np.random.default_rng(0)
    for l_words in (8, 16, 24):
        msgs = rng.integers(0, 2**32, (20, l_words), dtype=np.uint64).astype(
            np.uint32
        )
        pad_total = l_words * 4 + 9
        nb = -(-pad_total // 64)
        pad = np.zeros(nb * 16 - l_words, np.uint32)
        pad[0] = 0x80000000
        pad[-1] = (l_words * 32) & 0xFFFFFFFF
        blocks = np.concatenate(
            [msgs, np.broadcast_to(pad, (20, len(pad)))], axis=1
        ).reshape(20, nb, 16)
        got = np.asarray(sd.sha256_blocks(jnp.asarray(blocks)))
        exp = np.stack(
            [
                np.frombuffer(
                    hashlib.sha256(m.astype(">u4").tobytes()).digest(), dtype=">u4"
                ).astype(np.uint32)
                for m in msgs
            ]
        )
        assert (got == exp).all()


def test_tagged_and_tapbranch_batch():
    rng = np.random.default_rng(1)
    m = rng.integers(0, 2**32, (10, 16), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(sd.tagged_hash_fixed_batch(b"TapLeaf", jnp.asarray(m), 64))
    for i in range(10):
        exp = np.frombuffer(
            tagged_hash(b"TapLeaf", m[i].astype(">u4").tobytes()), dtype=">u4"
        ).astype(np.uint32)
        assert (got[i] == exp).all()

    h1 = rng.integers(0, 2**32, (16, 8), dtype=np.uint64).astype(np.uint32)
    h2 = rng.integers(0, 2**32, (16, 8), dtype=np.uint64).astype(np.uint32)
    h2[::3] = h1[::3]  # equal pairs exercise the lexicographic tie
    got = np.asarray(sd.tapbranch_hash_batch(jnp.asarray(h1), jnp.asarray(h2)))
    for i in range(16):
        exp = np.frombuffer(
            tapbranch_hash(
                h1[i].astype(">u4").tobytes(), h2[i].astype(">u4").tobytes()
            ),
            dtype=">u4",
        ).astype(np.uint32)
        assert (got[i] == exp).all()


def test_device_leaf_construction_and_trees_byte_exact():
    """Suffix-block construction + rep-group trees equal the host path
    (_leaf_script_from_row + tapleaf_hash + taptree) on edge-case values."""
    rng = np.random.default_rng(2)
    n, k, l = 64, 3, 4
    heads = [bytes(rng.integers(0, 256, 731, dtype=np.uint8)) for _ in range(3)]
    vals = rng.integers(0, P, (n, k, l), dtype=np.uint64).astype(np.uint32)
    edge = [0, 1, 16, 17, 0x7F, 0x80, 0x7FFF, 0x8000, 0x7FFFFF, 0x800000, P - 1]
    for i, v in enumerate(edge):
        vals[i, 0, 0] = v
    fixed_len = len(heads[0]) + _max_tail_len(k, l)

    plan = dc.ShardSuffixPlan(len(heads[0]), fixed_len)
    # tree lanes are bit-reversed (contiguous-halves levels): permute the
    # values and build the suffix in bitrev leaf order, as _commit_device does
    from tapstark.utils import bitrev_indices

    vals_brv = vals[bitrev_indices(6)]
    suffix = dc.build_tail_suffix_words(vals_brv, plan, bitrev_leaf_order=True)
    mids, rems = plan.head_midstates_batch(heads)
    roots, uppers = dc.shard_trees_rep_group(suffix, mids, rems, cutoff=3)

    from tapstark.commit.taptree import build_taptree

    for r, head in enumerate(heads):
        scripts = [
            _leaf_script_from_row(head, fixed_len, i, vals[i]) for i in range(n)
        ]
        t = build_taptree(scripts)
        assert roots[r] == t.root_hash
        # spot-check a tapleaf digest against the host tagged hash
        exp = tapleaf_hash(scripts[5])
        # recompute leaf 5's digest through the device path pieces
        # (the root equality transitively checks them all)
        assert exp is not None
        # device-resident uppers: the per-query path gather must equal the
        # host tree's merkle branch above the cutoff (both prefetched via
        # plan/materialize and fetched on demand)
        view = uppers.view(r)
        for i in (0, 5, 37, n - 1):
            host_branch = t.get_tapleaf(i).merkle_branch[3:]
            if i == 5:
                plan = view.plan(i)
                assert plan is not None
                view.materialize(i, np.asarray(plan))
            assert view.path_bytes(i) == host_branch, (r, i)


def test_suffix_lax_map_chunks_match_single_dispatch():
    """The one-program lax.map chunked suffix build (used above 2^16
    leaves) is byte-identical to the single-chunk path, including the
    pad-to-multiple slice."""
    from tapstark.commit.tcs import _max_tail_len

    rng = np.random.default_rng(5)
    n, k, l = 100, 2, 4  # non-multiple of the small chunk exercises padding
    vals = rng.integers(0, P, (n, k, l), dtype=np.uint64).astype(np.uint32)
    head = bytes(rng.integers(0, 256, 300, dtype=np.uint8))
    plan = dc.ShardSuffixPlan(len(head), len(head) + _max_tail_len(k, l))
    idx = jnp.uint32(7) + jnp.arange(n, dtype=jnp.uint32)
    args = (jnp.asarray(plan.pad_words), idx, plan.tail_span,
            plan.rem_len, plan.suf_words)
    a = np.asarray(dc._suffix_all_jit(jnp.asarray(vals), *args[:2], *args[2:], 1 << 16))
    b = np.asarray(dc._suffix_all_jit(jnp.asarray(vals), *args[:2], *args[2:], 16))
    assert np.array_equal(a, b)


def test_pallas_sha_kernel_matches_reference_compression():
    """The TPU Pallas SHA-256 kernel (fully unrolled rounds in registers)
    against the numpy reference compression. Skipped off-TPU: interpret
    mode of the 64-round unrolled kernel sends XLA:CPU into multi-minute
    compiles (the CPU path uses the lax.scan form, covered by the roots
    byte-equality tests above)."""
    import jax
    import jax.numpy as jnp
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("pallas SHA path is TPU-only (scan path covered on CPU)")
    from tapstark.hashes.sha256_device import IV, _compress_batch_pallas, _compress_np

    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 1 << 32, (2048, 16), dtype=np.uint64).astype(np.uint32)
    state = jnp.broadcast_to(jnp.asarray(IV), (2048, 8))
    out = np.asarray(_compress_batch_pallas(state, jnp.asarray(blocks)))
    for i in (0, 1, 1023, 2047):
        assert np.array_equal(out[i], _compress_np(IV.copy(), blocks[i]))

def test_prove_forced_device_commit_matches_host_proof_bytes():
    """End-to-end fib prove with TAPSTARK_DEVICE_COMMIT=1: device taptree
    hashing with HBM-resident leaf values (DeviceValues per-query block
    gathers, no whole-matrix canonical download) must produce byte-identical
    proofs to the host engine and verify."""
    import os

    from tapstark.airs import FibonacciAir, generate_fibonacci_trace
    from tapstark.challenger import BfChallenger
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

    old = os.environ.get("TAPSTARK_DEVICE_COMMIT")
    try:
        os.environ["TAPSTARK_DEVICE_COMMIT"] = "1"
        dev_bytes = run()
        os.environ["TAPSTARK_DEVICE_COMMIT"] = "0"
        host_bytes = run()
    finally:
        if old is None:
            os.environ.pop("TAPSTARK_DEVICE_COMMIT", None)
        else:
            os.environ["TAPSTARK_DEVICE_COMMIT"] = old
    assert dev_bytes == host_bytes

def test_wordmajor_suffix_builder_matches_onehot_form():
    """The word-major elementwise suffix builder (hot shapes) is byte-exact
    with the chunked one-hot form across push-encoding edge values, odd
    lengths (lane padding), and a nonzero base index."""
    rng = np.random.default_rng(11)
    for (n, k, l) in [(64, 3, 4), (300, 2, 1), (256, 8, 1), (512, 2, 4)]:
        vals = rng.integers(0, P, (n, k, l), dtype=np.uint64).astype(np.uint32)
        edge = [0, 1, 16, 17, 0x7F, 0x80, 0x7FFF, 0x8000, 0x7FFFFF, 0x800000, P - 1]
        for i, v in enumerate(edge):
            vals[i % n, 0, 0] = v
        head = bytes(rng.integers(0, 256, 731, dtype=np.uint8))
        plan = dc.ShardSuffixPlan(len(head), len(head) + _max_tail_len(k, l))
        wm = np.asarray(dc.build_tail_suffix_words(vals, plan, base_index=7))
        ref = np.asarray(
            dc._suffix_all_jit(
                jnp.asarray(vals),
                jnp.asarray(plan.pad_words),
                jnp.uint32(7) + jnp.arange(n, dtype=jnp.uint32),
                plan.tail_span,
                plan.rem_len,
                plan.suf_words,
                1 << 16,
            )
        ).T
        assert wm.shape == (plan.suf_words, n)
        assert np.array_equal(wm, ref), (n, k, l)
