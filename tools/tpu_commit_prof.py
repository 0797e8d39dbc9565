"""On-TPU micro-timings for the device-commit pieces at prover shard shapes.

Each timing syncs with a 4-BYTE fetch (np.asarray of one element) — a full
np.asarray would download the whole tensor over the ~16 MB/s relay and
measure the transfer, not the kernel (that artifact once misattributed ~10 s
to a 40 ms suffix build). Usage: python tools/tpu_commit_prof.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
import jax.numpy as jnp

from tapstark.commit import device_commit as dc
from tapstark.commit.bitcomm import BcManager
from tapstark.commit.tcs import LEVEL_CUTOFF, TCS
from tapstark.field.constants import P


def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])


def main():
    rng = np.random.default_rng(1)
    cases = [
        (2, 1, False, 22, 4, "trace (north star)"),
        (8, 1, False, 22, 4, "quotient (north star)"),
        (2, 4, True, 21, 4, "fri-layer (north star)"),
        (40, 1, False, 17, 16, "wide shard (blake3/recursion AIRs)"),
    ]
    for k, l, ext, log_n, reps, label in cases:
        n = 1 << log_n
        tcs = TCS(BcManager())
        _, head, fixed_len = tcs._assign_locks(k, ext)
        plan = dc.ShardSuffixPlan(len(head), fixed_len)
        vals = jnp.asarray(rng.integers(0, P, (n, k, l), dtype=np.uint64).astype(np.uint32))
        vals_brv = dc.bitrev_rows_dev(vals, log_n)
        sync(vals_brv)
        for it in range(2):
            t0 = time.perf_counter()
            suffix = dc.build_tail_suffix_words(vals_brv, plan, bitrev_leaf_order=True)
            sync(suffix)
            dt = time.perf_counter() - t0
        print(
            f"{label}: suffix (2^{log_n}, {k}x{l}, {plan.n_suffix_blocks} blk) warm {dt*1000:.0f} ms",
            flush=True,
        )
        mids, rems = plan.head_midstates_batch([head] * reps)
        for it in range(2):
            t0 = time.perf_counter()
            roots, uppers = dc.shard_trees_rep_group(suffix, mids, rems, LEVEL_CUTOFF)
            dt = time.perf_counter() - t0
        comp = reps * n * (plan.n_suffix_blocks + 2)
        print(
            f"{label}: tree group ({reps} reps) warm {dt:.2f} s -> {comp/dt/1e6:.0f}M compressions/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
