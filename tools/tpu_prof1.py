"""Isolated TPU timings for the device-commit pieces (suffix build, tree
rep-group) at north-star shard shapes. Run on the axon TPU."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from tapstark.commit import device_commit as dc
from tapstark.commit.tcs import TCS, LEVEL_CUTOFF
from tapstark.commit.bitcomm import BcManager
from tapstark.field.constants import P

rng = np.random.default_rng(1)
def sync(x):
    # 4-byte fetch: blocks on the producing program WITHOUT downloading it
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])

for (k, l, ext, label) in [(2, 1, False, "trace"), (8, 1, False, "quotient"), (2, 4, True, "fri-layer")]:
    n = 1 << 22 if not ext else 1 << 21
    tcs = TCS(BcManager())
    use_bcs, head, fixed_len = tcs._assign_locks(k, ext)
    plan = dc.ShardSuffixPlan(len(head), fixed_len)
    vals = jnp.asarray(rng.integers(0, P, (n, k, l), dtype=np.uint64).astype(np.uint32))
    sync(vals)
    for it in range(2):
        t0 = time.perf_counter()
        suffix = dc.build_tail_suffix_words(vals, plan)
        sync(suffix)
        dt = time.perf_counter() - t0
        if it:
            print(f"{label}: suffix (2^{n.bit_length()-1}, {k}x{l}, {plan.n_suffix_blocks} blk) warm {dt*1000:.0f} ms", flush=True)
    heads = [head] * 4
    mids, rems = plan.head_midstates_batch(heads)
    for it in range(2):
        t0 = time.perf_counter()
        roots, uppers = dc.shard_trees_rep_group(suffix, mids, rems, LEVEL_CUTOFF)
        dt = time.perf_counter() - t0
        comp = 4 * n * (plan.n_suffix_blocks + 2)
        if it:
            print(f"{label}: tree group (4 reps) warm {dt:.2f} s -> {comp/dt/1e6:.0f}M c/s", flush=True)
