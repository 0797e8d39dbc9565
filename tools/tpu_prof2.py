"""Decompose _trees_all_reps_jit cost: leaf scan vs levels vs strided slicing."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from jax import lax
from tapstark.hashes.sha256_device import compress_batch_wm, tapbranch_fused_wm, tapbranch_hash_batch_wm

def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])

r, n = 4, 1 << 22
rng = np.random.default_rng(0)
level0 = jnp.asarray(rng.integers(0, 1 << 32, (8, r, n), dtype=np.uint64).astype(np.uint32))
suf = jnp.asarray(rng.integers(0, 1 << 32, (16, n), dtype=np.uint64).astype(np.uint32))
rem = jnp.asarray(rng.integers(0, 1 << 32, (16, r), dtype=np.uint64).astype(np.uint32))
mids = jnp.asarray(rng.integers(0, 1 << 32, (r, 8), dtype=np.uint64).astype(np.uint32))
sync((level0, suf, rem, mids))

@jax.jit
def leaf_scan(suf, rem, mids):
    state0 = jnp.broadcast_to(mids.T[:, :, None], (8, r, n))
    blk = suf[:, None, :] | rem[:, :, None]
    return compress_batch_wm(state0, blk)

@jax.jit
def levels_fused(level):
    outs = []
    for l in range(22):
        level = tapbranch_fused_wm(level[:, :, 0::2], level[:, :, 1::2])
    return level

@jax.jit
def levels_unfused(level):
    for l in range(22):
        level = tapbranch_hash_batch_wm(level[:, :, 0::2], level[:, :, 1::2])
    return level

@jax.jit
def slice_only(level):
    acc = jnp.zeros((8, r, 1), jnp.uint32)
    for l in range(22):
        a = level[:, :, 0::2]
        b = level[:, :, 1::2]
        level = a ^ b
    return level

@jax.jit
def first_level_only(level):
    return tapbranch_fused_wm(level[:, :, 0::2], level[:, :, 1::2])

for name, fn, args in [
    ("leaf_scan 1blk", leaf_scan, (suf, rem, mids)),
    ("levels fused x22", levels_fused, (level0,)),
    ("levels unfused x22", levels_unfused, (level0,)),
    ("slices+xor x22", slice_only, (level0,)),
    ("first level fused", first_level_only, (level0,)),
]:
    sync(fn(*args))
    t0 = time.perf_counter(); sync(fn(*args)); dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000:.0f} ms", flush=True)
