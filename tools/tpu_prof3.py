"""Compare pair-deinterleave strategies for the tree levels on TPU."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from tapstark.hashes.sha256_device import tapbranch_fused_wm
from tapstark.utils import bitrev_indices

def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])

r, n = 4, 1 << 22
rng = np.random.default_rng(0)
level0 = jnp.asarray(rng.integers(0, 1 << 32, (8, r, n), dtype=np.uint64).astype(np.uint32))
sync(level0)

@jax.jit
def strided(level):
    return level[:, :, 0::2] ^ level[:, :, 1::2]

@jax.jit
def transposed(level):
    h = level.shape[2] // 2
    d = jnp.swapaxes(level.reshape(8, r, h, 2), -1, -2)  # (8, r, 2, h)
    return d[:, :, 0] ^ d[:, :, 1]

@jax.jit
def halves_xor(level):  # what a bitrev layout would do per level
    h = level.shape[2] // 2
    return level[:, :, :h] ^ level[:, :, h:]

@jax.jit
def bitrev_gather(level):
    idx = jnp.asarray(bitrev_indices(22))
    return jnp.take(level, idx, axis=2)

@jax.jit
def levels_bitrev_style(level):
    # full 22-level loop on contiguous halves (bitrev storage)
    for l in range(22):
        h = level.shape[2] // 2
        level = tapbranch_fused_wm(level[:, :, :h], level[:, :, h:])
    return level

for name, fn in [("strided slice lvl0", strided), ("reshape+transpose lvl0", transposed),
                 ("contiguous halves lvl0", halves_xor), ("bitrev gather full", bitrev_gather),
                 ("22 levels on halves (fused)", levels_bitrev_style)]:
    sync(fn(level0))
    t0 = time.perf_counter(); sync(fn(level0)); dt = time.perf_counter() - t0
    print(f"{name}: {dt*1000:.0f} ms", flush=True)
