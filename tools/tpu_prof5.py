"""bit_reverse_rows old-vs-new on TPU at prover shapes."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from tapstark.poly.ntt import bit_reverse_rows
from tapstark.utils import bitrev_indices

def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])

rng = np.random.default_rng(0)
for shape in [(1 << 22, 2), (1 << 20, 10), (1 << 22, 8)]:
    mat = jnp.asarray(rng.integers(0, 1 << 31, shape, dtype=np.uint64).astype(np.uint32))
    sync(mat)
    f = jax.jit(bit_reverse_rows)
    sync(f(mat))
    t0 = time.perf_counter(); sync(f(mat)); dt = time.perf_counter() - t0
    def old(m):
        rev = jnp.asarray(bitrev_indices(shape[0].bit_length() - 1).astype(np.int32))
        return jnp.take(m, rev, axis=0)
    g = jax.jit(old)
    sync(g(mat))
    t0b = time.perf_counter(); sync(g(mat)); dtb = time.perf_counter() - t0b
    print(f"{shape}: new {dt*1000:.0f} ms, old(jit, table resident) {dtb*1000:.0f} ms", flush=True)
