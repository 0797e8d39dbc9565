import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from tapstark.field.constants import P
from tapstark.field.device import np_to_mont
from tapstark.field.scalar import F
from tapstark.poly.pallas_ntt import coset_lde_batch_pallas_blocks
from tapstark.poly.matmul_ntt import coset_lde_batch_matmul

log_n, blow, w = 20, 2, 2
n = 1 << log_n
rng = np.random.default_rng(0)
x = jnp.asarray(np_to_mont(rng.integers(0, P, (n, w)).astype(np.uint32)))
shift = F.generator().v
res = {}
for name, fn in [("pallas-blocks", coset_lde_batch_pallas_blocks), ("mxu-fused", coset_lde_batch_matmul)]:
    f = jax.jit(lambda t, fn=fn: fn(t, blow, shift))
    out = f(x); res[name] = np.asarray(out[:64, :])
    reps = 24
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(reps)]
    np.asarray(outs[-1][0, 0])
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.2f} ms/rep sustained")
assert np.array_equal(res["pallas-blocks"], res["mxu-fused"])
print("outputs agree")
