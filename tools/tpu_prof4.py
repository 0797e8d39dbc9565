"""Isolate open-phase device costs at north-star shapes."""
import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax.numpy as jnp
from tapstark.field.constants import P
from tapstark.field.device import np_to_mont, ef_const
from tapstark.field.scalar import EF4, F
from tapstark.fri.pcs import _open_height_kernel, _inv_denoms_jit
from tapstark.poly.powers import geom_powers_mont_dev, bitrev_1d_dev
from tapstark.poly.ntt import bit_reverse_rows

def sync(x):
    a = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(a[(0,) * a.ndim])

rng = np.random.default_rng(0)
h, w, n_low, n_pts = 1 << 22, 10, 1 << 20, 2
mat = jnp.asarray(rng.integers(0, P, (h, w), dtype=np.uint64).astype(np.uint32))
weights = jnp.asarray(np_to_mont(rng.integers(0, P, (n_pts, w, 4), dtype=np.uint64).astype(np.uint32)))
zs = jnp.asarray(np_to_mont(rng.integers(0, P, (n_pts, 4), dtype=np.uint64).astype(np.uint32)))
scales = zs
sync((mat, weights))

t0 = time.perf_counter()
xs = geom_powers_mont_dev(F.two_adic_generator(20).v, 20, F.generator().v)
sync(xs); print(f"geom_powers 2^20: first {time.perf_counter()-t0:.2f} s", flush=True)

t0 = time.perf_counter()
xs_nat = geom_powers_mont_dev(F.two_adic_generator(22).v, 22, F.generator().v)
xs_brv = bitrev_1d_dev(xs_nat, 22)
sync(xs_brv); print(f"geom+bitrev 2^22: {time.perf_counter()-t0:.2f} s", flush=True)

z = EF4(list(rng.integers(0, P, 4)))
for it in range(2):
    t0 = time.perf_counter()
    invd1 = _inv_denoms_jit(xs_brv, ef_const(z))
    sync(invd1)
    if it: print(f"inv_denoms 2^22 warm: {time.perf_counter()-t0:.2f} s", flush=True)

t0 = time.perf_counter()
nat = bit_reverse_rows(mat[:n_low])
sync(nat); print(f"bit_reverse_rows (2^20,10): {time.perf_counter()-t0:.2f} s", flush=True)

invd = jnp.stack([invd1[:h], invd1[:h]])
for it in range(2):
    t0 = time.perf_counter()
    ys, ro = _open_height_kernel(nat, mat, weights, zs, scales, xs, invd)
    sync(ro)
    if it: print(f"open_height_kernel warm: {time.perf_counter()-t0:.2f} s", flush=True)
