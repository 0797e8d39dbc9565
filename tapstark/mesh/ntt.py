"""Multi-chip NTT: four-step algorithm with an all_to_all transpose over ICI.

The reference is single-process (rayon); this is new TPU-first surface
(SURVEY.md §2.3): butterfly stages whose partners cross shard boundaries are
reformulated as  local NTT → twiddle → all_to_all transpose → local NTT,
so the only cross-chip traffic is one tiled all_to_all per transform.

Math (decimation i = i1*C + i2, k = k1 + R*k2, w = w_N):
    X[k1 + R*k2] = sum_{i2} w^(i2*k1) * w_C^(i2*k2) * sum_{i1} x[i1*C+i2] w_R^(i1*k1)
Step 1 (local): column NTTs of size R (devices hold whole columns).
Step 2 (local): twiddle by w^(i2*k1).
Step 3 (all_to_all): transpose (R, C) -> (C, R).
Step 4 (local): column NTTs of size C; output Y[k2, k1] = X[k1 + R*k2].

Batched over a trailing width axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P_

from ..field.constants import P
from ..field.device import fp_mul, np_to_mont
from ..poly.ntt import intt, ntt
from ..poly.powers import np_geom_powers
from ..utils import log2_strict

AXIS = "shard"


@functools.lru_cache(maxsize=None)
def _outer_twiddles(log_r: int, log_c: int, inverse: bool) -> np.ndarray:
    """(R, C) matrix of w_N^(k1*i2) in Montgomery form."""
    n = 1 << (log_r + log_c)
    from ..field.constants import two_adic_generator

    w = two_adic_generator(log_r + log_c)
    if inverse:
        w = pow(w, P - 2, P)
    rows = []
    for k1 in range(1 << log_r):
        rows.append(np_geom_powers(pow(w, k1, P), 1 << log_c))
    return np_to_mont(np.stack(rows))


def _dist_ntt_shardmap(mesh: Mesh, log_r: int, log_c: int, inverse: bool):
    """Build the shard_map'd four-step transform for a (R, C, w)-shaped batch
    sharded along axis 1 (columns i2)."""
    num = mesh.devices.size
    tw = _outer_twiddles(log_r, log_c, inverse)

    def local_fn(x, tw_local):
        # x: (R, C/num, w) local block — full columns
        r, c_local, w = x.shape
        a = ntt(x.reshape(r, c_local * w), log_n=log_r) if not inverse else intt(
            x.reshape(r, c_local * w), log_n=log_r
        )
        a = a.reshape(r, c_local, w)
        a = fp_mul(a, tw_local[:, :, None])
        # transpose via tiled all_to_all: (R, C/num, w) -> (C, R/num, w)
        a = jax.lax.all_to_all(a, AXIS, split_axis=0, concat_axis=1, tiled=True)
        # now (R/num, C, w): transpose local block to (C, R/num, w)
        a = jnp.swapaxes(a, 0, 1)
        b = ntt(a.reshape(1 << log_c, -1), log_n=log_c) if not inverse else intt(
            a.reshape(1 << log_c, -1), log_n=log_c
        )
        return b.reshape(1 << log_c, a.shape[1], w)

    return jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P_(None, AXIS, None), P_(None, AXIS)),
            out_specs=P_(None, AXIS, None),
        )
    ), tw


def distributed_ntt(mesh: Mesh, x, inverse: bool = False):
    """NTT of (n, w) Montgomery matrix sharded over the mesh.

    Returns the result in natural order (n, w) sharded along rows. Internally
    uses the digit-transposed layout; the final re-layout is a reshape of the
    (C, R) output Y[k2, k1] = X[k1 + R*k2].
    """
    n, w = x.shape
    log_n = log2_strict(n)
    num = mesh.devices.size
    log_num = log2_strict(num)
    log_c = max(log_num, log_n // 2)
    log_r = log_n - log_c
    assert log_r >= log_num, (
        f"n=2^{log_n} too small to shard over {num} devices (need log_n >= "
        f"2*log(devices))"
    )
    r, c = 1 << log_r, 1 << log_c

    fn, tw = _dist_ntt_shardmap(mesh, log_r, log_c, inverse)

    # layout: M[i1, i2] = x[i1*C + i2]
    m = x.reshape(r, c, w)
    m = jax.device_put(m, NamedSharding(mesh, P_(None, AXIS, None)))
    tw_dev = jax.device_put(jnp.asarray(tw), NamedSharding(mesh, P_(None, AXIS)))
    y = fn(m, tw_dev)  # (C, R/num per device, w): Y[k2, k1] = X[k1 + R*k2]
    # natural order: flat index of Y[k2, k1] is k2*R + k1 == k. Direct reshape.
    return y.reshape(n, w)


def distributed_coset_lde(mesh: Mesh, evals, log_blowup: int, shift: int):
    """Distributed coset LDE: distributed iNTT → shift-scale → zero-pad →
    distributed NTT (p3-dft coset_lde_batch semantics)."""
    n, w = evals.shape
    log_n = log2_strict(n)
    coeffs = distributed_ntt(mesh, evals, inverse=True)
    sp = jnp.asarray(np_to_mont(np_geom_powers(shift % P, n)))
    coeffs = fp_mul(coeffs, sp[:, None])
    padded = jnp.zeros((n << log_blowup, w), jnp.uint32).at[:n, :].set(coeffs)
    return distributed_ntt(mesh, padded)
