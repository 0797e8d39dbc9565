"""Vectorized modular power tables (host numpy, exact) and their
device-built twins (no O(n) host->device upload — the axon relay moves
~3-7 MB/s, so a 2^22-point table costs seconds if shipped from the host)."""

from __future__ import annotations

import functools

import numpy as np

from ..field.constants import P


def np_geom_powers(g: int, n: int, shift: int = 1) -> np.ndarray:
    """[shift, shift*g, ..., shift*g^(n-1)] mod P as uint32 (canonical).

    O(n log n) fully-vectorized square-and-multiply over the index bits
    (avoids a Python-level length-n loop for 2^20-sized domains).
    """
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    g %= P
    idx = np.arange(n, dtype=np.uint64)
    acc = np.full(n, shift % P, dtype=np.uint64)
    gp = g % P
    bits = max(1, int(n - 1).bit_length())
    for b in range(bits):
        mask = (idx >> np.uint64(b)) & np.uint64(1)
        mult = np.where(mask == 1, np.uint64(gp), np.uint64(1))
        acc = (acc * mult) % np.uint64(P)
        gp = gp * gp % P
    return acc.astype(np.uint32)

def _scalar_mont(v: int):
    import jax.numpy as jnp

    from ..field.device import np_to_mont

    return jnp.asarray(np_to_mont(np.array([v % P], np.uint32)))


def _geom_powers_mont_impl(base_mont, shift_mont, log_n: int):
    """shift * base^i (Montgomery) for i < 2^log_n, built on device in
    log_n doubling steps: p_{k+1} = [p_k, p_k * base^(2^k)]."""
    import jax.numpy as jnp

    from ..field.device import fp_mul

    p = shift_mont.reshape(1)
    step = base_mont.reshape(1)
    for _ in range(log_n):
        p = jnp.concatenate([p, fp_mul(p, step)])
        step = fp_mul(step, step)
    return p


@functools.lru_cache(maxsize=None)
def _geom_powers_mont_jit():
    import jax

    return jax.jit(_geom_powers_mont_impl, static_argnames=("log_n",))


def geom_powers_mont_dev(base: int, log_n: int, shift: int = 1):
    """Device (2^log_n,) Montgomery array [shift * base^i]: one dispatch,
    nothing O(n) crosses the host->device link."""
    return _geom_powers_mont_jit()(
        _scalar_mont(base), _scalar_mont(shift), log_n=log_n
    )


def _bitrev_1d_impl(x, log_n: int):
    """Bit-reversal permutation of a 1-D array via two small-digit row
    gathers + a transpose (a full 2^log_n index table would itself be a
    multi-MB upload). y[p1*C + p2] = x[brv_C(p2)*R + brv_R(p1)]."""
    import jax.numpy as jnp

    from ..utils import bitrev_indices

    if log_n <= 1:
        return x
    log_c = log_n // 2
    log_r = log_n - log_c
    r, c = 1 << log_r, 1 << log_c
    br = jnp.asarray(bitrev_indices(log_r).astype(np.int32))
    bc = jnp.asarray(bitrev_indices(log_c).astype(np.int32))
    z = x.reshape(c, r)[bc][:, br]  # z[p2, p1] = x[brv_C(p2)*R + brv_R(p1)]
    return z.T.reshape(1 << log_n)


@functools.lru_cache(maxsize=None)
def _bitrev_1d_jit():
    import jax

    return jax.jit(_bitrev_1d_impl, static_argnames=("log_n",))


def bitrev_1d_dev(x, log_n: int):
    return _bitrev_1d_jit()(x, log_n=log_n)
