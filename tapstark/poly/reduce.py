"""Modular tree reductions on device.

jnp.sum would overflow/ignore the modulus, so sums over field arrays are
binary-tree fp_add reductions (log n fused passes).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field.device import fp_add


def fp_sum_axis0(x):
    """Sum a (n, ...) Montgomery uint32 array over axis 0 (n power of two not
    required)."""
    n = x.shape[0]
    while n > 1:
        half = n // 2
        lo = x[:half]
        hi = x[half : 2 * half]
        s = fp_add(lo, hi)
        if n % 2:
            s = jnp.concatenate([s, x[2 * half :]], axis=0)
        x = s
        n = x.shape[0]
    return x[0]
