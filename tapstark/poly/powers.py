"""Vectorized modular power tables (host numpy, exact)."""

from __future__ import annotations

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
