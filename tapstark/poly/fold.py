"""FRI fold kernel (device) + exact host fold_row.

Reference parity: fold_matrix / fold_row in
/root/reference/fri/src/two_adic_pcs.rs:87-147 and fri/src/fold_even_odd.rs.

Input is a (half, 2) matrix of extension elements in bit-reversed order;
output is the folded (half,) vector:
    out[i] = (1/2 + beta/2 * g_inv^i) * row[0] + (1/2 - beta/2 * g_inv^i) * row[1]
with the g_inv powers themselves in bit-reversed order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.constants import P
from ..field.device import (
    MONT_HALF,
    ef_add,
    ef_mul,
    ef_mul_base,
    ef_sub,
    np_from_mont,
    np_to_mont,
)
from ..field.scalar import EF4, F
from ..utils import bitrev_indices, log2_strict, reverse_bits_len


@functools.lru_cache(maxsize=None)
def _g_inv_powers_bitrev(log_half: int) -> np.ndarray:
    """bitrev([g_inv^0 .. g_inv^(half-1)]) Montgomery uint32, g of order 2*half."""
    from .powers import np_geom_powers

    g_inv = pow(F.two_adic_generator(log_half + 1).v, P - 2, P)
    pows = np_geom_powers(g_inv, 1 << log_half)
    return np_to_mont(pows[bitrev_indices(log_half)])


def fold_matrix(beta_mont, m):
    """Fold a (half, 2, 4) ext matrix with beta (4,) Montgomery array → (half, 4)."""
    half = m.shape[0]
    log_half = log2_strict(half)
    half_one = jnp.uint32(MONT_HALF)
    half_beta = ef_mul_base(beta_mont[None, :], half_one[None])[0]  # (4,)
    ginv = jnp.asarray(_g_inv_powers_bitrev(log_half))  # (half,)
    power = ef_mul_base(jnp.broadcast_to(half_beta, (half, 4)), ginv)  # (half,4)
    half_vec = jnp.zeros((half, 4), jnp.uint32).at[:, 0].set(half_one)
    c_plus = ef_add(half_vec, power)
    c_minus = ef_sub(half_vec, power)
    return ef_add(ef_mul(c_plus, m[:, 0, :]), ef_mul(c_minus, m[:, 1, :]))


fold_matrix_jit = jax.jit(fold_matrix)


def _ef_mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact EF4 product of canonical (n, 4) uint64 arrays
    (BabyBear[x]/(x^4 - 11)). Each partial product is reduced before
    accumulation so every intermediate stays far below 2^64."""
    pp = np.uint64(P)
    c = [np.zeros(a.shape[0], dtype=np.uint64) for _ in range(4)]
    for i in range(4):
        for j in range(4):
            prod = (a[:, i] * b[:, j]) % pp
            k = i + j
            if k < 4:
                c[k] += prod
            else:
                c[k - 4] += np.uint64(11) * prod
    return np.stack([x % pp for x in c], axis=1)


def fold_matrix_host(beta: EF4, m: np.ndarray) -> np.ndarray:
    """Exact host twin of fold_matrix on CANONICAL uint32 arrays: folds a
    (half, 2, 4) extension matrix to (half, 4). The FRI commit phase uses
    this for tail layers below the device-commit threshold — their trees
    build on the host anyway, so folding on the host removes the per-layer
    device dispatch + canonical-fetch relay round trips (see
    fri/prover.py:_commit_phase)."""
    half = m.shape[0]
    log_half = log2_strict(half)
    pp = np.uint64(P)
    ginv = np_from_mont(_g_inv_powers_bitrev(log_half)).astype(np.uint64)  # (half,)
    inv2 = np.uint64(pow(2, P - 2, P))
    half_beta = (np.array(beta.c, dtype=np.uint64) * inv2) % pp  # (4,)
    power = (half_beta[None, :] * ginv[:, None]) % pp  # (half, 4)
    c_plus = power.copy()
    c_plus[:, 0] = (c_plus[:, 0] + inv2) % pp
    c_minus = (pp - power) % pp
    c_minus[:, 0] = (c_minus[:, 0] + inv2) % pp
    e0 = m[:, 0, :].astype(np.uint64)
    e1 = m[:, 1, :].astype(np.uint64)
    out = (_ef_mul_np(c_plus, e0) + _ef_mul_np(c_minus, e1)) % pp
    return out.astype(np.uint32)


def fold_row_scalar(index: int, log_height: int, beta: EF4, e0: EF4, e1: EF4) -> EF4:
    """Exact host fold of one row (verifier path, reference
    fri/src/two_adic_pcs.rs:87-114): 2-point interpolation evaluated at beta."""
    subgroup_start = F.two_adic_generator(log_height + 1).exp(
        reverse_bits_len(index, log_height)
    )
    x0 = subgroup_start
    x1 = subgroup_start * F.two_adic_generator(1)
    xs = [x0, x1]
    # reverse_slice_index_bits of a 2-element list is the identity
    return e0 + (beta - EF4.from_base(xs[0])) * (e1 - e0) * (
        EF4.from_base(xs[1] - xs[0]).inverse()
    )
