"""Barycentric evaluation of polynomials given on a multiplicative coset.

Reference parity: p3-interpolation `interpolate_coset`, used by the PCS open
(/root/reference/fri/src/two_adic_pcs.rs:358-369).

For evals y_i of p over the coset {s*g^i} (natural order), and Z(X) = X^n - s^n:
    p(z) = Z(z) / (n * s^n) * sum_i y_i * x_i / (z - x_i)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field.constants import P
from ..field.device import (
    ef_const,
    ef_inv,
    ef_mul,
    ef_mul_base,
    np_to_mont,
)
from ..field.scalar import EF4, F
from ..utils import log2_strict
from .powers import np_geom_powers
from .reduce import fp_sum_axis0


def _coset_points_mont(log_n: int, shift: int) -> np.ndarray:
    g = F.two_adic_generator(log_n).v
    return np_to_mont(np_geom_powers(g, 1 << log_n, shift))


def _interp_weights(xs_mont, z_const):
    """w_i = x_i / (z - x_i) as (n, 4) Montgomery array."""
    n = xs_mont.shape[0]
    z_bcast = jnp.broadcast_to(z_const, (n, 4))
    denom = z_bcast.at[:, 0].set(
        # (z - x_i): subtract the base point from coefficient 0
        jnp.where(
            z_bcast[:, 0] >= xs_mont,
            z_bcast[:, 0] - xs_mont,
            z_bcast[:, 0] + jnp.uint32(P) - xs_mont,
        )
    )
    return ef_mul_base(ef_inv(denom), xs_mont)


def _interp_core(mat, xs, z_const, scale_const, col_chunk: int = 64):
    weights = _interp_weights(xs, z_const)  # (n, 4)
    n, w = mat.shape
    outs = []
    for c0 in range(0, w, col_chunk):
        cols = mat[:, c0 : c0 + col_chunk]  # (n, wc)
        prod = ef_mul_base(weights[:, None, :], cols)  # (n, wc, 4)
        outs.append(fp_sum_axis0(prod))  # (wc, 4)
    acc = jnp.concatenate(outs, axis=0)  # (w, 4)
    return ef_mul(acc, jnp.broadcast_to(scale_const, acc.shape))


_interp_core_jit = jax.jit(_interp_core, static_argnames=("col_chunk",))


def interpolate_coset(mat, shift: int, z: EF4):
    """Evaluate each column of mat ((n, w) base Montgomery, natural order over
    the coset shift*H_n) at the extension point z. Returns (w, 4) Montgomery."""
    n = mat.shape[0]
    log_n = log2_strict(n)
    s = shift % P
    s_pow_n = pow(s, n, P)
    z_pow_n = z.exp(n)
    scale = (z_pow_n - EF4((s_pow_n, 0, 0, 0))) * EF4(
        ((n % P) * s_pow_n % P, 0, 0, 0)
    ).inverse()
    xs = jnp.asarray(_coset_points_mont(log_n, s))
    return _interp_core_jit(mat, xs, ef_const(z), ef_const(scale))


def interpolate_coset_host(rows: list[list[F]], shift: int, z: EF4) -> list[EF4]:
    """Exact host-side reference implementation (tests / tiny inputs)."""
    n = len(rows)
    w = len(rows[0]) if rows else 0
    s = F(shift)
    g = F.two_adic_generator(log2_strict(n))
    s_pow_n = s.exp(n)
    scale = (z.exp(n) - EF4.from_base(s_pow_n)) * EF4.from_base(
        F(n) * s_pow_n
    ).inverse()
    out = [EF4.zero() for _ in range(w)]
    x = s
    for i in range(n):
        wi = EF4.from_base(x) * (z - EF4.from_base(x)).inverse()
        for j in range(w):
            out[j] = out[j] + wi * rows[i][j]
        x = x * g
    return [scale * o for o in out]
