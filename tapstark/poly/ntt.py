"""Batched radix-2 NTT / inverse NTT / coset LDE on device.

The flagship compute kernel (reference parity: p3-dft Radix2DitParallel /
`coset_lde_batch`, used by the PCS at /root/reference/fri/src/two_adic_pcs.rs:237).

Layout: a polynomial batch is a (n, w) uint32 matrix in Montgomery form —
n evaluations/coefficients down axis 0 (lanes-friendly when w is the trailing
axis is wrong for small w; XLA handles the transpose), w independent columns.

All transforms are natural-order → natural-order (explicit bit-reversal
permutation first), with per-stage twiddle tables precomputed host-side and
cached per log_n. Under jit the stage loop unrolls into log_n fused
butterfly passes, which XLA tiles onto the VPU; the cross-shard variant for
multi-chip meshes lives in tapstark.mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.constants import P, R_MOD_P
from ..field.device import fp_add, fp_mul, fp_sub, np_to_mont
from ..utils import bitrev_indices, log2_strict

# ---------------------------------------------------------------------------
# Twiddle precomputation (host, exact ints, converted once to Montgomery form)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple[np.ndarray, ...]:
    """Per-stage twiddle arrays for a DIT NTT of size 2**log_n.

    Stage s (s = 1..log_n) operates on blocks of size 2**s and needs the
    first 2**(s-1) powers of the order-2**s root (or its inverse).
    """
    from ..field.constants import two_adic_generator

    out = []
    for s in range(1, log_n + 1):
        g = two_adic_generator(s)
        if inverse:
            g = pow(g, P - 2, P)
        half = 1 << (s - 1)
        tw = np.empty(half, dtype=np.uint32)
        acc = 1
        for i in range(half):
            tw[i] = acc
            acc = acc * g % P
        out.append(np_to_mont(tw))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _n_inv_mont(log_n: int) -> int:
    n_inv = pow(1 << log_n, P - 2, P)
    return n_inv * R_MOD_P % P


@functools.lru_cache(maxsize=None)
def _shift_powers(log_n: int, shift: int) -> np.ndarray:
    """[shift^0, shift^1, ..., shift^(n-1)] in Montgomery form."""
    n = 1 << log_n
    pw = np.empty(n, dtype=np.uint32)
    acc = 1
    for i in range(n):
        pw[i] = acc
        acc = acc * shift % P
    return np_to_mont(pw)


# ---------------------------------------------------------------------------
# Core transforms (device)
# ---------------------------------------------------------------------------


def _butterfly_stages(x, log_n: int, inverse: bool):
    """Apply the log_n DIT butterfly stages to bit-reversed input x (n, w)."""
    n = x.shape[0]
    tws = _stage_twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m >> 1
        tw = jnp.asarray(tws[s - 1])  # (half,)
        blk = x.reshape(n // m, m, -1)
        lo = blk[:, :half, :]
        hi = blk[:, half:, :]
        t = fp_mul(hi, tw[None, :, None])
        x = jnp.concatenate([fp_add(lo, t), fp_sub(lo, t)], axis=1).reshape(n, -1)
    return x


def ntt(coeffs, log_n: int | None = None):
    """Forward NTT: coefficients (natural order) → evaluations (natural order).

    coeffs: (n, w) uint32 Montgomery array.
    """
    n = coeffs.shape[0]
    if log_n is None:
        log_n = log2_strict(n)
    if log_n == 0:
        return coeffs
    rev = jnp.asarray(bitrev_indices(log_n).astype(np.int32))
    x = jnp.take(coeffs, rev, axis=0)
    return _butterfly_stages(x, log_n, inverse=False)


def intt(evals, log_n: int | None = None):
    """Inverse NTT: evaluations (natural) → coefficients (natural)."""
    n = evals.shape[0]
    if log_n is None:
        log_n = log2_strict(n)
    if log_n == 0:
        return evals
    rev = jnp.asarray(bitrev_indices(log_n).astype(np.int32))
    x = jnp.take(evals, rev, axis=0)
    x = _butterfly_stages(x, log_n, inverse=True)
    return fp_mul(x, jnp.uint32(_n_inv_mont(log_n)))


def coset_lde_batch(evals, log_blowup: int, shift: int):
    """Low-degree extension onto a shifted coset (natural order output).

    Matches p3-dft `coset_lde_batch` semantics: interpret `evals` (n, w) as
    evaluations over the size-n subgroup, return evaluations of the same
    polynomials over the coset `shift * <g_{n * 2^log_blowup}>`
    (natural order; the PCS bit-reverses rows afterwards,
    reference fri/src/two_adic_pcs.rs:236-240).

    shift: canonical int.
    """
    n, w = evals.shape
    log_n = log2_strict(n)
    log_m = log_n + log_blowup
    coeffs = intt(evals, log_n)
    # scale coefficient i by shift^i, zero-pad to the large domain
    sp = jnp.asarray(_shift_powers(log_n, shift % P))
    coeffs = fp_mul(coeffs, sp[:, None])
    padded = jnp.zeros((1 << log_m, w), dtype=jnp.uint32).at[:n, :].set(coeffs)
    return ntt(padded, log_m)


def bit_reverse_rows(mat):
    """Permute rows by bit reversal (matches p3-matrix bit_reverse_rows).

    Large heights use the small-digit decomposition
    y[p1*C + p2] = x[brv_C(p2)*R + brv_R(p1)] — two tiny-table gathers and
    one transpose — instead of one 2^log_n-entry index gather: the full
    table is a multi-MB host upload per call and the monolithic take ran
    at ~2 s for a (2^20, 10) matrix on the TPU relay."""
    log_n = log2_strict(mat.shape[0])
    if log_n <= 1:
        return mat
    if log_n <= 10:
        rev = jnp.asarray(bitrev_indices(log_n).astype(np.int32))
        return jnp.take(mat, rev, axis=0)
    log_c = log_n // 2
    log_r = log_n - log_c
    r, c = 1 << log_r, 1 << log_c
    br = jnp.asarray(bitrev_indices(log_r).astype(np.int32))
    bc = jnp.asarray(bitrev_indices(log_c).astype(np.int32))
    z = mat.reshape(c, r, *mat.shape[1:])[bc][:, br]
    return jnp.swapaxes(z, 0, 1).reshape(mat.shape)


# jit-compiled entry points (shapes/static args keyed by XLA cache)
ntt_jit = jax.jit(ntt, static_argnames=("log_n",))
intt_jit = jax.jit(intt, static_argnames=("log_n",))
coset_lde_batch_jit = jax.jit(
    coset_lde_batch, static_argnames=("log_blowup", "shift")
)


def coset_lde_batch_auto(evals, log_blowup: int, shift: int):
    """coset_lde_batch via the Pallas fused-butterfly kernels on TPU, the
    plain jnp stage pipeline elsewhere (Pallas interpret mode on CPU is far
    slower than compiled jnp)."""
    import jax

    if jax.default_backend() == "tpu":
        from .pallas_ntt import coset_lde_batch_pallas_fused

        # two-dispatch fused path (in-VMEM transposes) where the square
        # tile factorization applies; multi-call blocks pipeline otherwise
        return coset_lde_batch_pallas_fused(evals, log_blowup, shift)
    return coset_lde_batch(evals, log_blowup, shift)
