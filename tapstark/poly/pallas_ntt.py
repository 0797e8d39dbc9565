"""Pallas TPU kernel for the NTT butterfly passes.

The jnp NTT (poly.ntt) materializes every butterfly stage through HBM
(log N full-array passes). This kernel runs ALL stages of a size-R transform
inside VMEM: the four-step decomposition N = R*C maps both member transforms
to batched column NTTs whose butterflies move along the SUBLANE axis while
the lane axis (the batch: other digit x width) stays fully parallel — the
layout the VPU wants. Montgomery uint32 arithmetic (16-bit limb REDC) runs
as int ops in-register.

    full NTT = bitrev_R -> [pallas: log R fused stages]
               -> outer twiddle -> transpose
               -> bitrev_C -> [pallas: log C fused stages]

(one HBM round trip per step instead of log N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.constants import P, R_MOD_P, two_adic_generator
from ..field.device import fp_add, fp_mul, fp_sub, np_to_mont
from ..utils import bitrev_indices, log2_strict
from .ntt import _n_inv_mont, _shift_powers, _stage_twiddles

_LANE = 128


def _packed_twiddles(log_r: int, inverse: bool) -> np.ndarray:
    """(log_r, R/2) uint32: stage s-1 row holds its 2^(s-1) twiddles (padded)."""
    tws = _stage_twiddles(log_r, inverse)
    half = max(1 << (log_r - 1), 1)
    out = np.zeros((max(log_r, 1), half), dtype=np.uint32)
    for s in range(1, log_r + 1):
        out[s - 1, : 1 << (s - 1)] = tws[s - 1]
    return out


def _butterfly_kernel(log_r: int):
    r = 1 << log_r

    def kernel(x_ref, tw_ref, o_ref):
        x = x_ref[:]  # (R, LANE)
        for s in range(1, log_r + 1):
            m = 1 << s
            half = m >> 1
            tw = tw_ref[s - 1, :half]  # (half,)
            blk = x.reshape(r // m, m, _LANE)
            lo = blk[:, :half, :]
            hi = blk[:, half:, :]
            t = fp_mul(hi, tw[None, :, None])
            x = jnp.concatenate([fp_add(lo, t), fp_sub(lo, t)], axis=1).reshape(
                r, _LANE
            )
            # stage through the output ref so Mosaic reuses one buffer
            # instead of keeping all log R stage temporaries live
            o_ref[:] = x
            x = o_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("log_r", "inverse"))
def _ntt_cols_pallas(mat, log_r: int, inverse: bool):
    """Column NTTs of a (R, B) Montgomery matrix, ALL stages in one kernel.

    Input rows must already be bit-reversed; output is natural order."""
    r, b = mat.shape
    assert r == 1 << log_r
    pad = (-b) % _LANE
    if pad:
        mat = jnp.pad(mat, ((0, 0), (0, pad)))
    bp = mat.shape[1]
    tw = jnp.asarray(_packed_twiddles(log_r, inverse))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _butterfly_kernel(log_r),
        interpret=interpret,
        grid=(bp // _LANE,),
        in_specs=[
            pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, bp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(mat, tw)
    return out[:, :b] if pad else out


@functools.lru_cache(maxsize=None)
def _outer_twiddle_mont(log_r: int, log_c: int, inverse: bool) -> np.ndarray:
    """(R, C) matrix w_N^{k1*i2} in Montgomery form."""
    from ..field.constants import two_adic_generator
    from .powers import np_geom_powers

    w = two_adic_generator(log_r + log_c)
    if inverse:
        w = pow(w, P - 2, P)
    rows = [np_geom_powers(pow(w, k1, P), 1 << log_c) for k1 in range(1 << log_r)]
    return np_to_mont(np.stack(rows))


def ntt_pallas(x, inverse: bool = False):
    """NTT/iNTT of an (n, w) Montgomery matrix, natural -> natural order."""
    n, w = x.shape
    log_n = log2_strict(n)
    if log_n <= 1:
        from .ntt import intt, ntt

        return intt(x) if inverse else ntt(x)
    log_c = log_n // 2
    log_r = log_n - log_c
    r, c = 1 << log_r, 1 << log_c

    # step 1: inner NTT over i1 (size R), batched over (i2, w)
    m = x.reshape(r, c * w)
    m = jnp.take(m, jnp.asarray(bitrev_indices(log_r).astype(np.int32)), axis=0)
    a = _ntt_cols_pallas(m, log_r, inverse)  # A[k1, (i2, w)]

    # step 2: outer twiddle w_N^{k1*i2}
    tw = jnp.asarray(_outer_twiddle_mont(log_r, log_c, inverse))
    a = a.reshape(r, c, w)
    a = fp_mul(a, tw[:, :, None])

    # step 3: transpose to (C, R, w), batch = (k1, w)
    b = jnp.swapaxes(a, 0, 1).reshape(c, r * w)
    b = jnp.take(b, jnp.asarray(bitrev_indices(log_c).astype(np.int32)), axis=0)
    y = _ntt_cols_pallas(b, log_c, inverse)  # Y[k2, (k1, w)]

    out = y.reshape(n, w)  # flat index k2*R + k1 == k  (natural order)
    if inverse:
        # member kernels apply no normalization; scale once by 1/N
        out = fp_mul(out, jnp.uint32(_n_inv_mont(log_n)))
    return out


def coset_lde_batch_pallas(evals, log_blowup: int, shift: int):
    """Pallas-backed coset LDE (p3-dft coset_lde_batch semantics)."""
    n, w = evals.shape
    log_n = log2_strict(n)
    coeffs = ntt_pallas(evals, inverse=True)
    sp = jnp.asarray(_shift_powers(log_n, shift % P))
    coeffs = fp_mul(coeffs, sp[:, None])
    padded = jnp.zeros((n << log_blowup, w), jnp.uint32).at[:n, :].set(coeffs)
    return ntt_pallas(padded)


# ---------------------------------------------------------------------------
# Gather-free LDE: DIF/DIT member transforms (bit-reversal absorbed into
# layout algebra; the only index gather left is the final bitrev of the
# caller, replaced here by transposes the TPU handles natively).
#
#   DIF member: natural input -> bitrev output (used by the inverse NTT);
#   DIT member: bitrev input -> natural output (the existing kernel).
#
# Inverse (evals natural -> coeffs in bitrev_n order):
#   view (R, C); DIF over axis0; twiddle T[p1, i2] = w^{-brv_R(p1) * i2};
#   transpose; DIF over axis0 (size C); transpose -> flat bitrev_n. scale 1/n.
# Forward (coeffs in bitrev_N order -> evals natural):
#   view (C, R) [axis0 = brv_C(i2), axis1 = brv_R(i1)]; transpose; DIT over
#   axis0 (size R); twiddle T[k1, p2] = w^{k1 * brv_C(p2)}; transpose; DIT
#   over axis0 (size C) -> Y[k2, k1] -> flat natural.
# ---------------------------------------------------------------------------


def _dif_butterfly_kernel(log_r: int):
    r = 1 << log_r

    def kernel(x_ref, tw_ref, o_ref):
        x = x_ref[:]  # (R, LANE), natural order
        for s in range(log_r, 0, -1):
            m = 1 << s
            half = m >> 1
            tw = tw_ref[s - 1, :half]
            blk = x.reshape(r // m, m, _LANE)
            lo = blk[:, :half, :]
            hi = blk[:, half:, :]
            s_lo = fp_add(lo, hi)
            s_hi = fp_mul(fp_sub(lo, hi), tw[None, :, None])
            x = jnp.concatenate([s_lo, s_hi], axis=1).reshape(r, _LANE)
            o_ref[:] = x
            x = o_ref[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("log_r", "inverse"))
def _dif_cols_pallas(mat, log_r: int, inverse: bool):
    """Column DIF transforms: natural input, bit-reversed output."""
    r, b = mat.shape
    assert r == 1 << log_r
    pad = (-b) % _LANE
    if pad:
        mat = jnp.pad(mat, ((0, 0), (0, pad)))
    bp = mat.shape[1]
    tw = jnp.asarray(_packed_twiddles(log_r, inverse))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _dif_butterfly_kernel(log_r),
        interpret=interpret,
        grid=(bp // _LANE,),
        in_specs=[
            pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, bp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(mat, tw)
    return out[:, :b] if pad else out


@functools.lru_cache(maxsize=None)
def _outer_twiddle_brv_rows(log_r: int, log_c: int, inverse: bool) -> np.ndarray:
    """(R, C): T[p1, i2] = w^{±brv_R(p1) * i2} (rows bit-reversed)."""
    t = _outer_twiddle_mont(log_r, log_c, inverse)
    return t[bitrev_indices_np(log_r)]


@functools.lru_cache(maxsize=None)
def _outer_twiddle_brv_cols(log_r: int, log_c: int, inverse: bool) -> np.ndarray:
    """(R, C): T[k1, p2] = w^{±k1 * brv_C(p2)} (columns bit-reversed)."""
    t = _outer_twiddle_mont(log_r, log_c, inverse)
    return t[:, bitrev_indices_np(log_c)]


def bitrev_indices_np(log_n: int):
    from ..utils import bitrev_indices

    return bitrev_indices(log_n)


def _split(log_n: int) -> tuple[int, int]:
    log_c = log_n // 2
    return log_n - log_c, log_c


def intt_to_bitrev_pallas(evals):
    """(n, w) natural evals -> coefficients in bitrev_n order (scaled 1/n)."""
    n, w = evals.shape
    log_n = log2_strict(n)
    log_r, log_c = _split(log_n)
    r, c = 1 << log_r, 1 << log_c
    m = evals.reshape(r, c * w)
    a = _dif_cols_pallas(m, log_r, inverse=True)  # A[p1, (i2, w)]
    tw = jnp.asarray(_outer_twiddle_brv_rows(log_r, log_c, True))
    a = fp_mul(a.reshape(r, c, w), tw[:, :, None])
    b = jnp.swapaxes(a, 0, 1).reshape(c, r * w)  # B[i2, (p1, w)]
    y = _dif_cols_pallas(b, log_c, inverse=True)  # Y[p2, (p1, w)]
    out = jnp.swapaxes(y.reshape(c, r, w), 0, 1).reshape(n, w)
    # flat index p1*C + p2 = brv_n(i) for coefficient i  (bitrev_n order)
    return fp_mul(out, jnp.uint32(_n_inv_mont(log_n)))


def ntt_from_bitrev_pallas(coeffs_brv):
    """(n, w) coefficients in bitrev_n order -> natural evaluations."""
    n, w = coeffs_brv.shape
    log_n = log2_strict(n)
    log_r, log_c = _split(log_n)
    r, c = 1 << log_r, 1 << log_c
    # with i = i1*C + i2 (i1 the high digit), flat bitrev_n index is
    # brv_C(i2)*R + brv_R(i1) -> view (C, R): axis0 = brv_C(i2),
    # axis1 = brv_R(i1)
    m = coeffs_brv.reshape(c, r, w)
    m = jnp.swapaxes(m, 0, 1)  # (R, C): axis0 = brv_R(i1)
    a = _ntt_cols_pallas(m.reshape(r, c * w), log_r, inverse=False)
    # A[k1, (brv_C(i2), w)]
    tw = jnp.asarray(_outer_twiddle_brv_cols(log_r, log_c, False))
    a = fp_mul(a.reshape(r, c, w), tw[:, :, None])
    b = jnp.swapaxes(a, 0, 1).reshape(c, r * w)  # B[brv_C(i2), (k1, w)]
    y = _ntt_cols_pallas(b, log_c, inverse=False)  # Y[k2, (k1, w)]
    return y.reshape(n, w)  # flat k2*R + k1 = k  (natural)


@functools.lru_cache(maxsize=None)
def _block_scales(log_n: int, log_blowup: int, shift: int) -> np.ndarray:
    """(blow, n) Montgomery scale tables in bitrev_n order: block r's table
    is the powers of (shift * w_N^r) with N = n << log_blowup."""
    from .powers import np_geom_powers  # local import to avoid cycles

    n = 1 << log_n
    w_big = two_adic_generator(log_n + log_blowup)
    brv = bitrev_indices_np(log_n)
    out = np.empty((1 << log_blowup, n), np.uint32)
    for r in range(1 << log_blowup):
        base = shift * pow(w_big, r, P) % P
        out[r] = np_to_mont(np_geom_powers(base, n))[brv]
    return out


def coset_lde_batch_pallas_blocks(evals, log_blowup: int, shift: int):
    """Coset LDE with NO zero padding: `blow` pre-scaled n-point NTTs.

    The padded big NTT spends its first log_blowup stages on butterflies
    against zeros and materializes 4x the data first. Instead, with
    N = blow*n and big-domain index k = blow*m + r:
        s*w_N^k = (s*w_N^r) * w_n^m,
    so output stride-slice r is the n-point NTT of the coefficients
    pre-scaled by powers of s*w_N^r — fused into the existing coset-shift
    multiply. ~log_n/(log_n+log_blowup) of the butterflies and none of the
    padding traffic."""
    if log2_strict(evals.shape[0]) < 4:
        return coset_lde_batch_pallas(evals, log_blowup, shift)
    n, w = evals.shape
    log_n = log2_strict(n)
    blow = 1 << log_blowup
    coeffs_brv = intt_to_bitrev_pallas(evals)
    scales = jnp.asarray(_block_scales(log_n, log_blowup, shift % P))
    # all blow blocks as extra batch width: ONE n-point NTT of width blow*w
    scaled = fp_mul(coeffs_brv[:, None, :], scales.T[:, :, None])  # (n, blow, w)
    y = ntt_from_bitrev_pallas(scaled.reshape(n, blow * w))
    # y[m, (r, w)]; natural big-domain index k = blow*m + r
    return y.reshape(n * blow, w)


def coset_lde_batch_pallas_nogather(evals, log_blowup: int, shift: int):
    """Coset LDE (natural-order rows) with no device index-gathers: the
    bit reversals are absorbed into twiddle tables, layout reshapes and
    transposes (cheap, tiled ops on TPU)."""
    if log2_strict(evals.shape[0]) < 4:
        return coset_lde_batch_pallas(evals, log_blowup, shift)
    n, w = evals.shape
    log_n = log2_strict(n)
    coeffs_brv = intt_to_bitrev_pallas(evals)
    # scale coeff i by shift^i: table in bitrev_n order
    sp = _shift_powers(log_n, shift % P)
    sp_brv = jnp.asarray(sp[bitrev_indices_np(log_n)])
    coeffs_brv = fp_mul(coeffs_brv, sp_brv[:, None])
    # zero-pad to bitrev_N layout: coeff at brv_n position p lands at p*2^b
    blow = 1 << log_blowup
    padded = jnp.zeros((n, blow, w), jnp.uint32).at[:, 0, :].set(coeffs_brv)
    return ntt_from_bitrev_pallas(padded.reshape(n * blow, w))
