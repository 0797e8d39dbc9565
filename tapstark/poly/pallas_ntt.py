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
from ..field.device import fp_mul, np_to_mont
from ..utils import bitrev_indices, log2_strict
from .ntt import _n_inv_mont, _shift_powers

_LANE = 128


@functools.lru_cache(maxsize=None)
def _packed_twiddles_shoup(log_r: int, inverse: bool) -> np.ndarray:
    """(2, log_r, R/2) uint32: canonical stage twiddles and their Shoup
    companions floor(w * 2^32 / p).

    The butterfly multiplies by trace-time-constant twiddles, so Shoup's
    precomputed-quotient multiplication applies: q = mulhi32(w_shoup, x),
    w*x mod p = (w*x - q*p) mod 2^32, result in [0, 2p) for ANY x < 2^32.
    Two u16-limb high products replace the Montgomery REDC chain, and the
    [0, 2p)-lazy range defers the conditional subtract."""
    from ..field.constants import two_adic_generator

    half = max(1 << (log_r - 1), 1)
    out = np.zeros((2, max(log_r, 1), half), dtype=np.uint32)
    for s in range(1, log_r + 1):
        g = two_adic_generator(s)
        if inverse:
            g = pow(g, P - 2, P)
        acc = 1
        for i in range(1 << (s - 1)):
            out[0, s - 1, i] = acc
            out[1, s - 1, i] = (acc << 32) // P
            acc = acc * g % P
    return out


def _shoup_mul(wc, ws, x):
    """w*x mod p in [0, 2p). wc: canonical twiddle (<p); ws: its Shoup
    companion; x: any uint32 (Montgomery or lazy [0, 2p) values both fine).
    Low product = one wrapping u32 multiply; high product via 16-bit limbs."""
    x0 = x & 0xFFFF
    x1 = x >> 16
    ws0 = ws & 0xFFFF
    ws1 = ws >> 16
    m00 = ws0 * x0
    mid1 = ws0 * x1
    mid = mid1 + ws1 * x0  # may wrap: carry recovered below
    midc = (mid < mid1).astype(jnp.uint32)
    lo = m00 + (mid << 16)
    cl = (lo < m00).astype(jnp.uint32)
    q = ws1 * x1 + (mid >> 16) + (midc << 16) + cl  # mulhi32(ws, x)
    wx = wc * x  # wrapping low 32 bits of w*x
    # q*P mod 2^32 for P = 0x78000001: q + ((q*0x78) << 24)
    qp = q + ((q * jnp.uint32(0x78)) << 24)
    return wx - qp


def _reduce2p(x):
    """[0, 2p) -> [0, p): the single deferred conditional subtract."""
    return jnp.where(x >= jnp.uint32(P), x - jnp.uint32(P), x)


def _butterfly_kernel(log_r: int):
    r = 1 << log_r

    def kernel(x_ref, tw_ref, o_ref):
        x = x_ref[:]  # (R, LANE), values lazily in [0, 2p)
        for s in range(1, log_r + 1):
            m = 1 << s
            half = m >> 1
            wc = tw_ref[0, s - 1, :half]  # canonical twiddles
            ws = tw_ref[1, s - 1, :half]  # Shoup companions
            blk = x.reshape(r // m, m, _LANE)
            lo = _reduce2p(blk[:, :half, :])
            t = _reduce2p(_shoup_mul(wc[None, :, None], ws[None, :, None], blk[:, half:, :]))
            x = jnp.concatenate(
                [lo + t, lo - t + jnp.uint32(P)], axis=1
            ).reshape(r, _LANE)
            # stage through the output ref so Mosaic reuses one buffer
            # instead of keeping all log R stage temporaries live
            o_ref[:] = x
            x = o_ref[:]
        o_ref[:] = _reduce2p(o_ref[:])  # canonicalize [0, 2p) -> [0, p)

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
    tw = jnp.asarray(_packed_twiddles_shoup(log_r, inverse))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _butterfly_kernel(log_r),
        interpret=interpret,
        grid=(bp // _LANE,),
        in_specs=[
            pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
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
        x = x_ref[:]  # (R, LANE), natural order, values lazily in [0, 2p)
        for s in range(log_r, 0, -1):
            m = 1 << s
            half = m >> 1
            wc = tw_ref[0, s - 1, :half]
            ws = tw_ref[1, s - 1, :half]
            blk = x.reshape(r // m, m, _LANE)
            lo = _reduce2p(blk[:, :half, :])
            hi = _reduce2p(blk[:, half:, :])
            s_lo = lo + hi  # [0, 2p)
            s_hi = _shoup_mul(
                wc[None, :, None], ws[None, :, None], lo - hi + jnp.uint32(P)
            )  # [0, 2p)
            x = jnp.concatenate([s_lo, s_hi], axis=1).reshape(r, _LANE)
            o_ref[:] = x
            x = o_ref[:]
        o_ref[:] = _reduce2p(o_ref[:])  # canonicalize [0, 2p) -> [0, p)

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
    tw = jnp.asarray(_packed_twiddles_shoup(log_r, inverse))
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _dif_butterfly_kernel(log_r),
        interpret=interpret,
        grid=(bp // _LANE,),
        in_specs=[
            pl.BlockSpec((r, _LANE), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(tw.shape, lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
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


# ---------------------------------------------------------------------------
# Fully-fused LDE: the entire four-step member-transform chain
# (butterflies -> outer twiddle -> TRANSPOSE -> butterflies) runs inside ONE
# Pallas kernel per half, with the inter-member transpose done IN VMEM.
#
# The multi-call pipeline above pays a full HBM round trip plus a dispatch
# for every step (2 member kernels + twiddle + 2 transposes per half); at
# 2^20 x small-width shapes those fixed costs dominate the ~3.5 ms of pure
# butterfly ALU. Here:
#   kernel A (grid w):        (R, C) tile [i1, i2] -> DIF rows -> * T1/n
#                             -> transpose -> DIF rows -> out [p2, p1]
#   kernel B (grid blow x w): tile [p2, p1] -> * block-scale -> transpose
#                             -> DIT rows -> * T2 -> transpose -> DIT rows
#                             -> flat natural block written interleaved
# Layout algebra identical to intt_to_bitrev_pallas / _block_scales /
# ntt_from_bitrev_pallas (tested above); only the data movement moved into
# VMEM. Values ride the lazy [0, 2p) Shoup range between stages and are
# canonicalized before each Montgomery table multiply.
# ---------------------------------------------------------------------------


def _dif_stages_inplace(x, tw_ref, log_r, stage_ref):
    """DIF butterflies along axis 0 of (R, B) x, staged through stage_ref."""
    r = 1 << log_r
    b = x.shape[1]
    for s in range(log_r, 0, -1):
        m = 1 << s
        half = m >> 1
        wc = tw_ref[0, s - 1, :half]
        ws = tw_ref[1, s - 1, :half]
        blk = x.reshape(r // m, m, b)
        lo = _reduce2p(blk[:, :half, :])
        hi = _reduce2p(blk[:, half:, :])
        s_lo = lo + hi
        s_hi = _shoup_mul(wc[None, :, None], ws[None, :, None], lo - hi + jnp.uint32(P))
        x = jnp.concatenate([s_lo, s_hi], axis=1).reshape(r, b)
        stage_ref[:] = x
        x = stage_ref[:]
    return x


def _dit_stages_inplace(x, tw_ref, log_r, stage_ref):
    """DIT butterflies (bitrev-in, natural-out) along axis 0, staged."""
    r = 1 << log_r
    b = x.shape[1]
    for s in range(1, log_r + 1):
        m = 1 << s
        half = m >> 1
        wc = tw_ref[0, s - 1, :half]
        ws = tw_ref[1, s - 1, :half]
        blk = x.reshape(r // m, m, b)
        lo = _reduce2p(blk[:, :half, :])
        t = _reduce2p(_shoup_mul(wc[None, :, None], ws[None, :, None], blk[:, half:, :]))
        x = jnp.concatenate([lo + t, lo - t + jnp.uint32(P)], axis=1).reshape(r, b)
        stage_ref[:] = x
        x = stage_ref[:]
    return x


@functools.lru_cache(maxsize=None)
def _t1_over_n(log_r: int, log_c: int) -> np.ndarray:
    """(R, C) Montgomery: w^{-brv_R(p1)*i2} / n  (outer twiddle of the
    inverse half with the 1/n normalization folded in)."""
    n = 1 << (log_r + log_c)
    w = pow(two_adic_generator(log_r + log_c), P - 2, P)
    n_inv = pow(n, P - 2, P)
    brv = bitrev_indices_np(log_r)
    rows = []
    from .powers import np_geom_powers

    for p1 in range(1 << log_r):
        base = pow(w, int(brv[p1]), P)
        row = np_geom_powers(base, 1 << log_c)
        rows.append((row.astype(np.uint64) * n_inv % P).astype(np.uint32))
    return np_to_mont(np.stack(rows))


@functools.lru_cache(maxsize=None)
def _scales_tiles(log_n: int, log_blowup: int, shift: int, log_r: int) -> np.ndarray:
    """(blow, C, R) Montgomery block-scale tables in tile layout [p2, p1]
    (the flat bitrev_n table of _block_scales reshaped+transposed)."""
    log_c = log_n - log_r
    s = _block_scales(log_n, log_blowup, shift)  # (blow, n) flat (p1, p2)
    return np.ascontiguousarray(
        s.reshape(1 << log_blowup, 1 << log_r, 1 << log_c).transpose(0, 2, 1)
    )


def _fused_intt_kernel(log_r: int, log_c: int):
    def kernel(x_ref, t1_ref, twr_ref, twc_ref, o_ref, s1_ref, s2_ref):
        x = x_ref[0]  # (R, C) [i1, i2]  (block (1, R, C): w leads)
        x = _dif_stages_inplace(x, twr_ref, log_r, s1_ref)  # [p1, i2]
        x = fp_mul(_reduce2p(x), t1_ref[:, :])  # * T1/n
        x = x.T  # in-VMEM transpose -> (C, R) [i2, p1]
        x = _dif_stages_inplace(x, twc_ref, log_c, s2_ref)
        o_ref[0] = _reduce2p(x)  # [p2, p1]

    return kernel


def _fused_fwd_kernel(log_r: int, log_c: int):
    # General split (odd log_n included). Tile convention (matches the intt
    # kernel's output): tile[p2, p1] of shape (C, R) holds coefficient
    # j = j2*R + j1 with j2 = brv_C(p2) (high digit) and j1 = brv_R(p1)
    # (low digit). The forward DFT Y[k1*C + k2] = sum_j c_j w^{jk} then
    # factors as: size-C DIT over j2 (tile axis 0, already bit-reversed),
    # twiddle w^{k2 * j1}, transpose, size-R DIT over j1.

    def kernel(a_ref, sc_ref, t2_ref, twc_ref, twr_ref, o_ref, s1_ref, s2_ref):
        x = a_ref[0]  # (C, R) [p2, p1]
        x = fp_mul(x, sc_ref[0])  # block scales (canonical inputs)
        x = _dit_stages_inplace(x, twc_ref, log_c, s1_ref)  # (C, R) [k2, p1]
        x = fp_mul(_reduce2p(x), t2_ref[:, :])  # * w_n^{k2 * brv_R(p1)}
        x = x.T  # (R, C) [p1, k2]
        x = _dit_stages_inplace(x, twr_ref, log_r, s2_ref)  # [k1, k2]
        o_ref[0, 0] = _reduce2p(x)  # (R, C) [k1, k2]: flat k = k1*C + k2

    return kernel


@functools.partial(jax.jit, static_argnames=("log_blowup", "shift"))
def coset_lde_batch_pallas_fused(evals, log_blowup: int, shift: int):
    """Coset LDE with the whole pipeline in TWO pallas dispatches."""
    n, w = evals.shape
    log_n = log2_strict(n)
    if log_n < 8 or log_n > 21:
        # tiny shapes aren't worth a pallas dispatch; above 2^21 the
        # (R, C) tiles outgrow VMEM — use the multi-call pipeline
        return coset_lde_batch_pallas_blocks(evals, log_blowup, shift)
    log_r, log_c = _split(log_n)
    r, c = 1 << log_r, 1 << log_c
    blow = 1 << log_blowup
    interpret = jax.default_backend() != "tpu"
    vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)

    twr = jnp.asarray(_packed_twiddles_shoup(log_r, True))
    twc = jnp.asarray(_packed_twiddles_shoup(log_c, True))
    t1 = jnp.asarray(_t1_over_n(log_r, log_c))
    x3 = jnp.transpose(evals.reshape(r, c, w), (2, 0, 1))  # (w, R, C)
    coeffs = pl.pallas_call(
        _fused_intt_kernel(log_r, log_c),
        interpret=interpret,
        grid=(w,),
        in_specs=[
            pl.BlockSpec((1, r, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(twr.shape, lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(twc.shape, lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, r), lambda j: (j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, c, r), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r, c), jnp.uint32),
            pltpu.VMEM((c, r), jnp.uint32),
        ],
        compiler_params=vmem,
    )(x3, t1, twr, twc)

    twrf = jnp.asarray(_packed_twiddles_shoup(log_r, False))
    twcf = jnp.asarray(_packed_twiddles_shoup(log_c, False))
    t2 = jnp.asarray(_outer_twiddle_brv_cols(log_c, log_r, False))  # (C, R)
    scales = jnp.asarray(_scales_tiles(log_n, log_blowup, shift % P, log_r))
    out = pl.pallas_call(
        _fused_fwd_kernel(log_r, log_c),
        interpret=interpret,
        grid=(blow, w),
        in_specs=[
            pl.BlockSpec((1, c, r), lambda rb, j: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, r), lambda rb, j: (rb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, r), lambda rb, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(twcf.shape, lambda rb, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(twrf.shape, lambda rb, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, r, c), lambda rb, j: (rb, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((blow, w, r, c), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((c, r), jnp.uint32),
            pltpu.VMEM((r, c), jnp.uint32),
        ],
        compiler_params=vmem,
    )(coeffs, scales, t2, twcf, twrf)
    # (blow, w, [k1, k2]) -> natural rows k_big = (k1*C + k2)*blow + rb
    out = jnp.transpose(out, (2, 3, 0, 1)).reshape(n * blow, w)
    return out
