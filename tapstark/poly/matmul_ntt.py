"""MXU NTT: four-step member transforms as modular matrix multiplications.

The butterfly pipelines (poly.ntt, poly.pallas_ntt) run on the VPU and are
bound by per-stage vector relayouts. The MXU (systolic array) is where the
TPU's arithmetic lives — so cast each four-step member transform as a dense
R x R DFT-matrix multiply and feed it to the MXU exactly:

  - decompose canonical u32 values into 5 limbs of 7 bits (int8-safe),
  - 25 int8 x int8 -> int32 dot_generals (the MXU's native int path),
    grouped by limb-shift into 9 partial sums (max |sum| = R * 127^2 * 5
    < 2^31, no overflow),
  - recombine: y = sum_s S_s * (2^(7s) mod p) mod p via the uint32
    Montgomery elementwise kernel.

All NTT math here is in CANONICAL form (matmul is exact integer math);
Montgomery conversion happens only at the LDE entry/exit boundaries.

STATUS: RETIRED to an exact, tested experiment — the Pallas butterfly
pipeline (poly.pallas_ntt) is the defended default TPU kernel. The
roofline argument (see bench.py's roofline output for the measured side):

  - The LDE workload is VPU-bound, not HBM- or MXU-bound: the butterfly
    pipeline moves ~0.4 GB per 2^20 LDE (~2% of HBM peak) and runs the
    Montgomery butterfly at ~30 int ALU ops.
  - The MXU dots here are nearly free: 25 int8 dots x 3 levels at the
    measured 15.5 TMAC/s cost ~2.7 ms of the 23.5 ms total.
  - The loss is the EPILOGUE: recombining 9 shift buckets costs ~9
    Montgomery multiplies per element per level — 27 VPU muls/element
    across 3 levels, vs ~11 muls/element for the whole butterfly pipeline
    (half a mul per element per stage x 22 stages). Offloading the
    multiplies to the MXU therefore INCREASES the binding (VPU) work; no
    transpose/fusion fix can close that, so the dot-dimension-numbers
    rewrite was not pursued.
  - A win would need a fundamentally cheaper recombination (fewer limbs
    overflows int32 accumulation at R=128; Barrett folding the shift
    constants hits the same 2^31 ceiling).

Measurement history on the axon-relay v5lite at 2^20/blowup 4: unfused XLA
composition 80 ms; fused members 15.5 TMAC/s but composite jit compiles
pathologically (63 ms, XLA layout assignment across pallas boundaries);
separate-jit chain 23.9 ms; outer twiddle folded into the epilogue 23.5 ms;
butterfly pipeline 19.6 ms.

Reference capability parity: p3-dft Radix2Dit / coset_lde_batch (the PCS
commit path, reference fri/src/two_adic_pcs.rs:237-239) — re-architected
for the MXU rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.constants import P, R_MOD_P, two_adic_generator
from ..field.device import fp_add, fp_mul
from ..utils import log2_strict
from .powers import np_geom_powers

_LIMB_BITS = 7
_NUM_LIMBS = 5  # covers < 2^35; values are < 2^31
_R2 = (R_MOD_P * R_MOD_P) % P  # mont(R): to_mont multiplier


@functools.lru_cache(maxsize=None)
def _w_matrix_limbs(log_r: int, inverse: bool) -> np.ndarray:
    """(NUM_LIMBS, R, R) int8: 7-bit limbs of the DFT matrix W[k,i] = w^{ki}
    (inverse: w^{-ki} / R, the member-transform share of the 1/n scale)."""
    r = 1 << log_r
    w = two_adic_generator(log_r)
    if inverse:
        w = pow(w, P - 2, P)
    rows = np.stack(
        [np_geom_powers(pow(w, k, P), r) for k in range(r)]
    ).astype(np.uint64)
    if inverse:
        rows = rows * pow(r, P - 2, P) % P
    out = np.empty((_NUM_LIMBS, r, r), np.int8)
    for l in range(_NUM_LIMBS):
        out[l] = ((rows >> (_LIMB_BITS * l)) & ((1 << _LIMB_BITS) - 1)).astype(
            np.int8
        )
    return out


def _x_limbs(x):
    """(n, b) uint32 -> (NUM_LIMBS, n, b) int8 of 7-bit limbs."""
    mask = jnp.uint32((1 << _LIMB_BITS) - 1)
    return jnp.stack(
        [((x >> (_LIMB_BITS * l)) & mask).astype(jnp.int8) for l in range(_NUM_LIMBS)]
    )


@functools.lru_cache(maxsize=None)
def _shift_consts_mont() -> np.ndarray:
    """mont(2^(7s)) for s = 0 .. 2*(NUM_LIMBS-1): fp_mul(S_s, c_s) = the
    canonical product S_s * 2^(7s) mod p."""
    return np.array(
        [(1 << (_LIMB_BITS * s)) % P * R_MOD_P % P for s in range(2 * _NUM_LIMBS - 1)],
        np.uint32,
    )


def mod_matmul(w_limbs, x):
    """(R, R) DFT-matrix (as limbs) times (R, B) canonical u32 -> canonical.

    25 MXU int8 dots grouped into 9 shift buckets, then a modular
    recombination on the VPU. (Unfused XLA composition — the CPU/test path;
    on TPU mod_matmul_fused keeps the accumulators in VMEM.)"""
    xl = _x_limbs(x)
    consts = jnp.asarray(_shift_consts_mont())
    shift_sums = [None] * (2 * _NUM_LIMBS - 1)
    for a in range(_NUM_LIMBS):
        for b in range(_NUM_LIMBS):
            d = jax.lax.dot_general(
                w_limbs[a],
                xl[b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = a + b
            shift_sums[s] = d if shift_sums[s] is None else shift_sums[s] + d
    acc = None
    for s, ss in enumerate(shift_sums):
        term = fp_mul(ss.astype(jnp.uint32), consts[s])
        acc = term if acc is None else fp_add(acc, term)
    return acc


_TILE_B = 512


def _limb_dots_epilogue(w_ref, x):
    """Shared kernel body: limb-decompose, 25 MXU dots into 9 int32
    accumulators that never leave VMEM, modular recombination."""
    mask = jnp.uint32((1 << _LIMB_BITS) - 1)
    xl = [
        ((x >> (_LIMB_BITS * l)) & mask).astype(jnp.int8)
        for l in range(_NUM_LIMBS)
    ]
    consts = [int(c) for c in _shift_consts_mont()]
    shift_sums = [None] * (2 * _NUM_LIMBS - 1)
    for a in range(_NUM_LIMBS):
        wa = w_ref[a]
        for b in range(_NUM_LIMBS):
            d = jax.lax.dot_general(
                wa,
                xl[b],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            s = a + b
            shift_sums[s] = d if shift_sums[s] is None else shift_sums[s] + d
    acc = None
    for s, ss in enumerate(shift_sums):
        term = fp_mul(ss.astype(jnp.uint32), jnp.uint32(consts[s]))
        acc = term if acc is None else fp_add(acc, term)
    return acc


def _fused_kernel(w_ref, x_ref, o_ref):
    o_ref[:] = _limb_dots_epilogue(w_ref, x_ref[:])


def _fused_kernel_tw(w_ref, x_ref, tw_ref, o_ref):
    """As _fused_kernel plus the outer-twiddle multiply in the epilogue
    (saves a separate full-array modular-multiply pass per level)."""
    o_ref[:] = fp_mul(_limb_dots_epilogue(w_ref, x_ref[:]), tw_ref[:])


@functools.partial(jax.jit, static_argnames=("log_r", "inverse"))
def mod_matmul_fused(x, log_r: int, inverse: bool, tw=None):
    """TPU path of mod_matmul: one pallas kernel per B-tile, accumulators
    and limb temporaries resident in VMEM (the unfused version round-trips
    nine int32 partial-sum arrays through HBM per level). Optional tw
    (R, B) Montgomery factors are multiplied in the kernel epilogue."""
    r, b = x.shape
    assert r == 1 << log_r
    pad = (-b) % _TILE_B
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
        if tw is not None:
            tw = jnp.pad(tw, ((0, 0), (0, pad)))
    bp = x.shape[1]
    w = jnp.asarray(_w_matrix_limbs(log_r, inverse))
    interpret = jax.default_backend() != "tpu"
    in_specs = [
        pl.BlockSpec(w.shape, lambda j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, _TILE_B), lambda j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [w, x]
    kernel = _fused_kernel
    if tw is not None:
        in_specs.append(
            pl.BlockSpec((r, _TILE_B), lambda j: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(tw)
        kernel = _fused_kernel_tw
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(bp // _TILE_B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (r, _TILE_B), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, bp), jnp.uint32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
    return out[:, :b] if pad else out


@functools.lru_cache(maxsize=None)
def _outer_twiddle_mont_mm(log_r: int, log_c: int, inverse: bool) -> np.ndarray:
    """(R, C) mont(g^{k1*i2}): fp_mul against canonical keeps canonical."""
    g = two_adic_generator(log_r + log_c)
    if inverse:
        g = pow(g, P - 2, P)
    rows = [
        np_geom_powers(pow(g, k1, P), 1 << log_c) for k1 in range(1 << log_r)
    ]
    return (np.stack(rows).astype(np.uint64) * R_MOD_P % P).astype(np.uint32)


# MXU systolic width: member transforms of this radix keep the matmul-NTT's
# extra MAC factor at R/log2(R) = 128/7 while feeding full-width matmuls.
_LOG_RADIX = 7


def ntt_matmul(x, inverse: bool = False):
    """NTT/iNTT of (n, w) CANONICAL u32, natural -> natural order, on the MXU.

    Mixed-radix recursion with i = C*i1 + i2, k = k1 + R*k2 (R = 128):
      A = W_R @ x.reshape(R, C*w); twiddle g^{k1*i2};
      transpose; recurse NTT_C batched over (k1, w); flat k2*R + k1 = k.
    Each member's W folds its own 1/R share of the inverse scale, so the
    recursion totals 1/n."""
    n, w = x.shape
    log_n = log2_strict(n)
    fused = jax.default_backend() == "tpu"

    def member(xx, log_rr):
        if fused:
            return mod_matmul_fused(xx, log_rr, inverse)
        return mod_matmul(jnp.asarray(_w_matrix_limbs(log_rr, inverse)), xx)

    if log_n <= _LOG_RADIX:
        return member(x, log_n)
    log_r = _LOG_RADIX
    log_c = log_n - log_r
    r, c = 1 << log_r, 1 << log_c

    if fused:
        # outer twiddle in the kernel epilogue: one less full-array pass
        twf = jnp.asarray(_outer_twiddle_rep(log_r, log_c, w, inverse))
        a = mod_matmul_fused(x.reshape(r, c * w), log_r, inverse, tw=twf)
        a = a.reshape(r, c, w)
    else:
        a = member(x.reshape(r, c * w), log_r)  # A[k1, (i2, w)]
        tw = jnp.asarray(_outer_twiddle_mont_mm(log_r, log_c, inverse))
        a = fp_mul(a.reshape(r, c, w), tw[:, :, None])
    b = jnp.swapaxes(a, 0, 1).reshape(c, r * w)  # B[i2, (k1, w)]
    y = ntt_matmul(b, inverse)  # NTT_C batched: Y[k2, (k1, w)]
    return y.reshape(n, w)  # flat k2*R + k1 = k


@functools.lru_cache(maxsize=None)
def _outer_twiddle_rep(log_r: int, log_c: int, w: int, inverse: bool) -> np.ndarray:
    """(R, C*w) outer twiddles repeated across the width batch (the layout
    of the member output's columns), for the in-kernel epilogue."""
    return np.repeat(_outer_twiddle_mont_mm(log_r, log_c, inverse), w, axis=1)


@functools.lru_cache(maxsize=None)
def _block_scale_consts(log_n: int, log_blowup: int, shift: int) -> np.ndarray:
    """(n, blow) mont((shift * w_N^r)^i): canonical coeff * this = canonical
    block-scaled coeff (block-decomposed LDE, natural coefficient order)."""
    n = 1 << log_n
    w_big = two_adic_generator(log_n + log_blowup)
    cols = []
    for rblk in range(1 << log_blowup):
        base = shift * pow(w_big, rblk, P) % P
        cols.append(np_geom_powers(base, n).astype(np.uint64) * R_MOD_P % P)
    return np.stack(cols, axis=1).astype(np.uint32)


def coset_lde_batch_matmul(evals, log_blowup: int, shift: int):
    """Coset LDE (Montgomery in/out, natural-order rows) on the MXU:
    iNTT -> per-block coset scales -> one forward NTT of width blow*w
    (output stride-slice r is block r; big-domain index k = blow*m + r)."""
    n, w = evals.shape
    log_n = log2_strict(n)
    blow = 1 << log_blowup
    # mont -> canonical: fp_mul(a_mont, 1) = a
    x = fp_mul(evals, jnp.uint32(1))
    coeffs = ntt_matmul(x, inverse=True)  # canonical, natural order
    scales = jnp.asarray(_block_scale_consts(log_n, log_blowup, shift % P))
    scaled = fp_mul(coeffs[:, None, :], scales[:, :, None])  # (n, blow, w)
    y = ntt_matmul(scaled.reshape(n, blow * w))  # canonical evals
    # canonical -> mont: fp_mul(a, mont(R)) = a*R
    return fp_mul(y, jnp.uint32(_R2)).reshape(n * blow, w)
