"""Device-side BabyBear / EF4 arithmetic on uint32 JAX arrays.

Representation: every persistent device array holds field elements in
**Montgomery form** (x·R mod p, R = 2^32) as `jnp.uint32`. Conversion to the
canonical-u32 view happens only at serialization boundaries (transcript,
bit-commitments, taptree hashing) — mirroring Plonky3's internal Montgomery
representation while exposing canonical semantics
(reference: /root/reference/common/src/lib.rs:20-27).

The 32x32→64 products required by REDC are decomposed into 16-bit limb
products so everything stays in native 32-bit VPU ops (no 64-bit emulation).
Extension elements are structure-of-arrays: shape (..., 4) uint32.

These jnp implementations are the canonical kernels; Pallas variants for the
hottest loops live in tapstark.poly and fuse surrounding ops.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .constants import EXT_W, MU, P, R2_MOD_P, R_MOD_P

_U32 = jnp.uint32
# plain ints (weakly typed) so kernels don't capture device-array constants
_MASK16 = 0xFFFF
_P = P
_MU = MU
_P_HI16 = P >> 16  # 0x7800 (P = 0x7800_0001: lo16 = 1)

# Montgomery-form constants.
MONT_ONE = R_MOD_P
MONT_W = (EXT_W * R_MOD_P) % P
MONT_HALF = (pow(2, P - 2, P) * R_MOD_P) % P


def _mul_wide(a, b):
    """Full 64-bit product of uint32 a,b (a < 2^31) as (hi, lo) uint32 pair."""
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    m00 = a0 * b0
    mid = a0 * b1 + a1 * b0  # < 2^32 because a < 2^31
    m11 = a1 * b1
    lo = m00 + (mid << 16)
    carry = (lo < m00).astype(_U32)
    hi = m11 + (mid >> 16) + carry
    return hi, lo


def _redc(hi, lo):
    """Montgomery reduction of hi:lo (< p*2^32) → hi:lo * R^{-1} mod p."""
    m = lo * _MU  # wrapping u32 product
    m0 = m & _MASK16
    m1 = m >> 16
    # m*P = m + 2^16*(m0*0x7800) + 2^32*(m1*0x7800)
    x = m0 * _P_HI16
    lo2 = m + (x << 16)
    carry2 = (lo2 < m).astype(_U32)
    hi2 = m1 * _P_HI16 + (x >> 16) + carry2
    u = hi + hi2 + (lo != 0).astype(_U32)
    return jnp.where(u >= _P, u - _P, u)


# ---------------------------------------------------------------------------
# Base field (Montgomery-form uint32 arrays)
# ---------------------------------------------------------------------------


def fp_add(a, b):
    s = a + b
    return jnp.where(s >= _P, s - _P, s)


def fp_sub(a, b):
    d = a - b  # wraps when a < b
    return jnp.where(a >= b, d, d + _P)


def fp_neg(a):
    return jnp.where(a == 0, a, _P - a)


def fp_mul(a, b):
    hi, lo = _mul_wide(a, b)
    return _redc(hi, lo)


def fp_square(a):
    return fp_mul(a, a)


def fp_pow(a, e: int):
    """a**e with a host-known exponent (builds a fixed square-and-multiply chain)."""
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else fp_mul(acc, base)
        e >>= 1
        if e:
            base = fp_mul(base, base)
    if acc is None:
        return jnp.full_like(a, jnp.uint32(MONT_ONE))
    return acc


def fp_inv(a):
    """Elementwise inverse via a^(p-2): fully parallel (no scan), ideal on TPU."""
    return fp_pow(a, P - 2)


def to_mont(a):
    """Canonical uint32 array → Montgomery form."""
    hi, lo = _mul_wide(jnp.asarray(a, _U32), jnp.uint32(R2_MOD_P))
    return _redc(hi, lo)


def from_mont(a):
    """Montgomery form → canonical uint32 array."""
    return _redc(jnp.zeros_like(a), a)


def fp_const(v: int):
    """Host canonical int → 0-d Montgomery uint32 constant."""
    return jnp.uint32((v % P) * R_MOD_P % P)


def np_to_mont(a: np.ndarray) -> np.ndarray:
    """Host-side canonical → Montgomery (numpy, via object ints for exactness)."""
    flat = a.astype(np.uint64).reshape(-1)
    out = (flat * np.uint64(R_MOD_P)) % np.uint64(P)
    return out.astype(np.uint32).reshape(a.shape)


def np_from_mont(a: np.ndarray) -> np.ndarray:
    rinv = pow(R_MOD_P, P - 2, P)
    flat = a.astype(np.uint64).reshape(-1)
    out = (flat * np.uint64(rinv)) % np.uint64(P)
    return out.astype(np.uint32).reshape(a.shape)


_from_mont_jit = None


def fetch_canonical(a_dev) -> np.ndarray:
    """Montgomery DEVICE array → canonical numpy: the de-Montgomery runs as
    a jitted device kernel (vectorized REDC) and the fetch transfers the
    canonical values — replaces np_from_mont(np.asarray(x)) on hot paths
    (per-layer FRI fetches, LDE commit fetches), where the host u64 numpy
    conversion was the bottleneck."""
    global _from_mont_jit
    if _from_mont_jit is None:
        import jax

        _from_mont_jit = jax.jit(from_mont)
    return np.asarray(_from_mont_jit(a_dev))


# ---------------------------------------------------------------------------
# Quartic extension (..., 4) arrays, x^4 = W
# ---------------------------------------------------------------------------


def ef_add(a, b):
    return fp_add(a, b)


def ef_sub(a, b):
    return fp_sub(a, b)


def ef_neg(a):
    return fp_neg(a)


def ef_mul(a, b):
    """(..., 4) x (..., 4) binomial-extension product."""
    a0, a1, a2, a3 = (a[..., i] for i in range(4))
    b0, b1, b2, b3 = (b[..., i] for i in range(4))
    w = jnp.uint32(MONT_W)

    def m(x, y):
        return fp_mul(x, y)

    c0 = fp_add(m(a0, b0), m(w, fp_add(fp_add(m(a1, b3), m(a2, b2)), m(a3, b1))))
    c1 = fp_add(fp_add(m(a0, b1), m(a1, b0)), m(w, fp_add(m(a2, b3), m(a3, b2))))
    c2 = fp_add(fp_add(m(a0, b2), m(a1, b1)), fp_add(m(a2, b0), m(w, m(a3, b3))))
    c3 = fp_add(fp_add(m(a0, b3), m(a1, b2)), fp_add(m(a2, b1), m(a3, b0)))
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def ef_mul_base(a, b):
    """(..., 4) ext times (...,) base broadcast product."""
    return fp_mul(a, b[..., None])


def ef_add_base(a, b):
    """Add a base element into coefficient 0."""
    return a.at[..., 0].set(fp_add(a[..., 0], b))


def ef_square(a):
    return ef_mul(a, a)


def ef_pow(a, e: int):
    acc = None
    base = a
    while e:
        if e & 1:
            acc = base if acc is None else ef_mul(acc, base)
        e >>= 1
        if e:
            base = ef_mul(base, base)
    if acc is None:
        return ef_one_like(a)
    return acc


def ef_one_like(a):
    out = jnp.zeros_like(a)
    return out.at[..., 0].set(jnp.uint32(MONT_ONE))


@functools.lru_cache(maxsize=32)
def _root4_pows_mont():
    from .constants import ROOT4

    return [pow(ROOT4, k, P) * R_MOD_P % P for k in range(4)]


def ef_inv(a):
    """Inverse via Galois conjugates: inv(a) = prod_conj / Norm (one base inv)."""
    r = _root4_pows_mont()

    def conj(x, k):
        coeffs = [
            fp_mul(x[..., j], jnp.uint32(r[(j * k) % 4]))
            for j in range(4)
        ]
        return jnp.stack(coeffs, axis=-1)

    prod = ef_mul(ef_mul(conj(a, 1), conj(a, 2)), conj(a, 3))
    norm = ef_mul(a, prod)[..., 0]  # norm lands in the base field
    ninv = fp_inv(norm)
    return ef_mul_base(prod, ninv)


def ef_const(ef) -> jnp.ndarray:
    """Host EF4 scalar → (4,) Montgomery uint32 constant array."""
    vals = np.array(ef.as_u32_vec(), dtype=np.uint32)
    return jnp.asarray(np_to_mont(vals))


def ef_from_base(a):
    """(...,) base field → (..., 4) extension with zero high coefficients."""
    zeros = jnp.zeros_like(a)
    return jnp.stack([a, zeros, zeros, zeros], axis=-1)
