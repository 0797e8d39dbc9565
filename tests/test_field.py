"""Field layer tests: host scalars (exact) and device Montgomery kernels.

Mirrors the reference test tiers (SURVEY.md §4): kernel unit tests against
exact reference values.
"""

import numpy as np
import pytest

from tapstark.field import EF4, F, P, batch_inverse_scalar, two_adic_generator
from tapstark.field import device as dev
from tapstark.field.constants import EXT_W


def test_scalar_basics():
    a = F(123456789)
    b = F(987654321)
    assert (a + b).v == (123456789 + 987654321) % P
    assert (a - b).v == (123456789 - 987654321) % P
    assert (a * b).v == (123456789 * 987654321) % P
    assert (a * a.inverse()).v == 1
    assert F(0).v == 0
    assert (-a).v == P - 123456789


def test_two_adic_generators():
    for k in range(0, 28):
        g = two_adic_generator(k)
        assert pow(g, 1 << k, P) == 1
        if k > 0:
            assert pow(g, 1 << (k - 1), P) != 1


def test_subgroup_reference_semantics():
    # reference basic/src/field/mod.rs:70-85: generator^4 == 1 for bits=2,
    # and p - subgroup[0] == subgroup[2].
    g = F.two_adic_generator(2)
    assert (g * g * g * g) == F.one()
    sub = [F.one()]
    acc = g
    for _ in range(3):
        sub.append(acc)
        acc = acc * g
    assert F.from_wrapped_u32(P) - sub[0] == sub[2]


def test_ef4_mul_against_poly_model():
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = EF4(list(rng.integers(0, P, 4)))
        b = EF4(list(rng.integers(0, P, 4)))
        # schoolbook polynomial product mod (x^4 - W)
        prod = [0] * 7
        for i in range(4):
            for j in range(4):
                prod[i + j] += a.c[i] * b.c[j]
        red = [(prod[k] + EXT_W * prod[k + 4]) % P for k in range(3)]
        red.append(prod[3] % P)
        assert (a * b).c == tuple(red)


def test_ef4_inverse():
    rng = np.random.default_rng(1)
    for _ in range(20):
        a = EF4(list(rng.integers(1, P, 4)))
        assert a * a.inverse() == EF4.one()
    # base-embedded element
    b = EF4((12345, 0, 0, 0))
    assert b * b.inverse() == EF4.one()
    with pytest.raises(ZeroDivisionError):
        EF4.zero().inverse()


def test_batch_inverse_scalar():
    rng = np.random.default_rng(2)
    xs = [F(int(v)) for v in rng.integers(1, P, 20)]
    invs = batch_inverse_scalar(xs)
    for x, ix in zip(xs, invs):
        assert (x * ix).v == 1


def test_device_base_field_vs_scalar():
    rng = np.random.default_rng(3)
    a = rng.integers(0, P, 4096).astype(np.uint32)
    b = rng.integers(0, P, 4096).astype(np.uint32)
    am, bm = dev.to_mont(a), dev.to_mont(b)

    got_mul = np.asarray(dev.from_mont(dev.fp_mul(am, bm)))
    want_mul = (a.astype(np.uint64) * b.astype(np.uint64) % P).astype(np.uint32)
    np.testing.assert_array_equal(got_mul, want_mul)

    got_add = np.asarray(dev.from_mont(dev.fp_add(am, bm)))
    np.testing.assert_array_equal(
        got_add, ((a.astype(np.uint64) + b) % P).astype(np.uint32)
    )

    got_sub = np.asarray(dev.from_mont(dev.fp_sub(am, bm)))
    np.testing.assert_array_equal(
        got_sub, ((a.astype(np.int64) - b + P) % P).astype(np.uint32)
    )

    got_neg = np.asarray(dev.from_mont(dev.fp_neg(am)))
    np.testing.assert_array_equal(got_neg, ((P - a.astype(np.int64)) % P).astype(np.uint32))


def test_device_mont_roundtrip_and_edges():
    edge = np.array([0, 1, 2, P - 1, P - 2, 0x7FFFFFFF % P], dtype=np.uint32)
    m = dev.to_mont(edge)
    np.testing.assert_array_equal(np.asarray(dev.from_mont(m)), edge)
    # numpy host mirror agrees
    np.testing.assert_array_equal(dev.np_from_mont(dev.np_to_mont(edge)), edge)
    np.testing.assert_array_equal(np.asarray(m), dev.np_to_mont(edge))


def test_device_inverse_and_pow():
    rng = np.random.default_rng(4)
    a = rng.integers(1, P, 512).astype(np.uint32)
    am = dev.to_mont(a)
    inv = np.asarray(dev.from_mont(dev.fp_inv(am)))
    want = np.array([pow(int(x), P - 2, P) for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(inv, want)

    p5 = np.asarray(dev.from_mont(dev.fp_pow(am, 5)))
    want5 = np.array([pow(int(x), 5, P) for x in a], dtype=np.uint32)
    np.testing.assert_array_equal(p5, want5)

    p0 = np.asarray(dev.from_mont(dev.fp_pow(am, 0)))
    np.testing.assert_array_equal(p0, np.ones_like(a))


def test_device_ext_field_vs_scalar():
    rng = np.random.default_rng(5)
    n = 256
    a = rng.integers(0, P, (n, 4)).astype(np.uint32)
    b = rng.integers(0, P, (n, 4)).astype(np.uint32)
    am, bm = dev.to_mont(a), dev.to_mont(b)

    got = np.asarray(dev.from_mont(dev.ef_mul(am, bm)))
    for i in range(n):
        want = (EF4(list(a[i])) * EF4(list(b[i]))).c
        assert tuple(got[i]) == want, i

    got_inv = np.asarray(dev.from_mont(dev.ef_inv(am)))
    for i in range(n):
        want = EF4(list(a[i])).inverse().c
        assert tuple(got_inv[i]) == want, i

    base = rng.integers(0, P, n).astype(np.uint32)
    got_mb = np.asarray(dev.from_mont(dev.ef_mul_base(am, dev.to_mont(base))))
    for i in range(n):
        want = (EF4(list(a[i])) * F(int(base[i]))).c
        assert tuple(got_mb[i]) == want, i


def test_device_ef_const_and_pow():
    e = EF4((1, 2, 3, 4))
    c = dev.ef_const(e)
    got = np.asarray(dev.from_mont(dev.ef_pow(c, 7)))
    assert tuple(got) == e.exp(7).c


def test_fetch_canonical_matches_host_conversion():
    import jax.numpy as jnp

    from tapstark.field.device import fetch_canonical, np_from_mont

    rng = np.random.default_rng(3)
    x = rng.integers(0, P, (257, 4)).astype(np.uint32)
    dev = jnp.asarray(x)
    assert (fetch_canonical(dev) == np_from_mont(x)).all()
