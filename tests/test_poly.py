"""Poly layer tests: NTT vs naive DFT, coset LDE, FRI fold identity
(mirrors reference fri/src/fold_even_odd.rs:55-96), barycentric interpolation,
domain selectors."""

import numpy as np

from tapstark.field import EF4, F, P
from tapstark.field.device import np_from_mont, np_to_mont, to_mont
from tapstark.poly import (
    TwoAdicMultiplicativeCoset,
    bit_reverse_rows,
    coset_lde_batch,
    fold_matrix,
    fold_row_scalar,
    interpolate_coset,
    interpolate_coset_host,
    intt,
    np_geom_powers,
    ntt,
)
from tapstark.utils import bitrev_indices


def naive_dft(coeffs, g, shift=1):
    """Exact evaluation of column polys at points shift*g^i."""
    n, w = coeffs.shape
    out = np.zeros((n, w), dtype=np.uint32)
    for i in range(n):
        x = pow(g, i, P) * shift % P
        for j in range(w):
            acc = 0
            xp = 1
            for k in range(n):
                acc = (acc + int(coeffs[k, j]) * xp) % P
                xp = xp * x % P
            out[i, j] = acc
    return out


def test_np_geom_powers():
    g = 12345
    got = np_geom_powers(g, 37, shift=7)
    want = [7 * pow(g, i, P) % P for i in range(37)]
    assert list(got) == want


def test_ntt_vs_naive():
    rng = np.random.default_rng(0)
    for log_n in (0, 1, 3, 5):
        n = 1 << log_n
        coeffs = rng.integers(0, P, (n, 3)).astype(np.uint32)
        g = F.two_adic_generator(log_n).v
        want = naive_dft(coeffs, g)
        got = np_from_mont(np.asarray(ntt(to_mont(coeffs))))
        np.testing.assert_array_equal(got, want)


def test_intt_roundtrip():
    rng = np.random.default_rng(1)
    n = 1 << 8
    coeffs = rng.integers(0, P, (n, 4)).astype(np.uint32)
    m = to_mont(coeffs)
    back = np_from_mont(np.asarray(intt(ntt(m))))
    np.testing.assert_array_equal(back, coeffs)


def test_coset_lde_batch():
    rng = np.random.default_rng(2)
    log_n, log_blowup = 3, 2
    n = 1 << log_n
    evals = rng.integers(0, P, (n, 2)).astype(np.uint32)
    shift = F.generator().v
    # reference semantics: interpret evals over H_n, output evals over
    # shift * H_{n<<blowup}
    coeffs = np_from_mont(np.asarray(intt(to_mont(evals))))
    big_g = F.two_adic_generator(log_n + log_blowup).v
    want = naive_dft(
        np.vstack([coeffs, np.zeros((n * 3, 2), np.uint32)]), big_g, shift
    )
    got = np_from_mont(np.asarray(coset_lde_batch(to_mont(evals), log_blowup, shift)))
    np.testing.assert_array_equal(got, want)


def test_bit_reverse_rows():
    n = 8
    mat = np.arange(n, dtype=np.uint32)[:, None]
    got = np.asarray(bit_reverse_rows(mat))[:, 0]
    np.testing.assert_array_equal(got, bitrev_indices(3))


def _ef_mat_to_mont(mat_ef):
    arr = np.array([[e.c for e in row] for row in mat_ef], dtype=np.uint32)
    return to_mont(arr)


def test_fold_matrix_vs_even_odd_identity():
    """fold(bitrev evals of p, beta) == evals of p_even + beta*p_odd
    (reference fri/src/fold_even_odd.rs test, over the extension field)."""
    rng = np.random.default_rng(3)
    log_n = 6
    n = 1 << log_n
    coeffs = [EF4(list(rng.integers(0, P, 4))) for _ in range(n)]
    g = F.two_adic_generator(log_n)

    def eval_poly(cs, x: EF4):
        acc = EF4.zero()
        for c in reversed(cs):
            acc = acc * x + c
        return acc

    evals = [eval_poly(coeffs, EF4.from_base(g.exp(i))) for i in range(n)]
    beta = EF4(list(rng.integers(0, P, 4)))
    even = coeffs[0::2]
    odd = coeffs[1::2]
    g2 = F.two_adic_generator(log_n - 1)
    want = [
        eval_poly(even, EF4.from_base(g2.exp(i)))
        + beta * eval_poly(odd, EF4.from_base(g2.exp(i)))
        for i in range(n // 2)
    ]

    # device fold takes bitrev order: rows (p(g^i), p(g^{n/2+i})) bit-reversed
    rev = bitrev_indices(log_n)
    evals_brv = [evals[int(i)] for i in rev]
    m = _ef_mat_to_mont(
        [[evals_brv[2 * i], evals_brv[2 * i + 1]] for i in range(n // 2)]
    )
    beta_mont = to_mont(np.array(beta.c, dtype=np.uint32))
    folded = np_from_mont(np.asarray(fold_matrix(beta_mont, m)))
    rev2 = bitrev_indices(log_n - 1)
    folded_nat = [EF4(list(folded[int(rev2[i])])) for i in range(n // 2)]
    assert folded_nat == want

    # fold_row_scalar agrees with the matrix kernel row by row
    for i in range(n // 2):
        e0 = evals_brv[2 * i]
        e1 = evals_brv[2 * i + 1]
        got = fold_row_scalar(i, log_n - 1, beta, e0, e1)
        assert got == EF4(list(folded[i]))


def test_fold_matrix_host_matches_device():
    """fold_matrix_host (the exact-numpy FRI host-tail fold) is the
    canonical twin of the device fold_matrix kernel on random inputs —
    direct parity, not just transitively through the prover golden test."""
    from tapstark.poly.fold import fold_matrix_host

    rng = np.random.default_rng(7)
    for log_half in (3, 6, 9):
        half = 1 << log_half
        m_canon = rng.integers(0, P, (half, 2, 4)).astype(np.uint32)
        beta = EF4(list(rng.integers(0, P, 4)))
        beta_mont = to_mont(np.array(beta.c, dtype=np.uint32))
        dev = np_from_mont(np.asarray(fold_matrix(beta_mont, np_to_mont(m_canon))))
        host = fold_matrix_host(beta, m_canon)
        np.testing.assert_array_equal(host, dev)


def test_interpolate_coset():
    rng = np.random.default_rng(4)
    log_n = 4
    n = 1 << log_n
    shift = F.generator().v
    coeffs = rng.integers(0, P, (n, 3)).astype(np.uint32)
    g = F.two_adic_generator(log_n).v
    evals = naive_dft(coeffs, g, shift)
    z = EF4(list(rng.integers(0, P, 4)))

    got = np_from_mont(np.asarray(interpolate_coset(to_mont(evals), shift, z)))
    rows = [[F(int(v)) for v in evals[i]] for i in range(n)]
    want_host = interpolate_coset_host(rows, shift, z)

    # exact expected value: evaluate each column poly at z
    for j in range(3):
        acc = EF4.zero()
        for k in range(n - 1, -1, -1):
            acc = acc * z + EF4((int(coeffs[k, j]), 0, 0, 0))
        assert EF4(list(got[j])) == acc, j
        assert want_host[j] == acc, j


def test_domain_algebra():
    d = TwoAdicMultiplicativeCoset(3, 1)
    q = d.create_disjoint_domain(1 << 5)
    assert q.log_n == 5 and q.shift == F.generator().v
    chunks = q.split_domains(4)
    assert [c.log_n for c in chunks] == [3, 3, 3, 3]
    g5 = F.two_adic_generator(5)
    assert chunks[1].shift == (F.generator() * g5).v

    # zp_at_point: vanishing on the domain
    x = EF4.from_base(F(q.shift))  # first point of q
    assert q.zp_at_point(x) == EF4.zero()

    z = EF4((5, 6, 7, 8))
    zp = q.zp_at_point(z)
    want = (z * EF4.from_base(F(q.shift).inverse())).exp(1 << 5) - EF4.one()
    assert zp == want


def test_selectors_consistency():
    """Device selectors_on_coset agree with exact selectors_at_point at each
    coset point."""
    trace = TwoAdicMultiplicativeCoset(3, 1)
    coset = TwoAdicMultiplicativeCoset(5, F.generator().v)
    sels = trace.selectors_on_coset(coset)
    m = coset.size()
    xs = np_geom_powers(coset.gen().v, m, coset.shift)
    first = np_from_mont(np.asarray(sels.is_first_row))
    last = np_from_mont(np.asarray(sels.is_last_row))
    trans = np_from_mont(np.asarray(sels.is_transition))
    invz = np_from_mont(np.asarray(sels.inv_zeroifier))
    for j in range(0, m, 7):
        pt = EF4((int(xs[j]), 0, 0, 0))
        at = trace.selectors_at_point(pt)
        assert EF4((int(first[j]), 0, 0, 0)) == at.is_first_row
        assert EF4((int(last[j]), 0, 0, 0)) == at.is_last_row
        assert EF4((int(trans[j]), 0, 0, 0)) == at.is_transition
        assert EF4((int(invz[j]), 0, 0, 0)) == at.inv_zeroifier


def test_split_evals_strided():
    d = TwoAdicMultiplicativeCoset(3, 1)
    evals = np.arange(16, dtype=np.uint32).reshape(8, 2)
    chunks = d.split_evals(2, evals)
    np.testing.assert_array_equal(chunks[0], evals[0::2])
    np.testing.assert_array_equal(chunks[1], evals[1::2])
