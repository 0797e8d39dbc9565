"""Pallas four-step NTT vs the jnp reference kernels (interpret mode on CPU,
compiled on TPU)."""

import jax.numpy as jnp
import numpy as np

from tapstark.field import F, P
from tapstark.field.device import np_from_mont, to_mont
from tapstark.poly.ntt import coset_lde_batch, intt, ntt
from tapstark.poly.pallas_ntt import coset_lde_batch_pallas, ntt_pallas


def test_pallas_ntt_matches_jnp():
    rng = np.random.default_rng(0)
    for log_n in (2, 5, 8, 11):
        n = 1 << log_n
        x = to_mont(rng.integers(0, P, (n, 3)).astype(np.uint32))
        np.testing.assert_array_equal(
            np_from_mont(np.asarray(ntt_pallas(x))),
            np_from_mont(np.asarray(ntt(x))),
            err_msg=f"fwd log_n={log_n}",
        )
        np.testing.assert_array_equal(
            np_from_mont(np.asarray(ntt_pallas(x, inverse=True))),
            np_from_mont(np.asarray(intt(x))),
            err_msg=f"inv log_n={log_n}",
        )


def test_pallas_coset_lde_matches_jnp():
    rng = np.random.default_rng(1)
    x = to_mont(rng.integers(0, P, (256, 2)).astype(np.uint32))
    np.testing.assert_array_equal(
        np_from_mont(np.asarray(coset_lde_batch_pallas(x, 2, F.generator().v))),
        np_from_mont(np.asarray(coset_lde_batch(x, 2, F.generator().v))),
    )


def test_pallas_nogather_lde_matches_jnp():
    from tapstark.poly.pallas_ntt import coset_lde_batch_pallas_nogather

    rng = np.random.default_rng(2)
    for log_n, lb in ((5, 1), (8, 2), (9, 2)):  # 9: odd four-step split
        x = to_mont(rng.integers(0, P, (1 << log_n, 3)).astype(np.uint32))
        np.testing.assert_array_equal(
            np_from_mont(
                np.asarray(coset_lde_batch_pallas_nogather(x, lb, F.generator().v))
            ),
            np_from_mont(np.asarray(coset_lde_batch(x, lb, F.generator().v))),
            err_msg=f"log_n={log_n}",
        )


def test_pallas_block_lde_matches_jnp():
    """The TPU-default LDE: blowup folded into the NTT batch width."""
    from tapstark.poly.pallas_ntt import coset_lde_batch_pallas_blocks

    rng = np.random.default_rng(3)
    for log_n, lb, w in ((3, 2, 1), (5, 1, 5), (8, 2, 3), (9, 3, 2)):
        x = to_mont(rng.integers(0, P, (1 << log_n, w)).astype(np.uint32))
        np.testing.assert_array_equal(
            np_from_mont(
                np.asarray(coset_lde_batch_pallas_blocks(x, lb, F.generator().v))
            ),
            np_from_mont(np.asarray(coset_lde_batch(x, lb, F.generator().v))),
            err_msg=f"log_n={log_n} lb={lb} w={w}",
        )


def test_matmul_ntt_exact():
    """MXU limb-matmul NTT (alternative backend): byte-equal to poly.ntt."""
    from tapstark.poly.matmul_ntt import coset_lde_batch_matmul, ntt_matmul
    from tapstark.poly.ntt import intt as intt_ref
    from tapstark.poly.ntt import ntt as ntt_ref

    rng = np.random.default_rng(5)
    for log_n in (4, 8, 9):  # 9: two recursion levels, odd split
        n, w = 1 << log_n, 2
        x = rng.integers(0, P, (n, w)).astype(np.uint32)
        xm = to_mont(x)
        np.testing.assert_array_equal(
            np_from_mont(np.asarray(ntt_ref(xm))),
            np.asarray(ntt_matmul(jnp.asarray(x))),
        )
        np.testing.assert_array_equal(
            np_from_mont(np.asarray(intt_ref(xm))),
            np.asarray(ntt_matmul(jnp.asarray(x), inverse=True)),
        )
    x = to_mont(rng.integers(0, P, (1 << 9, 3)).astype(np.uint32))
    np.testing.assert_array_equal(
        np_from_mont(np.asarray(coset_lde_batch(x, 2, F.generator().v))),
        np_from_mont(np.asarray(coset_lde_batch_matmul(x, 2, F.generator().v))),
    )


def test_matmul_fused_twiddle_epilogue():
    """The fused kernel's in-epilogue twiddle path (interpret mode) matches
    unfused matmul + separate modular multiply."""
    from tapstark.field.device import fp_mul
    from tapstark.poly.matmul_ntt import (
        _outer_twiddle_rep,
        _w_matrix_limbs,
        mod_matmul,
        mod_matmul_fused,
    )

    rng = np.random.default_rng(6)
    for log_r, log_c, w in [(7, 4, 2), (6, 3, 3)]:
        b = (1 << log_c) * w
        x = jnp.asarray(rng.integers(0, P, (1 << log_r, b)).astype(np.uint32))
        tw = jnp.asarray(_outer_twiddle_rep(log_r, log_c, w, False))
        ref = fp_mul(mod_matmul(jnp.asarray(_w_matrix_limbs(log_r, False)), x), tw)
        got = mod_matmul_fused(x, log_r, False, tw=tw)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_lde_matches_jnp():
    """The two-dispatch fused LDE (in-VMEM transposes, Shoup butterflies)
    must match the jnp stage pipeline bit-exactly — both the square-tile
    (even log_n) and rectangular-tile (odd log_n) factorizations."""
    import jax.numpy as jnp

    from tapstark.field.constants import P
    from tapstark.field.device import np_from_mont, np_to_mont
    from tapstark.field.scalar import F
    from tapstark.poly.ntt import coset_lde_batch
    from tapstark.poly.pallas_ntt import coset_lde_batch_pallas_fused

    rng = np.random.default_rng(7)
    shift = F.generator().v
    for log_n, blowup, w in [(8, 2, 3), (9, 1, 2), (9, 2, 3), (10, 2, 2), (11, 2, 1)]:
        evals = jnp.asarray(
            np_to_mont(rng.integers(0, P, (1 << log_n, w)).astype(np.uint32))
        )
        a = np_from_mont(np.asarray(coset_lde_batch(evals, blowup, shift)))
        b = np_from_mont(
            np.asarray(coset_lde_batch_pallas_fused(evals, blowup, shift))
        )
        assert np.array_equal(a, b), (log_n, blowup, w)
