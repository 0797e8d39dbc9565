"""Multi-chip sharding tests on the virtual 8-device CPU mesh: distributed
four-step NTT vs single-device NTT, distributed coset LDE, and the full
sharded prover step (LDE + quotient + fold + grind)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tapstark.airs import FibonacciAir
from tapstark.field import P
from tapstark.field.device import np_from_mont, to_mont
from tapstark.mesh import distributed_coset_lde, distributed_ntt, make_sharded_prover_step
from tapstark.mesh.ntt import AXIS
from tapstark.poly import coset_lde_batch, intt, ntt


def _mesh():
    devs = np.array(jax.devices())
    return Mesh(devs, (AXIS,))


def test_devices_available():
    assert len(jax.devices()) == 8


def test_distributed_ntt_matches_single_device():
    rng = np.random.default_rng(0)
    mesh = _mesh()
    for log_n in (6, 8):
        n = 1 << log_n
        x = to_mont(rng.integers(0, P, (n, 3)).astype(np.uint32))
        want = np_from_mont(np.asarray(ntt(x)))
        got = np_from_mont(np.asarray(distributed_ntt(mesh, x)))
        np.testing.assert_array_equal(got, want, err_msg=f"log_n={log_n}")


def test_distributed_intt_roundtrip():
    rng = np.random.default_rng(1)
    mesh = _mesh()
    n = 1 << 7
    x = to_mont(rng.integers(0, P, (n, 2)).astype(np.uint32))
    y = distributed_ntt(mesh, x)
    back = distributed_ntt(mesh, y, inverse=True)
    np.testing.assert_array_equal(
        np_from_mont(np.asarray(back)), np_from_mont(np.asarray(x))
    )
    want = np_from_mont(np.asarray(intt(y)))
    np.testing.assert_array_equal(np_from_mont(np.asarray(back)), want)


def test_distributed_coset_lde():
    rng = np.random.default_rng(2)
    mesh = _mesh()
    n = 1 << 6
    from tapstark.field.scalar import F

    shift = F.generator().v
    x = to_mont(rng.integers(0, P, (n, 2)).astype(np.uint32))
    want = np_from_mont(np.asarray(coset_lde_batch(x, 1, shift)))
    got = np_from_mont(np.asarray(distributed_coset_lde(mesh, x, 1, shift)))
    np.testing.assert_array_equal(got, want)


def test_sharded_prover_step_runs_and_matches():
    mesh = _mesh()
    step, args = make_sharded_prover_step(mesh, FibonacciAir(), log_n=6, log_blowup=1)
    lde, quotient, folded, winner = jax.block_until_ready(step(*args))
    n = 1 << 6
    assert lde.shape == (2 * n, 2)
    assert quotient.shape == (2 * n, 4)
    assert folded.shape == (n, 4)

    # cross-check the LDE against the single-device path
    trace = args[0]
    from tapstark.field.scalar import F

    want = np_from_mont(
        np.asarray(coset_lde_batch(jnp.asarray(trace), 1, F.generator().v))
    )
    np.testing.assert_array_equal(np_from_mont(np.asarray(lde)), want)
