"""The sharded prover core step — one jitted function over a device mesh.

This is the multi-chip "training step" analog of the prover's device work
(SURVEY.md §2.3): distributed coset LDE (four-step NTTs with all_to_all over
ICI), whole-coset constraint-quotient evaluation (row-sharded; the `next`-row
rotation becomes an XLA collective permute), one FRI fold, and a sharded PoW
grind batch with a global winner reduction. Used by __graft_entry__'s
dryrun_multichip and by the scaling benches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P_

from ..field.constants import P
from ..field.device import ef_mul_base, fp_mul, np_to_mont
from ..field.scalar import F
from ..hashes.blake3 import compress_batch
from ..poly.domain import TwoAdicMultiplicativeCoset
from ..poly.fold import fold_matrix
from ..poly.powers import np_geom_powers
from ..air.folders import DExpr, ProverConstraintFolder
from .ntt import AXIS, _dist_ntt_shardmap


def make_sharded_prover_step(
    mesh: Mesh, air, log_n: int = 6, log_blowup: int = 1, grind_bits: int = 8
):
    """Returns (jitted_step, example_args). The step takes
    (trace (n, width), alpha (4,), beta (4,), grind_ws (B,), capacity (8,))
    and returns (lde, quotient, folded, grind_winner)."""
    n = 1 << log_n
    big = n << log_blowup
    width = air.width()
    num = mesh.devices.size
    log_num = int(np.log2(num))

    # four-step transforms (shard_map'd)
    log_c_small = max(log_num, log_n // 2)
    log_r_small = log_n - log_c_small
    log_nb = log_n + log_blowup
    log_c_big = max(log_num, log_nb // 2)
    log_r_big = log_nb - log_c_big
    inv_fn, inv_tw = _dist_ntt_shardmap(mesh, log_r_small, log_c_small, inverse=True)
    fwd_fn, fwd_tw = _dist_ntt_shardmap(mesh, log_r_big, log_c_big, inverse=False)

    shift = F.generator().v
    sp = jnp.asarray(np_to_mont(np_geom_powers(shift, n)))

    trace_domain = TwoAdicMultiplicativeCoset(log_n, 1)
    coset = TwoAdicMultiplicativeCoset(log_nb, shift)
    sels = trace_domain.selectors_on_coset(coset)
    next_step = 1 << log_blowup
    public_values = [F(0), F(1), F(0)]

    inv_tw_j = jnp.asarray(inv_tw)
    fwd_tw_j = jnp.asarray(fwd_tw)

    def step(trace, alpha4, beta4, grind_ws, capacity):
        # --- distributed coset LDE ---
        coeffs = inv_fn(
            trace.reshape(1 << log_r_small, 1 << log_c_small, width), inv_tw_j
        ).reshape(n, width)
        coeffs = fp_mul(coeffs, sp[:, None])
        padded = jnp.zeros((big, width), jnp.uint32).at[:n, :].set(coeffs)
        lde = fwd_fn(
            padded.reshape(1 << log_r_big, 1 << log_c_big, width), fwd_tw_j
        ).reshape(big, width)

        # --- whole-coset constraint quotient ---
        folder = ProverConstraintFolder(
            lde, next_step, public_values, sels, alpha4
        )
        air.eval(folder)
        quotient = ef_mul_base(folder.accumulator.arr, sels.inv_zeroifier)

        # --- one FRI fold ---
        folded = fold_matrix(beta4, quotient.reshape(big // 2, 2, 4))

        # --- sharded PoW grind batch (challenger v2: observe(w) compresses
        # the block [w, 0*15] with block_len 4 against the current cv) ---
        blocks = [grind_ws] + [jnp.zeros_like(grind_ws)] * 15
        cv = [jnp.broadcast_to(capacity[i], grind_ws.shape) for i in range(8)]
        out = compress_batch(jnp, blocks, block_len=4, cv=cv)
        ok = (out[7] >> jnp.uint32(32 - grind_bits)) == 0
        winner = jnp.argmax(ok)

        return lde, quotient, folded, winner

    # alpha enters the folder as a device constant expression
    def step_outer(trace, alpha4, beta4, grind_ws, capacity):
        return step(trace, alpha4, beta4, grind_ws, capacity)

    row_sharded = NamedSharding(mesh, P_(AXIS, None))
    vec_sharded = NamedSharding(mesh, P_(AXIS))
    replicated = NamedSharding(mesh, P_())
    jitted = jax.jit(
        step_outer,
        in_shardings=(row_sharded, replicated, replicated, vec_sharded, replicated),
    )

    rng = np.random.default_rng(0)
    trace = jax.device_put(
        jnp.asarray(np_to_mont(rng.integers(0, P, (n, width)).astype(np.uint32))),
        row_sharded,
    )
    alpha4 = jnp.asarray(np_to_mont(rng.integers(0, P, 4).astype(np.uint32)))
    beta4 = jnp.asarray(np_to_mont(rng.integers(0, P, 4).astype(np.uint32)))
    grind_ws = jax.device_put(
        jnp.arange(num * 128, dtype=jnp.uint32), vec_sharded
    )
    capacity = jnp.arange(8, dtype=jnp.uint32)
    return jitted, (trace, alpha4, beta4, grind_ws, capacity)
