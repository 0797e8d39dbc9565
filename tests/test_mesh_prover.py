"""End-to-end proving with a mesh-backed PCS: the distributed LDE path must
produce byte-identical commitments/transcripts to the single-device prover
(determinism check), and the proof verifies."""

import jax
import numpy as np
from jax.sharding import Mesh

from tapstark.airs import FibonacciAir, generate_fibonacci_trace
from tapstark.challenger import BfChallenger
from tapstark.commit import BcManager, TapTreeMmcs
from tapstark.field import F
from tapstark.fri import FriConfig, TwoAdicFriPcs
from tapstark.mesh.ntt import AXIS
from tapstark.stark import prove, verify
from tapstark.stark.serde import proof_to_bytes


def _mk(mesh=None):
    nq = 4
    fri = FriConfig(
        log_blowup=1,
        num_queries=nq,
        proof_of_work_bits=4,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    return TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri, mesh=mesh)


def test_mesh_prover_matches_single_device():
    # 2^12 rows / 4 queries: per-device shards are nontrivial (the
    # four-step all_to_all decomposition actually splits work) and every
    # query walks a real multi-level tree
    mesh = Mesh(np.array(jax.devices()), (AXIS,))
    trace = generate_fibonacci_trace(0, 1, 1 << 12)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]

    proof_single = prove(_mk(), FibonacciAir(), BfChallenger(), trace, pis)
    proof_mesh = prove(_mk(mesh), FibonacciAir(), BfChallenger(), trace, pis)

    # identical transcripts -> byte-identical proofs
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_single)

    verify(_mk(), FibonacciAir(), BfChallenger(), proof_mesh, pis)
