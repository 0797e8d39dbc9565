"""TCS — the taptree commitment scheme over polynomial evaluation matrices.

Behavioral port of /root/reference/basic/src/tcs/mod.rs:

- `padding_matrix` interleaves all matrices' rows into per-evaluation-point
  leaves: matrices sorted by descending height; a row of a height-2^k matrix
  is replicated into the 2^(log_max - k) leaves it covers (mod.rs:339-378).
- Each leaf is a Tapscript that verifies Winternitz signatures for
  (query index, every evaluation limb) and checks them against the values
  embedded as constants (CommitedLeaf::generate_script, mod.rs:197-226).
- A commitment is the taptree root; `commit_poly_with_query_times` commits
  `num_queries` independent trees with FRESH bit-commitment assignments
  (one-time-signature hygiene per query repetition, mod.rs:284-292).
- verify = taptree inclusion + executing the leaf script with the
  signature witness (mod.rs:140-144, 423-434).

Matrices are numpy arrays of CANONICAL u32 limbs: base field (h, w),
extension field (h, w, 4). Device (Montgomery) arrays are converted at this
boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..script import opcodes as op
from ..script.builder import ScriptBuilder, push_int
from ..utils import log2_ceil
from .bitcomm import (
    COMMIT_TYPE_U128,
    COMMIT_TYPE_U32,
    BcManager,
    BitCommitment,
)
from .taptree import CompleteTaptree, LeafNode, build_taptree, verify_inclusion


@dataclass
class FMatrix:
    """Canonical-u32 matrix: (h, w) base or (h, w, 4) extension."""

    values: np.ndarray

    @property
    def ext(self) -> bool:
        return self.values.ndim == 3

    @property
    def height(self) -> int:
        return int(self.values.shape[0])

    @property
    def width(self) -> int:
        return int(self.values.shape[1])

    def row_limbs(self, r: int) -> list[list[int]]:
        """Row as a list of per-value limb lists."""
        if self.ext:
            return [[int(x) for x in self.values[r, j]] for j in range(self.width)]
        return [[int(self.values[r, j])] for j in range(self.width)]


@dataclass
class UseBComm:
    index_bc: BitCommitment
    evaluations_bc: list[BitCommitment]


@dataclass
class CommitedProof:
    leaf: LeafNode
    use_bcs: UseBComm
    query_index: int


@dataclass
class CommitedData:
    leaves: list[FMatrix]
    commit_taptree: CompleteTaptree
    use_bcs: UseBComm
    leaf_values: list[list[list[int]]]  # leaf -> value -> limbs

    def get_max_height(self) -> int:
        return max(m.height for m in self.leaves)

    def query_proof(self, query_index: int) -> CommitedProof:
        return CommitedProof(
            leaf=self.commit_taptree.get_tapleaf(query_index),
            use_bcs=self.use_bcs,
            query_index=query_index,
        )


def padding_matrix(matrices: list[FMatrix]) -> list[list[list[int]]]:
    """Per-leaf interleaved values (leaf -> value -> limbs), reference
    semantics (mod.rs:339-378)."""
    largest_first = sorted(matrices, key=lambda m: -m.height)
    max_height = largest_first[0].height
    log_max = log2_ceil(max_height) if max_height > 1 else 0
    leaf_ys: list[list[list[int]]] = [[] for _ in range(max_height)]
    for m in largest_first:
        log_h = log2_ceil(m.height) if m.height > 1 else 0
        rep = log_max - log_h
        for index in range(m.height):
            row = m.row_limbs(index)
            lo = index << rep
            hi = (index + 1) << rep
            for limbs in row:
                for leaf_index in range(lo, hi):
                    leaf_ys[leaf_index].append(limbs)
    first_width = len(leaf_ys[0])
    assert all(len(ys) == first_width for ys in leaf_ys)
    return leaf_ys


def _leaf_script(
    index_lock: bytes, eval_locks: list[bytes], index: int, values: list[list[int]]
) -> bytes:
    """Assemble one leaf script from precomputed locking-script bytes
    (pubkeys are shared across leaves; only the embedded constants differ)."""
    parts = [index_lock, push_int(index), bytes([op.OP_EQUALVERIFY])]
    for lock, limbs in zip(eval_locks, values):
        parts.append(lock)
        for v in reversed(limbs):
            parts.append(push_int(v))
            parts.append(bytes([op.OP_EQUALVERIFY]))
    parts.append(bytes([op.OP_1]))
    return b"".join(parts)


def _leaf_witness(use_bcs: UseBComm, index: int, values: list[list[int]]) -> list[bytes]:
    """Witness: evaluation signatures in reverse bc order, then the index
    signature on top (mod.rs:173-182)."""
    out: list[bytes] = []
    for bc, limbs in zip(reversed(use_bcs.evaluations_bc), reversed(values)):
        bc.set_values(list(limbs))
        out.extend(bc.witness())
    use_bcs.index_bc.set_values([index])
    out.extend(use_bcs.index_bc.witness())
    return out


class TCS:
    def __init__(self, manager: BcManager):
        self.manager = manager

    def commit_polys(self, matrices: list[FMatrix]) -> CommitedData:
        ext = matrices[0].ext
        commit_type = COMMIT_TYPE_U128 if ext else COMMIT_TYPE_U32
        leaf_ys = padding_matrix(matrices)
        first_width = len(leaf_ys[0])

        index_bc = self.manager.assign_bc(COMMIT_TYPE_U32)
        evaluations_bc = [self.manager.assign_bc(commit_type) for _ in range(first_width)]
        use_bcs = UseBComm(index_bc=index_bc, evaluations_bc=evaluations_bc)

        index_lock = index_bc.locking_script().build()
        eval_locks = [bc.locking_script().build() for bc in evaluations_bc]
        scripts = [
            _leaf_script(index_lock, eval_locks, i, leaf_ys[i])
            for i in range(len(leaf_ys))
        ]
        tree = build_taptree(scripts)
        return CommitedData(
            leaves=matrices, commit_taptree=tree, use_bcs=use_bcs, leaf_values=leaf_ys
        )

    def commit_poly_with_query_times(
        self, matrices: list[FMatrix], total_query_times: int
    ) -> list[CommitedData]:
        return [self.commit_polys(matrices) for _ in range(total_query_times)]

    def open_with_one_query(
        self, query_times_index: int, query_index: int, prover_data: list[CommitedData]
    ) -> tuple[CommitedProof, list[list[int]]]:
        data = prover_data[query_times_index]
        return data.query_proof(query_index), data.leaf_values[query_index]

    @staticmethod
    def verify(root_hash: bytes, proof: CommitedProof, opening_limbs: list[list[int]]) -> bool:
        witness = _leaf_witness(proof.use_bcs, proof.query_index, opening_limbs)
        if not verify_inclusion(root_hash, proof.leaf):
            return False
        from ..script.interpreter import execute_script

        return execute_script(proof.leaf.script, witness).success
