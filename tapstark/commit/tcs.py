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

The bulk work (leaf-script assembly, tapleaf hashing, ordered tree build)
runs in the native C++ engine (tapstark.native) when available — the role
the reference fills with native Rust — with a pure-Python fallback. Leaf
scripts are reconstructed lazily for openings.

Matrices are numpy arrays of CANONICAL u32 limbs: base field (h, w),
extension field (h, w, 4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hashes.sha256 import sha256
from ..script import opcodes as op
from ..script.builder import push_int
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


def padding_matrix_np(matrices: list[FMatrix]) -> np.ndarray:
    """(num_leaves, num_values, num_limbs) canonical u32 interleaved leaves
    (vectorized reference padding_matrix, mod.rs:339-378)."""
    largest_first = sorted(matrices, key=lambda m: -m.height)
    max_height = largest_first[0].height
    num_limbs = 4 if largest_first[0].ext else 1
    cols = []
    for m in largest_first:
        v = m.values
        if not m.ext:
            v = v[:, :, None]
        rep = max_height // m.height
        cols.append(np.repeat(v, rep, axis=0))
    return np.concatenate(cols, axis=1).astype(np.uint32)


def padding_matrix(matrices: list[FMatrix]) -> list[list[list[int]]]:
    """Reference-shaped view: leaf -> value -> limbs (tests/compat)."""
    arr = padding_matrix_np(matrices)
    return [
        [[int(x) for x in arr[i, j]] for j in range(arr.shape[1])]
        for i in range(arr.shape[0])
    ]


def _leaf_script_from_row(
    index_lock: bytes, eval_locks: list[bytes], index: int, row: np.ndarray
) -> bytes:
    """Assemble one leaf script (row: (num_values, num_limbs) canonical u32)."""
    parts = [index_lock, push_int(index), bytes([op.OP_EQUALVERIFY])]
    for lock, limbs in zip(eval_locks, row):
        parts.append(lock)
        for v in limbs[::-1]:
            parts.append(push_int(int(v)))
            parts.append(bytes([op.OP_EQUALVERIFY]))
    parts.append(bytes([op.OP_1]))
    return b"".join(parts)


class NativeTaptree:
    """Taptree built by the native engine; leaf scripts rebuilt on demand."""

    def __init__(self, leaf_hashes, root, levels, perm, script_fn):
        self._leaf_hashes = leaf_hashes
        self.root_hash = root
        # internal level hash arrays L_1..L_{depth-1}; L_0 = leaf_hashes.
        # Branch of leaf i = [L_l[(i >> l) ^ 1] for l in 0..depth-1]
        # (sibling reordering never moves the hash arrays, only perm).
        self._levels = levels
        self.leaf_indices = perm.tolist()
        self._script_fn = script_fn

    def root_words(self) -> list[int]:
        return [
            int.from_bytes(self.root_hash[4 * i : 4 * i + 4], "little")
            for i in range(8)
        ]

    def leaf_count(self) -> int:
        return len(self.leaf_indices)

    def get_tapleaf(self, logical_index: int) -> LeafNode:
        i = logical_index
        branch = [bytes(self._leaf_hashes[i ^ 1])] if self._levels or len(
            self._leaf_hashes
        ) > 1 else []
        for l, lvl_hashes in enumerate(self._levels, start=1):
            branch.append(bytes(lvl_hashes[(i >> l) ^ 1]))
        return LeafNode(
            script=self._script_fn(i),
            leaf_hash=bytes(self._leaf_hashes[i]),
            merkle_branch=branch,
        )


@dataclass
class CommitedData:
    leaves: list[FMatrix]
    commit_taptree: object  # CompleteTaptree | NativeTaptree
    use_bcs: UseBComm
    values_np: np.ndarray  # (num_leaves, num_values, num_limbs)

    def get_max_height(self) -> int:
        return max(m.height for m in self.leaves)

    def leaf_limbs(self, i: int) -> list[list[int]]:
        return [[int(x) for x in v] for v in self.values_np[i]]

    def query_proof(self, query_index: int) -> CommitedProof:
        return CommitedProof(
            leaf=self.commit_taptree.get_tapleaf(query_index),
            use_bcs=self.use_bcs,
            query_index=query_index,
        )


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

    def _assign_locks(self, num_values: int, ext: bool):
        """Deterministic (sequential) bit-commitment assignment + lock bytes."""
        commit_type = COMMIT_TYPE_U128 if ext else COMMIT_TYPE_U32
        index_bc = self.manager.assign_bc(COMMIT_TYPE_U32)
        evaluations_bc = [self.manager.assign_bc(commit_type) for _ in range(num_values)]
        use_bcs = UseBComm(index_bc=index_bc, evaluations_bc=evaluations_bc)
        index_lock = index_bc.locking_script().build()
        eval_locks = [bc.locking_script().build() for bc in evaluations_bc]
        return use_bcs, index_lock, eval_locks

    def _build(self, matrices, values_np, use_bcs, index_lock, eval_locks):
        num_leaves = values_np.shape[0]

        def script_fn(i: int) -> bytes:
            return _leaf_script_from_row(index_lock, eval_locks, i, values_np[i])

        from .. import native

        if native.get_lib() is not None:
            leaf_hashes, root, levels, perm = native.tcs_commit_native(
                index_lock,
                eval_locks,
                values_np,
                sha256(b"TapLeaf"),
                sha256(b"TapBranch"),
            )
            tree = NativeTaptree(leaf_hashes, root, levels, perm, script_fn)
        else:
            scripts = [script_fn(i) for i in range(num_leaves)]
            tree = build_taptree(scripts)
        return CommitedData(
            leaves=matrices, commit_taptree=tree, use_bcs=use_bcs, values_np=values_np
        )

    def commit_polys(self, matrices: list[FMatrix]) -> CommitedData:
        values_np = padding_matrix_np(matrices)
        args = self._assign_locks(values_np.shape[1], matrices[0].ext)
        return self._build(matrices, values_np, *args)

    def commit_poly_with_query_times(
        self, matrices: list[FMatrix], total_query_times: int
    ) -> list[CommitedData]:
        """One tree per query repetition, fresh bit commitments each
        (mod.rs:284-292). Assignment is sequential (deterministic secrets);
        the native tree builds release the GIL and run on a thread pool."""
        values_np = padding_matrix_np(matrices)
        ext = matrices[0].ext
        assignments = [
            self._assign_locks(values_np.shape[1], ext)
            for _ in range(total_query_times)
        ]
        from .. import native

        if native.get_lib() is not None and total_query_times > 1:
            import os
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                min(total_query_times, os.cpu_count() or 4)
            ) as pool:
                return list(
                    pool.map(
                        lambda a: self._build(matrices, values_np, *a), assignments
                    )
                )
        return [self._build(matrices, values_np, *a) for a in assignments]

    def open_with_one_query(
        self, query_times_index: int, query_index: int, prover_data: list[CommitedData]
    ) -> tuple[CommitedProof, list[list[int]]]:
        data = prover_data[query_times_index]
        return data.query_proof(query_index), data.leaf_limbs(query_index)

    @staticmethod
    def verify(root_hash: bytes, proof: CommitedProof, opening_limbs: list[list[int]]) -> bool:
        witness = _leaf_witness(proof.use_bcs, proof.query_index, opening_limbs)
        if not verify_inclusion(root_hash, proof.leaf):
            return False
        from ..script.interpreter import MAX_STACK, execute_script

        # Wide-trace leaves structurally exceed Bitcoin's 1000-element stack
        # limit (the reference's wide-table README rows are estimates for the
        # same reason); simulate with a relaxed limit in that regime.
        limit = max(MAX_STACK, len(witness) + 64)
        return execute_script(proof.leaf.script, witness, stack_limit=limit).success
