"""TapTreeMmcs — batch matrix commitment over the TCS.

Behavioral port of /root/reference/basic/src/mmcs/taptree_mmcs.rs: commitment
is one taptree root PER QUERY REPETITION ([u32;8] words each); open
interprets the query index against the tallest matrix and drops LSBs for
shorter ones; verify re-signs the opened values and executes the leaf script.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field.scalar import EF4, F
from ..utils import log2_ceil
from .bitcomm import BcManager
from .tcs import TCS, CommitedData, CommitedProof, FMatrix


def scalars_to_limbs(values) -> list[list[int]]:
    return [v.as_u32_vec() for v in values]


def fmatrix_row_scalars(m: FMatrix, r: int):
    if m.ext:
        return [EF4([int(x) for x in m.values[r, j]]) for j in range(m.width)]
    return [F(int(m.values[r, j])) for j in range(m.width)]


@dataclass
class TapTreeMmcs:
    """ext=False commits base-field matrices, ext=True extension-field ones
    (the reference's TapTreeMmcs<Val> vs TapTreeMmcs<Challenge>)."""

    manager: BcManager
    num_queries: int
    ext: bool

    def __post_init__(self):
        self.tcs = TCS(self.manager)

    def commit(self, inputs: list[FMatrix]):
        assert all(m.ext == self.ext for m in inputs)
        prover_data = self.tcs.commit_poly_with_query_times(inputs, self.num_queries)
        commitment = [d.root_words() for d in prover_data]
        return commitment, prover_data

    def commit_matrix(self, m: FMatrix):
        return self.commit([m])

    def open_batch(
        self, query_times_index: int, query_index: int, prover_data: list[CommitedData]
    ):
        data0 = prover_data[0]
        max_height = data0.get_max_height()
        log_max = log2_ceil(max_height) if max_height > 1 else 0
        openings = []
        for m in data0.leaves:
            log_h = log2_ceil(m.height) if m.height > 1 else 0
            reduced_index = query_index >> (log_max - log_h)
            openings.append(fmatrix_row_scalars(m, reduced_index))
        proof, leaf_limbs = self.tcs.open_with_one_query(
            query_times_index, query_index, prover_data
        )
        assert [l for row in openings for v in row for l in v.as_u32_vec()] == [
            l for limbs in leaf_limbs for l in limbs
        ], "matrix rows must match interleaved leaf values (pass matrices tallest-first)"
        return openings, proof

    def verify_batch(
        self,
        query_times_index: int,
        opened_values: list[list],
        proof: CommitedProof,
        roots: list[list[int]],
    ) -> bool:
        flat = [v for row in opened_values for v in row]
        limbs = scalars_to_limbs(flat)
        root_words = roots[query_times_index]
        return TCS.verify_words(root_words, proof, limbs)

    @staticmethod
    def get_matrices(prover_data: list[CommitedData]) -> list[FMatrix]:
        return prover_data[0].leaves

    @staticmethod
    def get_max_height(prover_data: list[CommitedData]) -> int:
        return prover_data[0].get_max_height()
