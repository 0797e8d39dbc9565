"""FRI configuration (reference parity: fri/src/config.rs)."""

from __future__ import annotations

from dataclasses import dataclass

from ..commit.mmcs import TapTreeMmcs


@dataclass
class FriConfig:
    log_blowup: int
    num_queries: int
    proof_of_work_bits: int
    mmcs: TapTreeMmcs  # extension-field mmcs for commit-phase layers
    # Early-stopping FRI: fold only until the layer holds a degree-<2^L
    # polynomial (L = log_final_poly_len) instead of a constant. Every
    # skipped layer removes a whole commit round (per-repetition tree
    # builds, 8 root words per rep from the transcript, one beta) and each
    # query's fold step + sibling commitment at that layer, at the cost of
    # an in-script Horner evaluation of the 2^L final coefficients. The
    # reference folds to a constant (fri/src/prover.rs:92-141); 0 keeps
    # that behavior (and the round-1 golden proof bytes) exactly.
    log_final_poly_len: int = 0

    def blowup(self) -> int:
        return 1 << self.log_blowup

    def final_poly_len(self) -> int:
        return 1 << self.log_final_poly_len
