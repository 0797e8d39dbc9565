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

    def blowup(self) -> int:
        return 1 << self.log_blowup
