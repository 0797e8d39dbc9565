"""StarkConfig — convenience bundle (reference parity:
uni-stark/src/config.rs StarkConfig/StarkGenericConfig).

The prove/verify functions take the PCS directly; this wrapper mirrors the
reference's config object shape and standard construction."""

from __future__ import annotations

from dataclasses import dataclass

from ..challenger import BfChallenger
from ..commit.bitcomm import BcManager
from ..commit.mmcs import TapTreeMmcs
from ..fri.config import FriConfig
from ..fri.pcs import TwoAdicFriPcs


@dataclass
class StarkConfig:
    pcs: TwoAdicFriPcs

    def challenger(self) -> BfChallenger:
        return BfChallenger(field="ext")


def standard_config(
    log_blowup: int = 2,
    num_queries: int = 28,
    proof_of_work_bits: int = 8,
    mesh=None,
) -> StarkConfig:
    """The fib_air-shaped configuration (uni-stark/tests/fib_air.rs:117-131)."""
    fri = FriConfig(
        log_blowup=log_blowup,
        num_queries=num_queries,
        proof_of_work_bits=proof_of_work_bits,
        mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
    )
    return StarkConfig(
        pcs=TwoAdicFriPcs(
            TapTreeMmcs(BcManager(), num_queries, ext=False), fri, mesh=mesh
        )
    )
