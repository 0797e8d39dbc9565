"""Flagship workload bench: STARK-prove a chained Blake3 duplex sponge.

Proves Blake3SpongeChainAir over a chain of compressions (64 rows each,
1548 columns — the full compression function with the real message
schedule), i.e. the exact hashing the Fiat-Shamir challenger performs.
Prints one JSON line with wall-clock and permutations/s.

Usage: python bench_blake3.py [num_blocks] [num_queries]   (default 64 2)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import os

    import jax

    if os.environ.get("TAPSTARK_BENCH_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    from tapstark.airs.blake3_compression import (
        Blake3SpongeChainAir,
        generate_blake3_sponge_trace,
    )
    from tapstark.challenger import BfChallenger
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.field import F
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove, verify

    num_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    blocks = [
        [(b * 16 + w) & 0xFFFFFFFF for w in range(16)] for b in range(num_blocks)
    ]
    trace, pis, digest = generate_blake3_sponge_trace(blocks)
    ch = BfChallenger()
    for blk in blocks:
        ch.observe_u32s(blk)
    assert digest == ch.cv, "AIR digest must match the challenger"
    pis_f = [F(x) for x in pis]
    air = Blake3SpongeChainAir()

    def mk():
        fri = FriConfig(
            log_blowup=1,
            num_queries=nq,
            proof_of_work_bits=4,
            mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
        )
        return TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri)

    from tapstark.utils import profiling

    proof = prove(mk(), air, BfChallenger(), trace, pis_f)  # warm compiles
    verify(mk(), air, BfChallenger(), proof, pis_f)

    profiling.enable()
    profiling.reset()
    t0 = time.perf_counter()
    proof = prove(mk(), air, BfChallenger(), trace, pis_f)
    dt = time.perf_counter() - t0
    phases = {k: round(v["total_s"], 3) for k, v in profiling.report().items()}
    profiling.enable(False)
    verify(mk(), air, BfChallenger(), proof, pis_f)

    print(
        json.dumps(
            {
                "metric": f"blake3 sponge-chain prover ({num_blocks} permutations, "
                f"{trace.shape[0]}x{trace.shape[1]} trace, {nq} queries)",
                "value": round(dt, 3),
                "unit": "s",
                "permutations_per_s": round(num_blocks / dt, 2),
                "rows_per_s": round(trace.shape[0] / dt, 1),
                "phases": phases,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
