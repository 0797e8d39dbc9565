"""End-to-end prover throughput bench (steady state).

Proves the Fibonacci AIR repeatedly at a given size (first iteration pays
jit compiles; steady state measures the real pipeline: LDE commits + taptree
builds + quotient + FRI + openings). Prints one JSON line per size with a
phase breakdown.

Usage: python bench_prover.py [log_n ...]   (default 11 14)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import os

    import jax

    # The prover interleaves host work (transcript, taptree builds) with many
    # device calls; over the remote-TPU relay every call pays tunnel latency,
    # which is not representative of a local chip. Default to local CPU;
    # opt into the TPU with TAPSTARK_BENCH_TPU=1.
    if os.environ.get("TAPSTARK_BENCH_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    from tapstark.airs import FibonacciAir, generate_fibonacci_trace
    from tapstark.challenger import BfChallenger
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.field import F
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove, verify
    from tapstark.utils import profiling

    sizes = [int(a) for a in sys.argv[1:]] or [11, 14]
    num_queries = 16
    for log_n in sizes:
        def mk():
            fri = FriConfig(
                log_blowup=1,
                num_queries=num_queries,
                proof_of_work_bits=8,
                mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
            )
            return TwoAdicFriPcs(
                TapTreeMmcs(BcManager(), num_queries, ext=False), fri
            )

        trace = generate_fibonacci_trace(0, 1, 1 << log_n)
        pis = [F(0), F(1), F(int(trace[-1, 1]))]
        prove(mk(), FibonacciAir(), BfChallenger(), trace, pis)  # warm compiles

        profiling.enable()
        profiling.reset()
        t0 = time.perf_counter()
        proof = prove(mk(), FibonacciAir(), BfChallenger(), trace, pis)
        dt = time.perf_counter() - t0
        verify(mk(), FibonacciAir(), BfChallenger(), proof, pis)
        phases = {
            k: round(v["total_s"], 3) for k, v in profiling.report().items()
        }
        profiling.enable(False)
        print(
            json.dumps(
                {
                    "metric": f"fib prover wall-clock (2^{log_n} rows, {num_queries} queries, steady state)",
                    "value": dt,
                    "unit": "s",
                    "rows_per_s": round((1 << log_n) / dt, 1),
                    "phases": phases,
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
