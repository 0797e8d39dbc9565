"""End-to-end prover throughput bench (steady state).

Proves the Fibonacci AIR repeatedly at a given size (first iteration pays
jit compiles; steady state measures the real pipeline: LDE commits + taptree
builds + quotient + FRI + openings). Prints one JSON line per size with a
phase breakdown.

The north-star row (BASELINE config 3) is `python bench_prover.py 20:2:28`:
2^20 rows, blowup 2^2, 28 query repetitions, EF4 sampling, 8 PoW bits — the
full prove() call stack of /root/reference/uni-stark/src/prover.rs:25-194.

Usage: python bench_prover.py [log_n[:log_blowup[:num_queries]] ...]
  default: 11 14  (log_blowup 1, 16 queries)
Env: TAPSTARK_BENCH_TPU=1 to run device work on the axon TPU (default CPU:
the remote relay's per-call latency is not representative of a local chip);
TAPSTARK_BENCH_COLD=1 to skip the warm-up prove (measures first-call too).
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

    configs = []
    for a in sys.argv[1:] or ["11", "14"]:
        parts = a.split(":")
        log_n = int(parts[0])
        log_blowup = int(parts[1]) if len(parts) > 1 else 1
        nq = int(parts[2]) if len(parts) > 2 else 16
        configs.append((log_n, log_blowup, nq))

    for log_n, log_blowup, num_queries in configs:
        def mk():
            fri = FriConfig(
                log_blowup=log_blowup,
                num_queries=num_queries,
                proof_of_work_bits=8,
                mmcs=TapTreeMmcs(BcManager(), num_queries, ext=True),
            )
            return TwoAdicFriPcs(
                TapTreeMmcs(BcManager(), num_queries, ext=False), fri
            )

        trace = generate_fibonacci_trace(0, 1, 1 << log_n)
        pis = [F(0), F(1), F(int(trace[-1, 1]))]
        if os.environ.get("TAPSTARK_BENCH_COLD") != "1":
            prove(mk(), FibonacciAir(), BfChallenger(), trace, pis)  # warm compiles

        # Headline wall-clock: UNPROFILED prove (profiling spans force
        # per-shard device syncs that serialize async dispatch — on the
        # remote relay that costs whole seconds). Phases come from a
        # separate profiled prove and are labeled approximate: forced syncs
        # make each span absorb upstream async work.
        t0 = time.perf_counter()
        proof = prove(mk(), FibonacciAir(), BfChallenger(), trace, pis)
        dt = time.perf_counter() - t0
        verify(mk(), FibonacciAir(), BfChallenger(), proof, pis)

        profiling.enable()
        profiling.reset()
        t0 = time.perf_counter()
        prove(mk(), FibonacciAir(), BfChallenger(), trace, pis)
        profiled_dt = time.perf_counter() - t0
        phases = {
            k: round(v["total_s"], 3) for k, v in profiling.report().items()
        }
        profiling.enable(False)
        print(
            json.dumps(
                {
                    "metric": f"fib prover wall-clock (2^{log_n} rows, blowup 2^{log_blowup}, {num_queries} queries, steady state)",
                    "value": dt,
                    "unit": "s",
                    "rows_per_s": round((1 << log_n) / dt, 1),
                    "profiled_wall_s": round(profiled_dt, 3),
                    "phases_approx": phases,
                    "backend": jax.default_backend(),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
