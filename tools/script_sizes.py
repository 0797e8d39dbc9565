"""Regenerate the SCRIPT_SIZES.md table rows.

Proves the Fibonacci AIR at the reference's published configurations
(/root/reference/README.md:94-100) and reports the emitted Bitcoin-script
verifier segment sizes. "comparable" = FRI query scripts + trace-constraint
script + quotient script (the segments the reference's totals cover); the
challenger segment is reported separately (see SCRIPT_SIZES.md preamble).

Usage: python tools/script_sizes.py [log_n:log_blowup:nq ...]
  default: 3:2:28 3:2:16 3:4:16 4:2:16 5:2:16
  the BASELINE 2^10/2^11 rows: 10:2:16 11:2:16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row(log_n: int, log_blowup: int, nq: int, log_final: int = 0) -> dict:
    from tapstark.airs import FibonacciAir, generate_fibonacci_trace
    from tapstark.challenger import BfChallenger
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.field import F
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove
    from tapstark.stark.script_verifier import generate_script_verifier

    fri_cfg = FriConfig(
        log_blowup=log_blowup,
        num_queries=nq,
        proof_of_work_bits=8,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
        log_final_poly_len=log_final,
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri_cfg)
    trace = generate_fibonacci_trace(0, 1, 1 << log_n)
    pis = [F(0), F(1), F(int(trace[-1, 1]))]
    air = FibonacciAir()
    proof = prove(pcs, air, BfChallenger(), trace, pis)
    t0 = time.perf_counter()
    report = generate_script_verifier(pcs, air, BfChallenger(), proof, pis)
    gen_s = time.perf_counter() - t0

    seg = report.segment_script_bytes
    fri_q = [v for k, v in seg.items() if "fri-pcs-verify" in k]
    constraints = seg["trace-constraints"]
    quotient = seg["compute-quotient"]
    challenger = seg["challenger"]
    # table convention (matches the reference README's "28 x 428 KB"):
    # nq * avg-per-query, even when coinciding query indices dedupe segments
    avg_q = sum(fri_q) / len(fri_q)
    comparable = nq * avg_q + constraints + quotient
    return {
        "config": f"2^{log_n} rows, blowup 2^{log_blowup}, {nq} q"
        + (f", final-poly 2^{log_final}" if log_final else ""),
        "comparable_total_kb": round(comparable / 1024),
        "distinct_query_segments": len(fri_q),
        "fri_per_query_kb": round(sum(fri_q) / len(fri_q) / 1024),
        "constraints_kb": round(constraints / 1024),
        "quotient_kb": round(quotient / 1024),
        "u32": report.distinct_u32_count,
        "challenger_kb": round(challenger / 1024),
        "challenger_compressions": report.challenger_compressions,
        "gen_s": round(gen_s, 1),
    }


def wide_row(log_n: int, log_blowup: int, nq: int, cols: int) -> dict:
    """The BASELINE "recursive RISC0-style wide table" shape
    (/root/reference/README.md:101: 2^18 rows x 163 cols, blowup 2^4, 16
    queries, 129.44 MB estimated). The reference row is an ESTIMATE — their
    single-tree leaves exceed Bitcoin's 1000-element stack limit at 163
    columns; our column-sharded commitment emits and EXECUTES the verifier.
    The constraint segment is not circuit-comparable (WideAir's degree-2
    coupling stands in for the real RISC0 recursive constraint set); the
    FRI query / u32 / challenger numbers are shape-comparable."""
    from tapstark.airs.wide import WideAir, generate_wide_trace
    from tapstark.challenger import BfChallenger
    from tapstark.commit import BcManager, TapTreeMmcs
    from tapstark.field import F
    from tapstark.fri import FriConfig, TwoAdicFriPcs
    from tapstark.stark import prove
    from tapstark.stark.script_verifier import generate_script_verifier
    from tapstark.utils import profiling

    fri_cfg = FriConfig(
        log_blowup=log_blowup,
        num_queries=nq,
        proof_of_work_bits=8,
        mmcs=TapTreeMmcs(BcManager(), nq, ext=True),
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri_cfg)
    trace, pis = generate_wide_trace(cols, 1 << log_n)
    pis_f = [F(x) for x in pis]
    air = WideAir(cols)
    profiling.enable()
    profiling.reset()
    t0 = time.perf_counter()
    proof = prove(pcs, air, BfChallenger(), trace, pis_f)
    prove_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    report = generate_script_verifier(pcs, air, BfChallenger(), proof, pis_f)
    gen_s = time.perf_counter() - t0

    seg = report.segment_script_bytes
    fri_total = sum(v for k, v in seg.items() if "fri-pcs-verify" in k)
    avg_q = fri_total / nq  # includes each query's spilled ro-part scripts
    constraints = sum(v for k, v in seg.items() if "trace-constraints" in k)
    comparable = fri_total + constraints + seg["compute-quotient"]
    return {
        "config": f"wide 2^{log_n} rows x {cols} cols, blowup 2^{log_blowup}, {nq} q",
        "comparable_total_kb": round(comparable / 1024),
        "fri_per_query_kb": round(avg_q / 1024),
        "constraints_kb": round(constraints / 1024),
        "quotient_kb": round(seg["compute-quotient"] / 1024),
        "u32": report.distinct_u32_count,
        "challenger_kb": round(seg["challenger"] / 1024),
        "challenger_compressions": report.challenger_compressions,
        "prove_s": round(prove_s, 1),
        "gen_s": round(gen_s, 1),
        "phases": {
            k: round(v["total_s"], 2) for k, v in profiling.report().items()
        },
    }


def main() -> None:
    import jax

    # Script generation/execution is host work, but the prove that feeds it
    # benefits from the device-commit path: TAPSTARK_BENCH_TPU=1 keeps the
    # configured accelerator (same opt-in as bench_prover.py).
    if os.environ.get("TAPSTARK_BENCH_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")

    configs = sys.argv[1:] or ["3:2:28", "3:2:16", "3:4:16", "4:2:16", "5:2:16"]
    for c in configs:
        if c.startswith("wide:"):
            log_n, log_blowup, nq, cols = (int(x) for x in c.split(":")[1:])
            print(json.dumps(wide_row(log_n, log_blowup, nq, cols)), flush=True)
            continue
        parts = [int(x) for x in c.split(":")]
        print(json.dumps(row(*parts)), flush=True)


if __name__ == "__main__":
    main()
