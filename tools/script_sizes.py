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


def _itemize_u32(proof, counted) -> dict:
    """Break distinct_u32_count down by proof-content category.

    Categories are matched by value against the proof's own data, in
    priority order (a value appearing in two categories counts toward the
    first); the residue is the spill-boundary accumulators + misc
    (PoW witness, index words). This is the honest decomposition the
    reference's published u32 estimate omits — its wide row cannot
    execute, so it carries none of the per-query opening reality."""
    from tapstark.field.scalar import EF4, F

    def limbs(v):
        if isinstance(v, (EF4, F)):
            return [int(x) for x in v.as_u32_vec()]
        return [int(v) & 0xFFFFFFFF]

    cats: dict[str, set] = {
        "p_at_z (OOD openings, shared across queries)": set(),
        "p_at_x (per-query committed rows)": set(),
        "fold siblings (per query x phase)": set(),
        "final poly (shared)": set(),
    }
    ov = proof.opened_values
    for v in ov.trace_local + ov.trace_next:
        cats["p_at_z (OOD openings, shared across queries)"].update(limbs(v))
    for chunk in ov.quotient_chunks:
        for v in chunk:
            cats["p_at_z (OOD openings, shared across queries)"].update(limbs(v))
    fp = proof.opening_proof
    for qp in fp.query_proofs:
        for bo in qp.input_proof:
            for mat in bo.opened_values:
                for v in mat:
                    cats["p_at_x (per-query committed rows)"].update(limbs(v))
        for opened, _proof in qp.commit_phase_openings:
            for row_vals in opened:
                for v in row_vals:
                    cats["fold siblings (per query x phase)"].update(limbs(v))
    finals = fp.final_poly if isinstance(fp.final_poly, list) else [fp.final_poly]
    for v in finals:
        cats["final poly (shared)"].update(limbs(v))

    remaining = set(counted)
    out = {}
    for name, vals in cats.items():
        hit = remaining & vals
        out[name] = len(hit)
        remaining -= hit
    out["betas + spill accumulators + misc (residue)"] = len(remaining)
    out["_betas_limbs_in_residue (analytic)"] = 4 * len(fp.commit_phase_commits)
    return out


def wide_row(
    log_n: int, log_blowup: int, nq: int, cols: int, log_final: int = 0
) -> dict:
    """The BASELINE "recursive RISC0-style wide table" shape
    (/root/reference/README.md:101: 2^18 rows x 163 cols, blowup 2^4, 16
    queries, 129.44 MB estimated). The reference row is an ESTIMATE — their
    single-tree leaves exceed Bitcoin's 1000-element stack limit at 163
    columns; our column-sharded commitment emits and EXECUTES the verifier.
    At 163 columns the constraint set is the circuit-real RecursionAir
    (airs/recursion.py: bit-decomposed ARX hashing + EF4 FRI folding — the
    constraint profile of a recursive verifier circuit); other column
    counts fall back to the synthetic WideAir coupling."""
    from tapstark.airs.recursion import RecursionAir, generate_recursion_trace
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
        log_final_poly_len=log_final,
    )
    pcs = TwoAdicFriPcs(TapTreeMmcs(BcManager(), nq, ext=False), fri_cfg)
    if cols == 163:
        trace, pis = generate_recursion_trace(1 << log_n)
        air = RecursionAir()
    else:
        trace, pis = generate_wide_trace(cols, 1 << log_n)
        air = WideAir(cols)
    pis_f = [F(x) for x in pis]
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
        "config": f"wide 2^{log_n} rows x {cols} cols, blowup 2^{log_blowup}, {nq} q"
        + (f", final-poly 2^{log_final}" if log_final else ""),
        "air": type(air).__name__,
        "comparable_total_kb": round(comparable / 1024),
        "fri_per_query_kb": round(avg_q / 1024),
        "constraints_kb": round(constraints / 1024),
        "quotient_kb": round(seg["compute-quotient"] / 1024),
        "u32": report.distinct_u32_count,
        "challenger_kb": round(seg["challenger"] / 1024),
        "challenger_compressions": report.challenger_compressions,
        "u32_itemized": _itemize_u32(proof, report.u32_values),
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
            wparts = [int(x) for x in c.split(":")[1:]]
            print(json.dumps(wide_row(*wparts)), flush=True)
            continue
        parts = [int(x) for x in c.split(":")]
        print(json.dumps(row(*parts)), flush=True)


if __name__ == "__main__":
    main()
