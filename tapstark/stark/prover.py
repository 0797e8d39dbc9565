"""uni-STARK prover (reference parity: uni-stark/src/prover.rs).

prove(): infer quotient degree symbolically → commit trace LDE → sample
alpha → evaluate the constraint quotient over the disjoint coset (device,
whole-coset vectorized) → commit quotient chunks → sample zeta → open trace
at {zeta, zeta*g} and every chunk at zeta through the PCS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..air.folders import DExpr, ProverConstraintFolder
from ..air.symbolic import get_log_quotient_degree
from ..challenger import BfChallenger
from ..field.device import ef_mul_base, np_to_mont, to_mont
from ..field.scalar import EF4, F
from ..fri.pcs import TwoAdicFriPcs
from ..utils import log2_strict
from ..utils.profiling import span
from .check import check_constraints
from .proof import Commitments, OpenedValues, Proof


def prove(
    pcs: TwoAdicFriPcs,
    air,
    challenger: BfChallenger,
    trace: np.ndarray,  # (n, width) canonical uint32
    public_values: list[F],
    debug: bool = False,
) -> Proof:
    if debug:
        check_constraints(air, trace, public_values)

    degree = int(trace.shape[0])
    log_degree = log2_strict(degree)

    log_quotient_degree = get_log_quotient_degree(air, len(public_values))
    quotient_degree = 1 << log_quotient_degree

    trace_domain = pcs.natural_domain_for_degree(degree)
    trace_dev = to_mont(trace)

    with span("prove/commit-trace"):
        trace_commit, trace_data = pcs.commit([(trace_domain, trace_dev)])
    challenger.observe_commitment(trace_commit)
    alpha: EF4 = challenger.sample()

    quotient_domain = trace_domain.create_disjoint_domain(
        1 << (log_degree + log_quotient_degree)
    )
    trace_on_quotient_domain = pcs.get_evaluations_on_domain(
        trace_data, 0, quotient_domain
    )

    with span("prove/quotient-values"):
        quotient_vals = quotient_values(
            air,
            public_values,
            trace_domain,
            quotient_domain,
            trace_on_quotient_domain,
            alpha,
        )  # (m, 4) ext Montgomery

    # flatten_to_base: each extension value becomes a width-4 base row
    quotient_flat = quotient_vals
    quotient_chunks = quotient_domain.split_evals(quotient_degree, quotient_flat)
    qc_domains = quotient_domain.split_domains(quotient_degree)

    with span("prove/commit-quotient"):
        quotient_commit, quotient_data = pcs.commit(
            list(zip(qc_domains, quotient_chunks))
        )
    challenger.observe_commitment(quotient_commit)

    zeta: EF4 = challenger.sample()
    zeta_next = trace_domain.next_point(zeta)

    with span("prove/open"):
        opened_values, opening_proof = pcs.open(
            [
                (trace_data, [[zeta, zeta_next]]),
                (quotient_data, [[zeta] for _ in range(quotient_degree)]),
            ],
            challenger,
        )
    trace_local = opened_values[0][0][0]
    trace_next = opened_values[0][0][1]
    quotient_opened = [opened_values[1][i][0] for i in range(quotient_degree)]

    return Proof(
        commitments=Commitments(trace=trace_commit, quotient_chunks=quotient_commit),
        opened_values=OpenedValues(
            trace_local=trace_local,
            trace_next=trace_next,
            quotient_chunks=quotient_opened,
        ),
        opening_proof=opening_proof,
        degree_bits=log_degree,
    )


_quotient_jit_cache: dict = {}

# Chunked quotient evaluation: engage when the coset matrix exceeds this many
# elements (rows x width). 2^12-row chunks bound a wide AIR's live constraint
# intermediates to one chunk's worth; narrow AIRs (fib at any height) stay on
# the whole-coset single program.
#
# TPU-backend only (measured, round 5, 2^17x1548 Blake3 AIR on a 125 GB
# 4-core host): XLA-CPU's compile of the ~25k-op constraint body INSIDE a
# lax.map while-loop peaked >110 GB (OOM) where the flat whole-coset program
# peaks ~82 GB — on CPU the compile-pass memory of the loop body exceeds the
# runtime buffer savings. On a 16 GB-HBM TPU the tradeoff inverts: compiles
# run on the remote compile service and it is exactly the runtime (m, 4)
# intermediates that must be bounded. _QUOTIENT_CHUNK_FORCE exists for the
# CPU equality test.
_QUOTIENT_CHUNK_ROWS = 1 << 12
_QUOTIENT_CHUNK_THRESHOLD = 1 << 26
_QUOTIENT_CHUNK_FORCE = False


def quotient_values(
    air, public_values, trace_domain, quotient_domain, trace_on_quotient_domain, alpha
):
    """Constraint accumulator over the whole quotient coset, divided by the
    zeroifier (prover.rs:121-194, vectorized instead of packed+rayon).

    The whole folder evaluation runs under ONE jit: wide AIRs unroll to
    thousands of constraints, and evaluating them eagerly dispatches tens
    of thousands of tiny device programs (≈30 min through the axon relay
    for the 1548-col Blake3 AIR). Compiled programs are cached per
    (air type, shape, public values) — alpha enters as a traced argument
    so resampling it never recompiles."""
    from ..poly.domain import LagrangeSelectors

    sels = trace_domain.selectors_on_coset(quotient_domain)
    qdb = quotient_domain.log_n - trace_domain.log_n
    next_step = 1 << qdb

    key = (
        type(air).__qualname__,
        air.width(),
        trace_on_quotient_domain.shape,
        next_step,
        tuple(v.v for v in public_values),
    )
    fn = _quotient_jit_cache.get(key)
    if fn is None:
        m, width = trace_on_quotient_domain.shape
        # Wide AIRs unroll to thousands of constraints; evaluating the whole
        # coset in one program keeps many (m, 4) intermediates live at once
        # — far beyond a TPU's HBM for a 2^17-row 1548-col AIR. Above the
        # element threshold (TPU backend, see the constants' comment for the
        # measured CPU counter-case) the rows evaluate in fixed-size chunks
        # under lax.map: the constraint graph is traced once per CHUNK shape
        # and live intermediates are bounded to one chunk's worth. Row-local
        # correctness: every constraint input (trace row, rolled next row,
        # selectors, inv_zeroifier) is sliced by the same row partition;
        # the roll happens on the full matrix BEFORE chunking.
        chunk = _QUOTIENT_CHUNK_ROWS
        if (
            m > chunk
            and m % chunk == 0
            and m * width > _QUOTIENT_CHUNK_THRESHOLD
            and (_QUOTIENT_CHUNK_FORCE or jax.default_backend() == "tpu")
        ):

            @jax.jit
            def fn(tq, first, last, trans, invz, alpha4):
                from jax import lax

                nxt = jnp.roll(tq, -next_step, axis=0)
                nc = m // chunk
                args = (
                    tq.reshape(nc, chunk, width),
                    nxt.reshape(nc, chunk, width),
                    first.reshape(nc, chunk),
                    last.reshape(nc, chunk),
                    trans.reshape(nc, chunk),
                    invz.reshape(nc, chunk),
                )

                def body(a):
                    tqc, nxtc, f, l, tr, iz = a
                    folder = ProverConstraintFolder(
                        tqc,
                        next_step,
                        public_values,
                        LagrangeSelectors(
                            is_first_row=f,
                            is_last_row=l,
                            is_transition=tr,
                            inv_zeroifier=iz,
                        ),
                        DExpr(alpha4, True),
                        next_rows=nxtc,
                    )
                    air.eval(folder)
                    acc = folder.accumulator
                    assert acc.ext
                    return ef_mul_base(acc.arr, iz)

                return lax.map(body, args).reshape(m, 4)

        else:

            @jax.jit
            def fn(tq, first, last, trans, invz, alpha4):
                folder = ProverConstraintFolder(
                    tq,
                    next_step,
                    public_values,
                    LagrangeSelectors(
                        is_first_row=first,
                        is_last_row=last,
                        is_transition=trans,
                        inv_zeroifier=invz,
                    ),
                    DExpr(alpha4, True),
                )
                air.eval(folder)
                acc = folder.accumulator
                assert acc.ext
                return ef_mul_base(acc.arr, invz)

        _quotient_jit_cache[key] = fn

    alpha4 = jnp.asarray(
        np_to_mont(np.array(alpha.as_u32_vec(), np.uint32))
    )
    return fn(
        trace_on_quotient_domain,
        sels.is_first_row,
        sels.is_last_row,
        sels.is_transition,
        sels.inv_zeroifier,
        alpha4,
    )
