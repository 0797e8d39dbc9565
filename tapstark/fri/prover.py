"""FRI prover: commit-and-fold on device, taptree commits per layer.

Behavioral port of /root/reference/fri/src/prover.rs:
- commit phase: while len > blowup, commit the (n/2, 2) fold matrix, observe
  the roots, sample beta, fold on device, absorb any same-size input
  (prover.rs:92-141);
- PoW grind; query phase samples num_queries indices, opening the input
  rounds AND every commit-phase layer per query (prover.rs:45-59).

Inputs are (n, 4) extension arrays in Montgomery form on device, sorted by
descending length.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..challenger import BfChallenger
from ..commit.tcs import FMatrix
from ..field.device import ef_add, fetch_canonical, np_from_mont, np_to_mont, to_mont
from ..field.scalar import EF4
from ..poly.fold import fold_matrix_jit
from ..utils import log2_strict
from .config import FriConfig
from .proof import BfQueryProof, FriProof


def _ef_const_mont(e: EF4):
    return to_mont(np.array(e.as_u32_vec(), dtype=np.uint32))


def bf_prove(
    config: FriConfig,
    inputs: list,
    challenger: BfChallenger,
    open_input,
    extra_query_index_bits: int = 0,
    plan_input=None,
) -> FriProof:
    assert all(
        inputs[i].shape[0] >= inputs[i + 1].shape[0] for i in range(len(inputs) - 1)
    ), "inputs must be sorted by descending length"
    log_max_height = log2_strict(int(inputs[0].shape[0]))

    from ..utils.profiling import span

    with span("fri/commit-phase"):
        commits, data, final_poly = _commit_phase(config, inputs, challenger)

    # Early stop (L > 0): the final coefficients are NOT determined by the
    # committed layers (they are the iNTT of the last FOLDED layer, which is
    # never committed), so they must be transcript-bound before the grind and
    # query sampling — otherwise a prover could pick them after seeing the
    # query positions. L = 0 keeps the reference transcript exactly: the
    # constant is pinned by every query's last committed fold.
    if config.log_final_poly_len > 0:
        for c in final_poly:
            challenger.observe_u32s(c.as_u32_vec())

    with span("fri/grind"):
        pow_witness = challenger.grind(config.proof_of_work_bits)

    # Pre-sample every query index (openings never touch the challenger, so
    # the transcript is identical), then batch-prefetch the device-resident
    # taptree query paths: every (query, tree) upper-path gather dispatches
    # asynchronously and ONE jax.device_get materializes them all — instead
    # of one relay round trip per opening.
    query_indices = [
        challenger.sample_bits(log_max_height + extra_query_index_bits)
        for _ in range(config.num_queries)
    ]
    from ..commit.tcs import materialize_path_plans

    plans = []
    for qti, query_index in enumerate(query_indices):
        if plan_input is not None:
            plans += plan_input(qti, query_index)
        idx = query_index >> extra_query_index_bits
        for i, layer_data in enumerate(data):
            plans += layer_data[qti].plan_query(idx >> i >> 1)
    with span("fri/path-prefetch"):
        materialize_path_plans(plans)

    query_proofs = []
    for query_times_index, query_index in enumerate(query_indices):
        query_proofs.append(
            BfQueryProof(
                input_proof=open_input(query_times_index, query_index),
                commit_phase_openings=_answer_query(
                    config, data, query_index >> extra_query_index_bits, query_times_index
                ),
            )
        )

    return FriProof(
        commit_phase_commits=commits,
        query_proofs=query_proofs,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def _commit_phase(config: FriConfig, inputs: list, challenger: BfChallenger):
    inputs_iter = iter(inputs)
    folded = next(inputs_iter)  # device (n, 4) Montgomery
    pending = next(inputs_iter, None)
    folded_host = None  # canonical (n, 4) numpy once the host tail starts
    pending_iter = iter(())  # replaces inputs_iter at the host-tail switch

    commits = []
    data = []
    from ..challenger.device_tail import DeviceTailChain, chain_supported
    from ..commit.tcs import (
        _DEVICE_COMMIT_MIN_LEAVES,
        _device_commit_enabled,
        device_commit_will_serve,
    )
    from ..field.constants import P
    from ..poly.fold import fold_matrix_host
    from ..utils.profiling import span

    _, dev_forced = _device_commit_enabled()

    # Device transcript chain: while layer commits run on device, the whole
    # (commit -> observe roots -> sample beta -> fold) step chains in HBM
    # with NO host round trip — the transcript-sequential root fetch + host
    # beta per layer was the dominant remaining latency of the TPU commit
    # phase. The host challenger catches up at flush_chain() from ONE
    # batched fetch and every replayed sample is asserted word-identical
    # to the device chain's (challenger/device_tail.py).
    # Bound the chain against the repetition count the deferred commit
    # actually uses (mmcs.num_queries), not config.num_queries — the two
    # are equal today, but a divergence would otherwise mis-gate the
    # single-chunk digest limit inside _blake3_words_dev.
    chain_ok = chain_supported(challenger, config.mmcs.num_queries)
    dev_chain = None
    deferred = []  # (slot in commits/data, DeferredDeviceCommit, beta handle)

    def flush_chain():
        nonlocal dev_chain
        # any re-engagement must re-snapshot the caught-up host challenger
        dev_chain = None
        if not deferred:
            return
        import jax

        handles = []
        for _, dfr, bw in deferred:
            handles.extend(dfr.root_handles)
            handles.append(bw)
        with span("fri/chain-flush"):
            fetched = jax.device_get(handles)
        pos = 0
        for slot, dfr, _ in deferred:
            prover_data = dfr.finalize(fetched[pos : pos + dfr.num_groups])
            pos += dfr.num_groups
            beta_words = fetched[pos]
            pos += 1
            commitment = [d.root_words() for d in prover_data]
            challenger.observe_commitment(commitment)
            challenger.sample()
            if [int(w) for w in challenger.sample_input[-1]] != [
                int(x) for x in beta_words
            ]:
                # must survive `python -O`: a silent divergence would emit
                # a proof whose folds used device betas but whose
                # transcript came from the host replay
                raise RuntimeError(
                    "device transcript chain diverged from the host challenger"
                )
            commits[slot] = commitment
            data[slot] = prover_data
        deferred.clear()

    stop = config.blowup() * config.final_poly_len()
    while (folded_host.shape[0] if folded_host is not None else folded.shape[0]) > stop:
        half = (
            folded_host.shape[0] if folded_host is not None else folded.shape[0]
        ) // 2
        if folded_host is None and chain_ok and device_commit_will_serve(half):
            mat_dev = folded.reshape(half, 2, 4)
            with span("fri/layer-commit"):
                dfr = config.mmcs.commit_matrix_deferred(FMatrix(dev=mat_dev))
            if dfr is not None:
                # FRI layer matrices are 2 ext values -> always one shard
                if dev_chain is None:
                    dev_chain = DeviceTailChain(challenger)
                beta_mont, beta_words = dev_chain.step(dfr.roots_rep_order_dev())
                folded = fold_matrix_jit(beta_mont, mat_dev)
                commits.append(None)
                data.append(None)
                deferred.append((len(commits) - 1, dfr, beta_words))
                if pending is not None and pending.shape[0] == folded.shape[0]:
                    folded = ef_add(folded, pending)
                    pending = next(inputs_iter, None)
                continue
        # any non-chain step advances the host challenger: catch it up first
        flush_chain()
        # Host tail: once a layer's tree would build on the host anyway
        # (below the device-commit threshold), fetch the folded layer ONCE
        # and run the remaining fold+commit loop in exact host numpy — the
        # per-layer device fold dispatch and canonical-fetch relay round
        # trips otherwise dominate the small layers on a remote TPU.
        if (
            folded_host is None
            and not dev_forced
            and half < _DEVICE_COMMIT_MIN_LEAVES
        ):
            # Kick off background canonical downloads for every remaining
            # sub-threshold input FIRST: they are absorbed a few layers
            # down, and a synchronous fetch there is one blocking relay
            # round trip per input. The fetches overlap with the folded
            # layer's own (blocking) fetch and the host fold/commit work.
            rest = ([pending] if pending is not None else []) + list(inputs_iter)
            pending_lazy = [FMatrix.lazy(p) for p in rest]
            pending = pending_lazy[0] if pending_lazy else None
            pending_iter = iter(pending_lazy[1:])
            with span("fri/layer-fetch"):
                folded_host = fetch_canonical(folded)
            folded = None
        if folded_host is not None:
            mat_arr = folded_host.reshape(half, 2, 4)
            mat_host = FMatrix(mat_arr)
        else:
            mat_dev = folded.reshape(half, 2, 4)
            from ..commit.tcs import device_commit_will_serve

            if device_commit_will_serve(half):
                # device commit serves leaf values from HBM per query
                # (DeviceValues block gathers) — no bulk layer download
                mat_host = FMatrix(dev=mat_dev)
            else:
                with span("fri/layer-fetch"):
                    # background canonical download; query rows join it
                    mat_host = FMatrix.lazy(mat_dev)
        with span("fri/layer-commit"):
            commit, prover_data = config.mmcs.commit_matrix(mat_host)
        challenger.observe_commitment(commit)

        beta: EF4 = challenger.sample()
        if folded_host is not None:
            folded_host = fold_matrix_host(beta, mat_arr)
        else:
            folded = fold_matrix_jit(jnp.asarray(_ef_const_mont(beta)), mat_dev)

        commits.append(commit)
        data.append(prover_data)

        if folded_host is not None:
            # host tail: pending entries are FMatrix.lazy wrappers whose
            # canonical downloads started at the tail switch — .values joins
            if pending is not None and pending.height == folded_host.shape[0]:
                pen = pending.values.astype(np.uint64)
                folded_host = (
                    (folded_host.astype(np.uint64) + pen) % np.uint64(P)
                ).astype(np.uint32)
                pending = next(pending_iter, None)
        elif pending is not None and pending.shape[0] == folded.shape[0]:
            folded = ef_add(folded, pending)
            pending = next(inputs_iter, None)

    flush_chain()
    final_host = folded_host if folded_host is not None else fetch_canonical(folded)
    assert final_host.shape[0] == stop
    assert pending is None, (
        "log_final_poly_len too large: an input height was never absorbed"
    )
    if config.log_final_poly_len == 0:
        # `blowup` evaluations of a constant polynomial
        final_poly = EF4([int(x) for x in final_host[0]])
        for row in final_host:
            assert EF4([int(x) for x in row]) == final_poly, (
                "final poly is not constant"
            )
        return commits, data, final_poly

    # Early stop: the layer holds blowup * 2^L bit-reversed evaluations of a
    # degree-<2^L polynomial over the natural domain of that size. Extract
    # coefficients with an iNTT per extension component (twiddles are base
    # field, so components transform independently) and check the high
    # coefficients vanish — the prover-side low-degree guarantee.
    from ..poly.ntt import intt
    from ..utils import bitrev_indices

    m = final_host.shape[0]
    nat = final_host[bitrev_indices(m.bit_length() - 1)]
    coeffs = np_from_mont(
        np.asarray(intt(jnp.asarray(np_to_mont(nat))))
    )
    flen = config.final_poly_len()
    assert (coeffs[flen:] == 0).all(), "final poly exceeds the declared degree"
    return commits, data, [EF4([int(x) for x in row]) for row in coeffs[:flen]]


def _answer_query(config: FriConfig, commit_phase_data, query_index: int, qti: int):
    out = []
    for i, layer_data in enumerate(commit_phase_data):
        index_i = query_index >> i >> 1
        out.append(config.mmcs.open_batch(qti, index_i, layer_data))
    return out
