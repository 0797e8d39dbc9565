"""TCS — the taptree commitment scheme over polynomial evaluation matrices.

Behavioral port of /root/reference/basic/src/tcs/mod.rs:

- `padding_matrix` interleaves all matrices' rows into per-evaluation-point
  leaves: matrices sorted by descending height; a row of a height-2^k matrix
  is replicated into the 2^(log_max - k) leaves it covers (mod.rs:339-378).
- Each leaf is a Tapscript that verifies Winternitz signatures for
  (query index, every evaluation limb) and checks them against the values
  embedded as constants (CommitedLeaf::generate_script role, mod.rs:197-226).
  Layout redesign (constant-head): all locks run FIRST, parking recovered
  values on the altstack; a short variable tail pops and EQUALVERIFYs them,
  NOP-padded to a shard-wide fixed length. This makes the tapleaf-hash
  preimage prefix (tag block, leaf version, compact_size, all lock bytes)
  identical across leaves, so committing hashes a shared midstate plus ~2
  SHA-256 blocks per leaf instead of the multi-KB lock bytes per leaf.
- A commitment is the taptree root; `commit_poly_with_query_times` commits
  `num_queries` independent trees with FRESH bit-commitment assignments
  (one-time-signature hygiene per query repetition, mod.rs:284-292).
- verify = taptree inclusion + executing the leaf script with the
  signature witness (mod.rs:140-144, 423-434).

The bulk work (leaf-script assembly, tapleaf hashing, ordered tree build)
runs in the native C++ engine (tapstark.native) when available — the role
the reference fills with native Rust — with a pure-Python fallback. Leaf
scripts are reconstructed lazily for openings.

Matrices are numpy arrays of CANONICAL u32 limbs: base field (h, w),
extension field (h, w, 4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..hashes.sha256 import compact_size, sha256
from ..script import opcodes as op
from ..script.builder import push_int
from ..utils import log2_ceil
from .bitcomm import (
    COMMIT_TYPE_U128,
    COMMIT_TYPE_U32,
    BcManager,
    BitCommitment,
)
from .taptree import CompleteTaptree, LeafNode, build_taptree, verify_inclusion


class FMatrix:
    """Canonical-u32 matrix: (h, w) base or (h, w, 4) extension.

    `dev` optionally carries the same matrix as a DEVICE array in Montgomery
    form (the LDE / folded layer the prover already holds in HBM). The
    device commit path consumes it directly: the axon relay moves bulk data
    at only ~3-7 MB/s in EITHER direction, so both re-uploading leaf values
    and eagerly downloading canonical copies cost more than all the tree
    hashing combined. `FMatrix.lazy(dev)` starts the canonical download on
    a background thread instead — by the time the open phase touches
    `.values` (row openings, leaf-block rebuilds) the transfer has
    overlapped with the commit/fold device work."""

    def __init__(self, values: np.ndarray | None = None, dev=None, prefetch: bool = False):
        self._values = values
        self.dev = dev
        self._thread = None
        if values is None:
            assert dev is not None
            if prefetch:
                import threading

                box = {}

                def _run():
                    from ..field.device import fetch_canonical

                    box["v"] = fetch_canonical(self.dev)

                self._box = box
                self._thread = threading.Thread(target=_run, daemon=True)
                self._thread.start()

    @classmethod
    def lazy(cls, dev) -> "FMatrix":
        """Device-backed matrix whose canonical host copy downloads in the
        background (overlapped with subsequent device dispatches)."""
        return cls(None, dev=dev, prefetch=True)

    @property
    def values(self) -> np.ndarray:
        if self._values is None:
            if self._thread is not None:
                self._thread.join()
                self._values = self._box["v"]
                self._thread = None
            else:
                from ..field.device import fetch_canonical

                self._values = fetch_canonical(self.dev)
        return self._values

    @property
    def _shape(self):
        return self._values.shape if self._values is not None else self.dev.shape

    @property
    def ext(self) -> bool:
        return len(self._shape) == 3

    @property
    def height(self) -> int:
        return int(self._shape[0])

    @property
    def width(self) -> int:
        return int(self._shape[1])

    def row_limbs(self, r: int) -> list[list[int]]:
        """Row as a list of per-value limb lists."""
        if self.ext:
            return [[int(x) for x in self.values[r, j]] for j in range(self.width)]
        return [[int(self.values[r, j])] for j in range(self.width)]


@dataclass
class UseBComm:
    index_bc: BitCommitment
    evaluations_bc: list[BitCommitment]


@dataclass
class CommitedProof:
    leaf: LeafNode
    use_bcs: UseBComm
    query_index: int


# Bitcoin Tapscript caps the combined stack+altstack at 1000 elements during
# execution; each committed u32's witness is 20 items (10 digit signatures +
# 10 digit values) plus the index commitment's 20. Leaves wider than this
# bound are split column-wise into multiple taptrees ("shards"), each with
# its own index/eval bit-commitments and its own root, so every leaf script
# executes within consensus limits. The reference does NOT do this — its
# wide-table README rows are flagged as estimates for exactly this reason
# (/root/reference/README.md:90).
MAX_LEAF_VALUES = 40


def shard_bounds(num_values: int) -> list[tuple[int, int]]:
    """Balanced contiguous column ranges, each of size <= MAX_LEAF_VALUES."""
    if num_values <= MAX_LEAF_VALUES:
        return [(0, num_values)]
    k = -(-num_values // MAX_LEAF_VALUES)
    base, rem = divmod(num_values, k)
    bounds = []
    lo = 0
    for s in range(k):
        hi = lo + base + (1 if s < rem else 0)
        bounds.append((lo, hi))
        lo = hi
    return bounds


@dataclass
class ShardedCommitedProof:
    """Opening of one leaf across the column shards of a wide commitment
    (one CommitedProof per shard, same query index)."""

    shards: list[CommitedProof]

    @property
    def query_index(self) -> int:
        return self.shards[0].query_index


def padding_matrix_np(matrices: list[FMatrix]) -> np.ndarray:
    """(num_leaves, num_values, num_limbs) canonical u32 interleaved leaves
    (vectorized reference padding_matrix, mod.rs:339-378)."""
    largest_first = sorted(matrices, key=lambda m: -m.height)
    max_height = largest_first[0].height
    num_limbs = 4 if largest_first[0].ext else 1
    cols = []
    for m in largest_first:
        v = m.values
        if not m.ext:
            v = v[:, :, None]
        rep = max_height // m.height
        cols.append(np.repeat(v, rep, axis=0))
    return np.concatenate(cols, axis=1).astype(np.uint32)


def padding_matrix(matrices: list[FMatrix]) -> list[list[list[int]]]:
    """Reference-shaped view: leaf -> value -> limbs (tests/compat)."""
    arr = padding_matrix_np(matrices)
    return [
        [[int(x) for x in arr[i, j]] for j in range(arr.shape[1])]
        for i in range(arr.shape[0])
    ]


def _leaf_head(index_lock_parked: bytes, eval_locks_parked: list[bytes]) -> bytes:
    """Constant head shared by every leaf of a (repetition, shard): all
    Winternitz locks run first, parking the recovered index + limbs on the
    altstack (index deepest; value K-1 limb 0 on top)."""
    return index_lock_parked + b"".join(eval_locks_parked)


def _leaf_tail(index: int, row: np.ndarray) -> bytes:
    """Variable tail: pop each parked limb and EQUALVERIFY it against the
    claimed value pushed as a minimal-encoded constant. Pops come in reverse
    park order: value K-1 limb 0 first ... value 0 limb n-1, index last."""
    pop_eqv = bytes([op.OP_FROMALTSTACK, op.OP_EQUALVERIFY])
    parts = []
    for limbs in row[::-1]:
        for v in limbs:
            parts.append(push_int(int(v)))
            parts.append(pop_eqv)
    parts.append(push_int(index))
    parts.append(pop_eqv)
    parts.append(bytes([op.OP_1]))
    return b"".join(parts)


def _max_tail_len(num_values: int, num_limbs: int) -> int:
    """Upper bound on the tail: each push is <= 5 bytes (values and indices
    are < 2^31) plus FROMALTSTACK + EQUALVERIFY, then OP_1."""
    return (num_values * num_limbs + 1) * 7 + 1


def _head_align_pad(head_len: int, tail_span: int) -> int:
    """OP_NOP bytes appended to the constant head so each leaf's variable
    SHA-256 suffix spans the fewest 64-byte blocks.

    Head bytes are FREE per leaf — the tagged-hash midstate over (tag block
    || leaf_version || compact_size || head) is computed once per
    (repetition, shard) — while suffix blocks are hashed PER LEAF (device
    scan kernel / host SHA-NI). Aligning the midstate remainder
    rem = (len(pre_script) + head_len) % 64 toward 0 drops
    ceil((rem + tail_span + 9) / 64) by one block for most shard shapes:
    e.g. the north-star trace shard (tail_span 22) goes from 2 suffix
    compressions per leaf to 1. compact_size(fixed_len) can change width
    as the pad grows, so each candidate recomputes it."""
    best_d, best_b = 0, None
    for d in range(64):
        hl = head_len + d
        pre = 1 + len(compact_size(hl + tail_span))
        rem = (pre + hl) % 64
        b = -(-(rem + tail_span + 9) // 64)
        if best_b is None or b < best_b:
            best_b, best_d = b, d
    return best_d


def _leaf_script_from_row(
    head: bytes, fixed_len: int, index: int, row: np.ndarray
) -> bytes:
    """Assemble one leaf script: constant head || variable tail || OP_NOP
    padding to the shard-wide fixed length.

    The fixed length makes the compact_size prefix of the tapleaf hash —
    and therefore the SHA-256 midstate over (tag block || leaf_version ||
    compact_size || head) — identical across all leaves of a shard, so
    per-leaf hashing is ~2 compressions instead of rehashing the multi-KB
    lock bytes (reference rehashes the whole script per leaf,
    basic/src/tcs/mod.rs:197-226)."""
    tail = _leaf_tail(index, row)
    pad = fixed_len - len(head) - len(tail)
    assert pad >= 0
    return head + tail + bytes([op.OP_NOP]) * pad


# openings rebuild a 2^LEVEL_CUTOFF-leaf block (a few hundred SHA-256
# compressions); the commit stores only level hashes >= the cutoff
# (~n/2^LEVEL_CUTOFF entries instead of ~2n).
LEVEL_CUTOFF = 8

# below this leaf count the host SHA-NI engine wins: the device path's
# per-dispatch (relay) latency dominates small trees (FRI tail layers)
_DEVICE_COMMIT_MIN_LEAVES = 1 << 15


def _device_commit_enabled() -> tuple[bool, bool]:
    """Device (TPU) taptree hashing. Returns (enabled, forced):
    TAPSTARK_DEVICE_COMMIT=1 forces it at any size (tests), =0 disables;
    default = on only when the active JAX backend is a real TPU, and then
    only for trees of >= _DEVICE_COMMIT_MIN_LEAVES leaves."""
    import os

    v = os.environ.get("TAPSTARK_DEVICE_COMMIT")
    if v == "0":
        return False, False
    if v == "1":
        return True, True
    try:
        import jax

        return jax.default_backend() == "tpu", False
    except Exception:  # pragma: no cover
        return False, False


def device_commit_will_serve(height: int) -> bool:
    """True when a commit of `height` leaves will take the device path
    (and therefore serve leaf values from HBM via per-query block gathers).
    Callers holding device matrices skip the eager whole-matrix canonical
    download in that case."""
    from .. import native

    dev_on, dev_forced = _device_commit_enabled()
    return (
        native.get_lib() is not None
        and dev_on
        and (dev_forced or height >= _DEVICE_COMMIT_MIN_LEAVES)
    )


_TREE_POOL = None


def _tree_pool():
    """Persistent thread pool for native tree builds: worker threads (and
    their reusable native scratch buffers) survive across commits — fresh
    scratch every commit would re-fault GBs of pages per prove."""
    global _TREE_POOL
    if _TREE_POOL is None:
        import os
        from concurrent.futures import ThreadPoolExecutor

        _TREE_POOL = ThreadPoolExecutor(os.cpu_count() or 4)
    return _TREE_POOL


class SparseNativeTaptree:
    """Memory-lean taptree: the native commit returns only the root and the
    level hash arrays at or above LEVEL_CUTOFF; leaf hashes and bottom
    levels are recomputed per opened query from the shard's values (the
    branch arrays are position-indexed — the BIP-341 lexicographic pair sort
    affects only each parent's preimage order, so no permutation bookkeeping
    exists; verification re-sorts per step)."""

    def __init__(self, root, upper_levels, num_leaves, head, fixed_len, values_shard):
        self.root_hash = root
        self._upper = upper_levels  # [L_cutoff, ..., L_{depth-1}]
        self._n = num_leaves
        self._head = head
        self._fixed_len = fixed_len
        self._values = values_shard

    def root_words(self) -> list[int]:
        return [
            int.from_bytes(self.root_hash[4 * i : 4 * i + 4], "little")
            for i in range(8)
        ]

    def leaf_count(self) -> int:
        return self._n

    def _script_fn(self, i: int) -> bytes:
        return _leaf_script_from_row(
            self._head, self._fixed_len, i, self._values[i]
        )

    def plan_path(self, logical_index: int):
        """Device-backed trees: dispatch the upper-path gather (async) so
        the FRI prover can batch every query's fetch into one device_get.
        Returns (path_view, index, handle) or None (host trees / cached)."""
        plan = getattr(self._upper, "plan", None)
        if plan is None:
            return None
        h = plan(logical_index)
        return (self._upper, logical_index, h) if h is not None else None

    def get_tapleaf(self, logical_index: int) -> LeafNode:
        from .. import native

        i = logical_index
        depth = max((self._n - 1).bit_length(), 0)
        cutoff = min(LEVEL_CUTOFF, depth)
        block_n = 1 << cutoff
        base = (i >> cutoff) << cutoff
        sub = native.tcs_leaf_block_native(
            self._head,
            self._fixed_len,
            self._values[base : base + block_n],
            base,
            sha256(b"TapLeaf"),
            sha256(b"TapBranch"),
        )
        branch = [
            bytes(sub[l][(((i - base) >> l) ^ 1)]) for l in range(cutoff)
        ]
        path_bytes = getattr(self._upper, "path_bytes", None)
        if path_bytes is not None:  # device-resident uppers (one-path gather)
            branch.extend(path_bytes(i))
        else:
            for l in range(cutoff, depth):
                branch.append(bytes(self._upper[l - cutoff][(i >> l) ^ 1]))
        return LeafNode(
            script=self._script_fn(i),
            leaf_hash=bytes(sub[0][i - base]),
            merkle_branch=branch,
        )


@dataclass
class CommitedData:
    leaves: list[FMatrix]
    trees: list  # one CompleteTaptree | NativeTaptree per column shard
    use_bcs_list: list[UseBComm]  # one per shard
    bounds: list[tuple[int, int]]  # column range per shard
    values_np: "np.ndarray"  # or device_commit.DeviceValues (HBM-resident)

    @property
    def commit_taptree(self):
        assert len(self.trees) == 1, "sharded commitment has no single tree"
        return self.trees[0]

    @property
    def use_bcs(self) -> UseBComm:
        assert len(self.use_bcs_list) == 1
        return self.use_bcs_list[0]

    def root_words(self) -> list[int]:
        """Concatenated 8-word LE roots of every shard tree."""
        out: list[int] = []
        for t in self.trees:
            out.extend(t.root_words())
        return out

    def get_max_height(self) -> int:
        return max(m.height for m in self.leaves)

    def leaf_limbs(self, i: int) -> list[list[int]]:
        return [[int(x) for x in v] for v in self.values_np[i]]

    def plan_query(self, query_index: int) -> list:
        """Dispatch async upper-path AND leaf-value-block gathers for every
        device-backed shard tree of this repetition; returns plan tuples for
        materialize_path_plans. Host-built trees contribute nothing."""
        plans = []
        plan_vals = getattr(self.values_np, "plan_tuple", None)
        if plan_vals is not None:  # HBM-resident values (DeviceValues)
            p = plan_vals(query_index)
            if p is not None:
                plans.append(p)
        for tree in self.trees:
            plan = getattr(tree, "plan_path", None)
            if plan is not None:
                p = plan(query_index)
                if p is not None:
                    plans.append(p)
        return plans

    def query_proof(self, query_index: int):
        proofs = [
            CommitedProof(
                leaf=tree.get_tapleaf(query_index),
                use_bcs=use_bcs,
                query_index=query_index,
            )
            for tree, use_bcs in zip(self.trees, self.use_bcs_list)
        ]
        if len(proofs) == 1:
            return proofs[0]
        return ShardedCommitedProof(shards=proofs)


class DeferredDeviceCommit:
    """A device taptree commit whose roots have NOT been fetched: every
    (shard, rep-group) tree program is dispatched (async) and the (R, 8)
    root arrays stay in HBM. The FRI device transcript chain consumes them
    directly (challenger/device_tail.py); the host-side CommitedData list
    materializes later via finalize() from ONE batched jax.device_get over
    all deferred layers (fri/prover.py flush)."""

    def __init__(self, root_handles, num_shards, finalize_fn):
        self.root_handles = root_handles  # one (R_g, 8) array per rep-group
        self.num_shards = num_shards
        self._finalize = finalize_fn
        self._done = None

    @property
    def num_groups(self) -> int:
        return len(self.root_handles)

    def roots_rep_order_dev(self):
        """(R, 8) device array of all repetitions' root words in rep order
        (single-shard commits only — rep-groups dispatch in rep order)."""
        assert self.num_shards == 1, "sharded commit has no single root order"
        if len(self.root_handles) == 1:
            return self.root_handles[0]
        import jax.numpy as jnp

        return jnp.concatenate(self.root_handles, axis=0)

    def finalize(self, fetched_roots) -> list[CommitedData]:
        if self._done is None:
            self._done = self._finalize(fetched_roots)
        return self._done


def materialize_path_plans(plans: list) -> None:
    """Fetch every planned upper-path gather in ONE jax.device_get and hand
    the results back to their path views (relay transfers are latency-bound:
    one round trip for all queries instead of one per (query, tree))."""
    if not plans:
        return
    import jax

    fetched = jax.device_get([h for (_, _, h) in plans])
    for (view, idx, _), arr in zip(plans, fetched):
        view.materialize(idx, arr)


def _leaf_witness(use_bcs: UseBComm, index: int, values: list[list[int]]) -> list[bytes]:
    """Witness: evaluation signatures in reverse bc order, then the index
    signature on top (mod.rs:173-182)."""
    from .winternitz import N0, sign_many, to_digits

    wins, msgs = [], []
    for bc, limbs in zip(reversed(use_bcs.evaluations_bc), reversed(values)):
        bc.set_values(list(limbs))
        for c in bc.commitments:
            wins.append(c.winternitz)
            msgs.append(to_digits(c.value, N0))
    use_bcs.index_bc.set_values([index])
    for c in use_bcs.index_bc.commitments:
        wins.append(c.winternitz)
        msgs.append(to_digits(c.value, N0))
    out: list[bytes] = []
    for items in sign_many(wins, msgs):
        out.extend(items)
    return out


class TCS:
    def __init__(self, manager: BcManager):
        self.manager = manager

    def _assign_locks(self, num_values: int, ext: bool):
        """Deterministic (sequential) bit-commitment assignment + the shard's
        constant leaf head and fixed script length."""
        commit_type = COMMIT_TYPE_U128 if ext else COMMIT_TYPE_U32
        index_bc = self.manager.assign_bc(COMMIT_TYPE_U32)
        evaluations_bc = self.manager.assign_bcs(commit_type, num_values)
        use_bcs = UseBComm(index_bc=index_bc, evaluations_bc=evaluations_bc)
        index_lock = index_bc.locking_script_parked().build()
        eval_locks = [bc.locking_script_parked().build() for bc in evaluations_bc]
        head = _leaf_head(index_lock, eval_locks)
        num_limbs = 4 if ext else 1
        tail_span = _max_tail_len(num_values, num_limbs)
        # SHA-block alignment: NOP-pad the (midstate-absorbed, per-leaf-free)
        # head so the per-leaf suffix covers the fewest compression blocks
        head = head + bytes([op.OP_NOP]) * _head_align_pad(len(head), tail_span)
        fixed_len = len(head) + tail_span
        return use_bcs, head, fixed_len

    def _build_shard(self, values_shard, use_bcs, head, fixed_len):
        num_leaves = values_shard.shape[0]

        def script_fn(i: int) -> bytes:
            return _leaf_script_from_row(head, fixed_len, i, values_shard[i])

        from .. import native

        if native.get_lib() is not None:
            depth = max((num_leaves - 1).bit_length(), 0)
            root, upper = native.tcs_commit_sparse_native(
                head,
                fixed_len,
                values_shard,
                sha256(b"TapLeaf"),
                sha256(b"TapBranch"),
                min(LEVEL_CUTOFF, depth),
            )
            return SparseNativeTaptree(
                root, upper, num_leaves, head, fixed_len, values_shard
            )
        scripts = [script_fn(i) for i in range(num_leaves)]
        return build_taptree(scripts)

    def _build(self, matrices, values_np, shard_args, bounds):
        trees = []
        use_list = []
        for (use_bcs, head, fixed_len), (lo, hi) in zip(shard_args, bounds):
            vs = np.ascontiguousarray(values_np[:, lo:hi])
            trees.append(self._build_shard(vs, use_bcs, head, fixed_len))
            use_list.append(use_bcs)
        return CommitedData(
            leaves=matrices,
            trees=trees,
            use_bcs_list=use_list,
            bounds=bounds,
            values_np=values_np,
        )

    def _assign_rep(self, bounds, ext):
        """Sequential lock assignment for every shard of one repetition."""
        return [self._assign_locks(hi - lo, ext) for lo, hi in bounds]

    def commit_polys(self, matrices: list[FMatrix]) -> CommitedData:
        values_np = padding_matrix_np(matrices)
        bounds = shard_bounds(values_np.shape[1])
        shard_args = self._assign_rep(bounds, matrices[0].ext)
        return self._build(matrices, values_np, shard_args, bounds)

    def commit_poly_with_query_times(
        self, matrices: list[FMatrix], total_query_times: int
    ) -> list[CommitedData]:
        """One tree (per shard) per query repetition, fresh bit commitments
        each (mod.rs:284-292). Assignment is sequential (deterministic
        secrets); the native tree builds release the GIL and run on a
        thread pool. On a TPU backend the tapleaf/branch hashing runs as a
        device kernel instead (commit/device_commit.py): leaf tails are
        repetition-independent, so the byte construction happens once per
        shard and each repetition re-hashes from its own head midstate."""
        return self._commit_common(matrices, total_query_times, defer=False)

    def commit_poly_deferred(self, matrices: list[FMatrix], total_query_times: int):
        """Device-path commit WITHOUT the blocking root fetch: dispatches
        every tree program and returns a DeferredDeviceCommit whose root
        handles the caller batches into one jax.device_get (the FRI
        commit-phase device transcript chain consumes the roots directly
        from HBM — challenger/device_tail.py). Returns None when the device
        path is not taken (caller falls back to the synchronous commit)."""
        return self._commit_common(matrices, total_query_times, defer=True)

    def _commit_common(self, matrices, total_query_times, defer: bool):
        from ..utils.profiling import span

        ext = matrices[0].ext
        max_h = max(m.height for m in matrices)
        bounds = shard_bounds(sum(m.width for m in matrices))
        from .. import native

        dev_on, dev_forced = _device_commit_enabled()
        use_dev = (
            native.get_lib() is not None
            and dev_on
            and (dev_forced or max_h >= _DEVICE_COMMIT_MIN_LEAVES)
        )
        vals_dev = None
        if use_dev:
            from . import device_commit as dc

            vals_dev = dc.padding_matrix_dev(matrices)
        if defer and not use_dev:
            return None
        if vals_dev is None:
            # host leaf values needed up front (host tree builds, or device
            # path fed from host arrays)
            with span("tcs/padding-matrix"):
                values_np = padding_matrix_np(matrices)
        else:
            # leaf values stay in HBM; the host copy materializes lazily at
            # open time (overlapped background fetches, see FMatrix.lazy)
            values_np = None
        with span("tcs/assign-keygen"):
            assignments = [
                self._assign_rep(bounds, ext) for _ in range(total_query_times)
            ]
        if use_dev:
            return self._commit_device(
                matrices, values_np, assignments, bounds, vals_dev, defer=defer
            )
        if native.get_lib() is not None and total_query_times > 1:
            with span("tcs/tree-builds"):
                return list(
                    _tree_pool().map(
                        lambda a: self._build(matrices, values_np, a, bounds),
                        assignments,
                    )
                )
        with span("tcs/tree-builds"):
            return [self._build(matrices, values_np, a, bounds) for a in assignments]

    def _commit_device(
        self, matrices, values_np, assignments, bounds, vals_dev=None, defer=False
    ):
        """Device tree builds (TPU): shared per-shard suffix construction,
        then ALL repetitions' tapleaf + TapBranch hashing in one jitted
        program per rep-group (per-rep dispatch loops drown in the remote
        relay's per-call latency). Roots/upper-levels are byte-identical to
        the host engine's; the open path (SparseNativeTaptree leaf-block
        rebuild) is unchanged. With `vals_dev` (device padding matrix) the
        suffix bytes build from HBM-resident values and the host copy is
        deferred to open time."""
        from ..utils.profiling import enabled as profiling_enabled
        from ..utils.profiling import span
        from . import device_commit as dc

        reps = len(assignments)
        n = max(m.height for m in matrices)
        depth = max((n - 1).bit_length(), 0)
        cutoff = min(LEVEL_CUTOFF, depth)
        # rep-group size: the tapleaf scan carries ~(16 block + 16 window +
        # 8 state) words per (rep, leaf) lane plus fused temporaries — keep
        # R_g * N lanes under 2^24 (~4-6 GB peak) so the 2^22-leaf north
        # star fits the 16 GB HBM
        group = max(1, min(reps, (1 << 24) // max(n, 1)))
        trees_by_rep = [[None] * len(bounds) for _ in range(reps)]
        dvals = dc.DeviceValues(vals_dev, cutoff) if values_np is None else None
        # tree lanes live in BIT-REVERSED leaf order (contiguous-halves
        # TapBranch levels, see dc._trees_all_reps_jit): one row-bitrev of
        # the padding matrix per commit feeds every shard's suffix build
        log_n = max(n.bit_length() - 1, 0)
        vals_brv = (
            dc.bitrev_rows_dev(vals_dev, log_n) if vals_dev is not None else None
        )
        with span("tcs/tree-builds"):
            # phase 1: dispatch EVERY (shard, rep-group) tree program async
            dispatched = []  # (s, g0, g1, roots_dev, uppers, vs)
            for s, (lo, hi) in enumerate(bounds):
                if values_np is None:
                    # leaf values stay in HBM; openings gather one block
                    # per query later (DeviceValues)
                    suffix_src = vals_brv[:, lo:hi]
                    vs = dvals.shard(lo, hi)
                else:
                    vs = np.ascontiguousarray(values_np[:, lo:hi])
                    if vals_brv is not None:
                        suffix_src = vals_brv[:, lo:hi]
                    else:
                        from ..utils import bitrev_indices

                        suffix_src = vs[bitrev_indices(log_n)]
                heads = [assignments[r][s][1] for r in range(reps)]
                fixed0 = assignments[0][s][2]
                for r in range(reps):
                    assert (
                        len(assignments[r][s][1]) == len(heads[0])
                        and assignments[r][s][2] == fixed0
                    )
                plan = dc.ShardSuffixPlan(len(heads[0]), fixed0)
                with span("tcs/dev-suffix"):
                    suffix = dc.build_tail_suffix_words(
                        suffix_src, plan, bitrev_leaf_order=True
                    )
                    if profiling_enabled():
                        # JAX dispatch is async (and the axon relay's
                        # block_until_ready doesn't sync): force a tiny
                        # fetch so suffix-build time lands in this span
                        # instead of being absorbed by tcs/dev-trees.
                        np.asarray(suffix[0, 0])
                with span("tcs/dev-midstates"):
                    mids, remws = plan.head_midstates_batch(heads)
                for g0 in range(0, reps, group):
                    g1 = min(g0 + group, reps)
                    with span("tcs/dev-trees"):
                        roots_dev, uppers = dc.shard_trees_rep_group_async(
                            suffix, mids[g0:g1], remws[g0:g1], cutoff
                        )
                    dispatched.append((s, g0, g1, roots_dev, uppers, vs))

        def finalize(fetched):
            """Build host CommitedData from the fetched root arrays (one
            per dispatched (shard, rep-group), in dispatch order)."""
            for (s, g0, g1, _, uppers, vs), roots_np in zip(dispatched, fetched):
                roots = dc.roots_to_bytes(roots_np)
                for j, r in enumerate(range(g0, g1)):
                    use_bcs, head, fixed_len = assignments[r][s]
                    trees_by_rep[r][s] = SparseNativeTaptree(
                        roots[j],
                        uppers.view(j),  # device-resident, path-gathered
                        n,
                        head,
                        fixed_len,
                        vs,
                    )
            return [
                CommitedData(
                    leaves=matrices,
                    trees=trees_by_rep[r],
                    use_bcs_list=[assignments[r][s][0] for s in range(len(bounds))],
                    bounds=bounds,
                    values_np=values_np if dvals is None else dvals,
                )
                for r in range(reps)
            ]

        if defer:
            return DeferredDeviceCommit(
                [d[3] for d in dispatched], len(bounds), finalize
            )
        # phase 2: ONE blocking fetch for every root batch of the commit
        # (the per-group device_get was ~40 relay round trips per prove)
        with span("tcs/dev-roots-fetch"):
            import jax

            fetched = jax.device_get([d[3] for d in dispatched])
        return finalize(fetched)

    def open_with_one_query(
        self, query_times_index: int, query_index: int, prover_data: list[CommitedData]
    ) -> tuple[CommitedProof, list[list[int]]]:
        data = prover_data[query_times_index]
        return data.query_proof(query_index), data.leaf_limbs(query_index)

    @staticmethod
    def verify(root_hash: bytes, proof: CommitedProof, opening_limbs: list[list[int]]) -> bool:
        witness = _leaf_witness(proof.use_bcs, proof.query_index, opening_limbs)
        if not verify_inclusion(root_hash, proof.leaf):
            return False
        from ..script.interpreter import MAX_STACK, execute_script

        # Sharded commits keep every leaf under Bitcoin's 1000-element stack
        # limit by construction; the relaxed limit remains only as a guard
        # for direct single-tree use beyond MAX_LEAF_VALUES.
        limit = max(MAX_STACK, len(witness) + 64)
        return execute_script(proof.leaf.script, witness, stack_limit=limit).success

    @staticmethod
    def verify_words(
        root_words: list[int], proof, opening_limbs: list[list[int]]
    ) -> bool:
        """Verify against a commitment's (possibly sharded) root-word list:
        8 LE words per shard tree, column ranges re-derived from the opened
        value count (shard_bounds is deterministic)."""
        if isinstance(proof, ShardedCommitedProof):
            bounds = shard_bounds(len(opening_limbs))
            if len(bounds) != len(proof.shards):
                return False
            if len(root_words) != 8 * len(bounds):
                return False
            for s, ((lo, hi), sp) in enumerate(zip(bounds, proof.shards)):
                root_hash = b"".join(
                    int(w).to_bytes(4, "little") for w in root_words[8 * s : 8 * s + 8]
                )
                if not TCS.verify(root_hash, sp, opening_limbs[lo:hi]):
                    return False
            return True
        if len(root_words) != 8:
            return False
        root_hash = b"".join(int(w).to_bytes(4, "little") for w in root_words)
        return TCS.verify(root_hash, proof, opening_limbs)
