"""Taptree commit hashing on device (TPU): leaf-tail construction + SHA.

The host engine builds each shard tree with SHA-NI at ~4-core speed, which
is 70 of the 76.5 s TPU north-star wall-clock (README). This module moves
the per-leaf work to the device:

- every leaf script of a shard is head || tail(i) || NOP-pad to one fixed
  length, so the SHA-256 midstate through the multi-KB head is ONE host
  computation per (repetition, shard) and only the ~2-6 tail blocks hash
  per leaf;
- the tail bytes (minimal-CScriptNum value pushes + FROMALTSTACK/
  EQUALVERIFY pairs + index push + OP_1) are DATA-DEPENDENT in length, so
  they are built on device as fixed 8-byte slots scattered at cumsum
  offsets — byte-exact with script.builder.push_int;
- tails are repetition-independent: the byte tensor is built once and the
  per-rep tapleaf compressions run from each rep's head midstate;
- TapBranch levels hash on device; only levels >= LEVEL_CUTOFF transfer to
  the host (the same sparse layout as native.tcs_commit_sparse_native, so
  openings reuse the existing host leaf-block rebuild).

Reference anchor: the num_queries-cloned tree commit this re-architects is
/root/reference/basic/src/tcs/mod.rs:197-292.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hashes.sha256 import compact_size, sha256
from ..hashes.sha256_device import (
    compress_batch,
    compress_batch_wm,
    tag_midstate_words,
    tapbranch_fused_wm,
)
from ..script import opcodes as op

_OP_FROMALT = op.OP_FROMALTSTACK
_OP_EQV = op.OP_EQUALVERIFY
_OP_1 = op.OP_1
_OP_NOP = op.OP_NOP

_LEAF_CHUNK = 1 << 16


_T_BLOCK = 64


def _tail_bytes_chunk(vals_chunk, indices_chunk, tail_span: int):
    """vals_chunk (n, K, L) uint32 canonical, indices_chunk (n,) -> byte
    tensor (n, tail_span) uint8: value slots (values reversed, limbs in
    order), index slot, then OP_NOP fill.

    Scatter-free placement (TPU scatters serialize per element — tens of
    seconds at 2^22 leaves): every output byte t is covered by exactly one
    slot, found with a (start <= t < end) one-hot over the S slots. The
    per-slot metadata the byte needs (first byte, encoding length, start)
    is PACKED into one word so the one-hot gather is two masked sums
    (packed word + raw value) instead of an 8-wide per-position match;
    the byte itself is then computed structurally from the in-slot offset
    p: p=0 -> first byte, p<enc -> CScriptNum data byte (v >> 8(p-1)),
    p=enc -> OP_FROMALTSTACK, p=enc+1 -> OP_EQUALVERIFY, p=enc+2 (index
    slot only) -> OP_1. Byte-exact with script.builder.push_int."""
    n, k, l = vals_chunk.shape
    slot_vals = vals_chunk[:, ::-1, :].reshape(n, k * l).astype(jnp.uint32)
    v = jnp.concatenate(
        [slot_vals, indices_chunk[:, None].astype(jnp.uint32)], axis=1
    )  # (n, S); the last slot is the index slot
    s = v.shape[1]
    zero = v == 0
    small = (v >= jnp.uint32(1)) & (v <= jnp.uint32(16))
    ndata = (
        jnp.uint32(1)
        + (v >= jnp.uint32(0x80)).astype(jnp.uint32)
        + (v >= jnp.uint32(0x8000)).astype(jnp.uint32)
        + (v >= jnp.uint32(0x800000)).astype(jnp.uint32)
    )
    enc_len = jnp.where(zero | small, jnp.uint32(1), 1 + ndata)
    first = jnp.where(
        zero, jnp.uint32(0), jnp.where(small, jnp.uint32(op.OP_1 - 1) + v, ndata)
    )
    extra = jnp.where(
        jnp.arange(s) == s - 1, jnp.uint32(3), jnp.uint32(2)
    )  # FROMALT+EQV (+OP_1 for the index slot)
    slot_len = enc_len + extra[None, :]
    ends = jnp.cumsum(slot_len, axis=1)  # (n, S)
    starts = ends - slot_len
    total = ends[:, -1]  # (n,)
    # packed metadata: first (8 bits) | enc_len (4 bits) | start (20 bits)
    packed = first | (enc_len << jnp.uint32(8)) | (starts << jnp.uint32(12))

    blocks = []
    for t0 in range(0, tail_span, _T_BLOCK):
        t = jnp.arange(t0, min(t0 + _T_BLOCK, tail_span), dtype=jnp.uint32)
        m = (t[None, None, :] >= starts[:, :, None]) & (
            t[None, None, :] < ends[:, :, None]
        )  # (n, S, T): at most one true per (n, t)
        pk = jnp.sum(jnp.where(m, packed[:, :, None], jnp.uint32(0)), axis=1)
        vv = jnp.sum(jnp.where(m, v[:, :, None], jnp.uint32(0)), axis=1)
        f = pk & jnp.uint32(0xFF)
        e = (pk >> jnp.uint32(8)) & jnp.uint32(0xF)
        p = t[None, :] - (pk >> jnp.uint32(12))  # in-slot offset
        data = (vv >> (jnp.uint32(8) * jnp.where(p == 0, 0, p - 1))) & jnp.uint32(0xFF)
        byte = jnp.where(
            p == 0,
            f,
            jnp.where(
                p < e,
                data,
                jnp.where(
                    p == e,
                    jnp.uint32(_OP_FROMALT),
                    jnp.where(p == e + 1, jnp.uint32(_OP_EQV), jnp.uint32(_OP_1)),
                ),
            ),
        )
        blocks.append(jnp.where(t[None, :] < total[:, None], byte, jnp.uint32(_OP_NOP)))
    return jnp.concatenate(blocks, axis=1).astype(jnp.uint8)


def _pack_words(bytes_tensor):
    """(..., 4*W) uint8 -> (..., W) uint32 big-endian words."""
    b = bytes_tensor.astype(jnp.uint32)
    return (
        (b[..., 0::4] << jnp.uint32(24))
        | (b[..., 1::4] << jnp.uint32(16))
        | (b[..., 2::4] << jnp.uint32(8))
        | b[..., 3::4]
    )


def _pack_words_np(bytes_arr: np.ndarray) -> np.ndarray:
    """Host twin of _pack_words for small constant/remainder buffers: a
    device round trip (upload, shift kernel, download) for a few hundred
    bytes costs one relay RTT per (commit, shard) on the remote TPU."""
    b = bytes_arr.astype(np.uint32)
    return (
        (b[..., 0::4] << np.uint32(24))
        | (b[..., 1::4] << np.uint32(16))
        | (b[..., 2::4] << np.uint32(8))
        | b[..., 3::4]
    )


class ShardSuffixPlan:
    """Host-side layout plan for one shard's tapleaf hashing: where the tail
    starts inside the SHA stream and the constant padding."""

    def __init__(self, head_len: int, fixed_len: int, leaf_version: int = 0xC0):
        self.head_len = head_len
        self.fixed_len = fixed_len
        cs = compact_size(fixed_len)
        self.pre_script = bytes([leaf_version]) + cs
        # bytes before the tail in the full tagged-hash stream
        before = 64 + len(self.pre_script) + head_len
        self.full_blocks = before // 64
        self.rem_len = before % 64
        self.tail_span = fixed_len - head_len
        total_msg = 64 + len(self.pre_script) + fixed_len
        suf_payload = self.rem_len + self.tail_span + 9
        self.n_suffix_blocks = -(-suf_payload // 64)
        suf_bytes = self.n_suffix_blocks * 64
        pad = np.zeros(suf_bytes, dtype=np.uint8)
        pe = self.rem_len + self.tail_span
        pad[pe] = 0x80
        bitlen = total_msg * 8
        pad[suf_bytes - 8 :] = np.frombuffer(
            int(bitlen).to_bytes(8, "big"), dtype=np.uint8
        )
        self.pad_words = _pack_words_np(pad)
        self.suf_words = suf_bytes // 4

    def head_midstates_batch(self, heads: list[bytes]):
        """All repetitions at once: (R, 8) SHA midstates after every full
        block through each head, plus (R, suf_words) leftover head bytes
        packed as zero-padded suffix words. One jitted device call for the
        whole batch (heads are multi-KB; per-block eager dispatch would be
        hundreds of round trips)."""
        r = len(heads)
        msgs = [self.pre_script + h for h in heads]
        full = (len(msgs[0]) + 64) // 64 * 64 - 64
        assert all(len(m) == len(msgs[0]) for m in msgs)
        tag_state = tag_midstate_words(b"TapLeaf")
        from .. import native

        if native.get_lib() is not None and full:
            # host SHA-NI: the heads are a few KB x R messages — microseconds
            # on the host, where a (R, 8)-lane scan through ~full/64
            # sequential device compressions costs seconds on a remote chip
            states = native.sha256_midstates_native(
                [m[:full] for m in msgs], tag_state
            )
        else:
            blocks = np.stack(
                [
                    np.frombuffer(m[:full], dtype=">u4").astype(np.uint32)
                    for m in msgs
                ]
            ).reshape(r, full // 64, 16)
            states = np.asarray(
                _head_midstates_jit(jnp.asarray(blocks), jnp.asarray(tag_state))
            )
        rems = np.zeros((r, self.suf_words * 4), dtype=np.uint8)
        for i, m in enumerate(msgs):
            rem = m[full:]
            assert len(rem) == self.rem_len
            rems[i, : len(rem)] = np.frombuffer(rem, dtype=np.uint8)
        return np.asarray(states), _pack_words_np(rems)


@jax.jit
def _head_midstates_jit(blocks, midstate):
    """blocks (R, nb, 16) uint32, midstate (8,) -> (R, 8)."""
    r = blocks.shape[0]
    state = jnp.broadcast_to(midstate, (r, 8))
    for i in range(blocks.shape[1]):
        state = compress_batch(state, blocks[:, i, :])
    return state


def _suffix_chunk(vals_chunk, idx, pad_words, tail_span, rem_len, suf_words):
    tail = _tail_bytes_chunk(vals_chunk, idx, tail_span)
    n = vals_chunk.shape[0]
    suf = jnp.zeros((n, suf_words * 4), dtype=jnp.uint8)
    suf = suf.at[:, rem_len : rem_len + tail_span].set(tail)
    return _pack_words(suf) | pad_words[None, :]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _suffix_all_jit(vals, pad_words, idx, tail_span, rem_len, suf_words, chunk):
    """Whole-shard suffix build in ONE program: a lax.map over fixed-size
    leaf chunks bounds the live intermediates to one chunk's worth while
    keeping a single device dispatch (the eager per-chunk loop paid one
    relay round trip per 2^16 leaves — 64 of them for the 2^22-leaf north
    star). `idx` (N,) uint32: the committed leaf index per lane (arange
    for leaf-order storage, its bit-reversal for bitrev storage)."""
    from jax import lax

    n = vals.shape[0]
    if n <= chunk:
        return _suffix_chunk(vals, idx, pad_words, tail_span, rem_len, suf_words)
    pad_n = (-n) % chunk
    if pad_n:
        vals = jnp.pad(vals, ((0, pad_n), (0, 0), (0, 0)))
        idx = jnp.pad(idx, ((0, pad_n),))
    nc = vals.shape[0] // chunk
    vc = vals.reshape(nc, chunk, *vals.shape[1:])
    ic = idx.reshape(nc, chunk)

    def body(args):
        v, i = args
        return _suffix_chunk(v, i, pad_words, tail_span, rem_len, suf_words)

    out = lax.map(body, (vc, ic)).reshape(nc * chunk, suf_words)
    return out[:n] if pad_n else out


def _bitrev_u32(x, bits: int):
    """Elementwise bit-reversal of `bits`-bit uint32 values (constant mask
    swaps — no index table, no gather)."""
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    x = (x << jnp.uint32(16)) | (x >> jnp.uint32(16))
    return x >> jnp.uint32(32 - bits)


@functools.partial(jax.jit, static_argnums=(1,))
def bitrev_rows_dev(x, log_n: int):
    """Jitted y[p] = x[brv(p)] along axis 0 (one program per shape).
    Delegates to poly.ntt.bit_reverse_rows, whose small-digit double-gather
    form avoids the multi-MB full index-table upload."""
    from ..poly.ntt import bit_reverse_rows

    assert x.shape[0] == 1 << log_n
    return bit_reverse_rows(x)


_WM_ROW = 256  # lane width of the word-major 2-D vreg form
# the word-major elementwise builder statically unrolls tail_span x slots
# select chains; beyond these bounds (wide AIR shards) the jaxpr explodes
# and the chunked one-hot form takes over
_WM_MAX_SLOTS = 20
_WM_MAX_SPAN = 128


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _suffix_wm_jit(vals, base_index, tail_span: int, rem_len: int, pad_tuple, bitrev_bits: int):
    """WORD-MAJOR suffix build: vals (N, K, L) canonical uint32 ->
    (suf_words, N) uint32, N a multiple of 256.

    Replaces the (chunk, slots, span) one-hot masked-sum form for the hot
    shard shapes: that layout put the slot/byte axes in the minor tile
    dims ((4..9, 64) of an (8, 256)-lane vreg — <25% utilization) and its
    lax.map chunking added per-chunk overheads, measuring ~10 s for one
    2^22-leaf shard on the TPU. Here every tensor is a full (N/256, 256)
    tile and the slot/byte structure lives in statically unrolled python
    loops of fused elementwise selects — no reductions, no gathers, no
    relayouts — and the result is emitted word-major so the tapleaf scan
    consumes it with no transpose."""
    n, k, l = vals.shape
    assert n % _WM_ROW == 0
    rows = n // _WM_ROW
    nv = k * l
    # slot order: values reversed, limbs in order; one (rows, 256) tile per
    # slot (the transpose is one relayout of the S*N input words)
    sv = vals[:, ::-1, :].reshape(n, nv).T.reshape(nv, rows, _WM_ROW)
    row_i = jax.lax.broadcasted_iota(jnp.uint32, (rows, _WM_ROW), 0)
    col_i = jax.lax.broadcasted_iota(jnp.uint32, (rows, _WM_ROW), 1)
    lane = row_i * jnp.uint32(_WM_ROW) + col_i
    # bitrev leaf storage (see _trees_all_reps_jit): lane p holds leaf
    # brv(p) — vals arrive pre-permuted, the committed leaf INDEX is
    # brv(p), computed elementwise (no index-table gather)
    leaf_idx = _bitrev_u32(lane, bitrev_bits) if bitrev_bits else base_index + lane
    slot_vals = [sv[s] for s in range(nv)]
    slot_vals.append(leaf_idx)

    one = jnp.uint32(1)
    starts, encs, firsts = [], [], []
    start = jnp.zeros((rows, _WM_ROW), jnp.uint32)
    for s, v in enumerate(slot_vals):
        zero = v == 0
        small = (v >= one) & (v <= jnp.uint32(16))
        ndata = (
            one
            + (v >= jnp.uint32(0x80)).astype(jnp.uint32)
            + (v >= jnp.uint32(0x8000)).astype(jnp.uint32)
            + (v >= jnp.uint32(0x800000)).astype(jnp.uint32)
        )
        enc = jnp.where(zero | small, one, one + ndata)
        first = jnp.where(
            zero, jnp.uint32(0), jnp.where(small, jnp.uint32(op.OP_1 - 1) + v, ndata)
        )
        starts.append(start)
        encs.append(enc)
        firsts.append(first)
        extra = jnp.uint32(3 if s == len(slot_vals) - 1 else 2)
        start = start + enc + extra
    total = start  # (rows, 256): data bytes per leaf; the rest is OP_NOP fill

    nop = jnp.uint32(_OP_NOP)
    fromalt = jnp.uint32(_OP_FROMALT)
    eqv = jnp.uint32(_OP_EQV)
    op1 = jnp.uint32(_OP_1)
    words = []
    for w in range(len(pad_tuple)):
        word = None
        for j in range(4):
            g = 4 * w + j
            t = g - rem_len
            if t < 0 or t >= tail_span:
                continue  # rem region / SHA padding region: byte 0
            tu = jnp.uint32(t)
            # data region [0, total) is filled by the slot selects below;
            # [total, span) is the OP_NOP script fill
            b = jnp.where(tu < total, jnp.uint32(0), nop)
            for s in range(len(slot_vals)):
                # min slot length is 3 (1-byte push + FROMALT + EQV), so
                # slots beyond t//3 cannot have started yet — static skip
                if t < 3 * s:
                    break
                p = tu - starts[s]  # wraps when unselected (masked out)
                extra = 3 if s == len(slot_vals) - 1 else 2
                in_s = (tu >= starts[s]) & (p < encs[s] + jnp.uint32(extra))
                # CScriptNum data byte p-1 via constant shifts only: a
                # per-lane variable shift amount scalarizes on the TPU VPU
                # (measured seconds instead of milliseconds per shard)
                v = slot_vals[s]
                data = jnp.where(
                    p <= jnp.uint32(1),
                    v,
                    jnp.where(
                        p == jnp.uint32(2),
                        v >> jnp.uint32(8),
                        jnp.where(p == jnp.uint32(3), v >> jnp.uint32(16), v >> jnp.uint32(24)),
                    ),
                ) & jnp.uint32(0xFF)
                val = jnp.where(
                    p == 0,
                    firsts[s],
                    jnp.where(
                        p < encs[s],
                        data,
                        jnp.where(
                            p == encs[s],
                            fromalt,
                            jnp.where(p == encs[s] + one, eqv, op1),
                        ),
                    ),
                )
                b = jnp.where(in_s & (tu < total), val, b)
            shifted = b << jnp.uint32(24 - 8 * j)
            word = shifted if word is None else word | shifted
        if word is None:
            word = jnp.zeros((rows, _WM_ROW), jnp.uint32)
        if pad_tuple[w]:
            word = word | jnp.uint32(pad_tuple[w])
        words.append(word.reshape(n))
    return jnp.stack(words)


def build_tail_suffix_words(
    values_shard,
    plan: ShardSuffixPlan,
    base_index: int = 0,
    bitrev_leaf_order: bool = False,
):
    """values_shard (N, K, L) canonical uint32 (host or device) ->
    WORD-MAJOR (suf_words, N) uint32: the repetition-independent part of
    each leaf's suffix blocks (rem region zeroed, SHA padding included).

    With `bitrev_leaf_order` (the tree path): values_shard must arrive
    ROW-BIT-REVERSED (lane p = leaf brv(p), see bitrev_rows_dev) and each
    lane's committed index slot is brv(p) — the storage order under which
    every TapBranch level pairs CONTIGUOUS halves (_trees_all_reps_jit).

    Hot shard shapes use the elementwise word-major builder; wide shards
    (slots/span beyond the static-unroll bounds) fall back to the chunked
    one-hot form."""
    vals = jnp.asarray(values_shard)
    n, k, l = vals.shape
    bits = 0
    if bitrev_leaf_order:
        assert n & (n - 1) == 0 and base_index == 0
        bits = max(n.bit_length() - 1, 1)
    if k * l + 1 <= _WM_MAX_SLOTS and plan.tail_span <= _WM_MAX_SPAN:
        pad_n = (-n) % _WM_ROW
        if pad_n:
            vals = jnp.pad(vals, ((0, pad_n), (0, 0), (0, 0)))
        out = _suffix_wm_jit(
            vals,
            jnp.uint32(base_index),
            plan.tail_span,
            plan.rem_len,
            tuple(int(x) for x in plan.pad_words),
            bits,
        )
        return out[:, :n] if pad_n else out
    lane = jnp.arange(n, dtype=jnp.uint32)
    idx = _bitrev_u32(lane, bits) if bits else jnp.uint32(base_index) + lane
    return _suffix_all_jit(
        vals,
        jnp.asarray(plan.pad_words),
        idx,
        plan.tail_span,
        plan.rem_len,
        plan.suf_words,
        _LEAF_CHUNK,
    ).T


@functools.partial(jax.jit, static_argnames=("exts",))
def _padding_dev_jit(devs, *, exts):
    from ..field.device import from_mont

    max_h = devs[0].shape[0]
    cols = []
    for d, ext in zip(devs, exts):
        v = from_mont(d)
        if not ext:
            v = v[..., None]
        rep = max_h // v.shape[0]
        if rep > 1:
            v = jnp.repeat(v, rep, axis=0)
        cols.append(v)
    return jnp.concatenate(cols, axis=1)


def padding_matrix_dev(matrices):
    """Device twin of tcs.padding_matrix_np consuming FMatrix.dev handles
    (Montgomery device arrays) -> (N, K, L) canonical uint32 ON DEVICE, or
    None when any matrix lacks a handle. Keeping the leaf values in HBM
    matters because the axon relay uploads host->device at ~3 MB/s: the
    50 MB north-star shard re-upload cost more than all tree hashing."""
    if any(getattr(m, "dev", None) is None for m in matrices):
        return None
    largest_first = sorted(matrices, key=lambda m: -m.height)
    devs = tuple(jnp.asarray(m.dev) for m in largest_first)
    exts = tuple(bool(m.ext) for m in largest_first)
    return _padding_dev_jit(devs, exts=exts)


@functools.partial(jax.jit, static_argnums=(3,))
def _trees_all_reps_jit(suffix_words, midstates, rem_words, cutoff: int):
    """ALL repetitions of one shard in one program: suffix WORD-MAJOR
    (W, N) shared, midstates (R, 8) + rem_words (R, W) per rep. Returns (roots (R, 8),
    upper levels l in [cutoff, depth) CONCATENATED along the node axis as
    one (R, total_nodes, 8) array — a single HBM-resident residency for the
    query-path gathers). One device dispatch chain per shard instead of per
    (rep, level) — the relay's per-call latency made per-rep loops the
    bottleneck.

    Everything runs WORD-MAJOR ((8|16, R, N) with the hash-word axis
    leading): the word-minor compress path transposes the whole block
    tensor to (16, M) around every Pallas call — inside the scan that is
    ~2 GB of pure relayout HBM traffic per block step at the north star.
    The per-rep rem words OR into each block INSIDE the scan: a
    materialized (R, N, nb, 16) tensor would cost R*N*w*4 bytes of HBM
    (8 GB at the 2^20-row north star with a 16-rep group).

    Levels live in BIT-REVERSED node order: lane p of an m-bit level holds
    node brv_m(p), so siblings (2i, 2i+1) sit at (p, p + half) and every
    level is a CONTIGUOUS halves split — the leaf-order form's stride-2
    lane slices ran at ~1.8 GB/s on the TPU (291 ms for the first level
    alone; the whole 22-level loop on halves runs in ~67 ms). The suffix
    must be built with bitrev_leaf_order=True; node p of the output level
    is again brv_{m-1}(p), so the invariant propagates to the root."""
    from jax import lax

    r, w = rem_words.shape
    n = suffix_words.shape[1]
    nb = w // 16
    # block b, word k -> [b, k, :] (already word-major: no relayout)
    suf_wm = suffix_words.reshape(nb, 16, n)
    rem_wm = rem_words.T.reshape(nb, 16, r)
    state0 = jnp.broadcast_to(midstates.T[:, :, None], (8, r, n))

    def body(state, xs):
        blk_suf, blk_rem = xs  # (16, N), (16, R)
        blk = blk_suf[:, None, :] | blk_rem[:, :, None]  # (16, R, N)
        return compress_batch_wm(state, blk), None

    level, _ = lax.scan(body, state0, (suf_wm, rem_wm))  # (8, R, N)
    depth = max((n - 1).bit_length(), 0)
    upper = []
    for l in range(depth):
        half = level.shape[2] // 2
        level = tapbranch_fused_wm(level[:, :, :half], level[:, :, half:])
        if l + 1 >= cutoff and l + 1 < depth:
            upper.append(level)
    flat = (
        jnp.concatenate(upper, axis=2)
        if upper
        else jnp.zeros((8, r, 0), jnp.uint32)
    )
    # back to lane-minor once, on the small results only: (R, total, 8)
    # for the query-path gathers, (R, 8) roots
    return level[:, :, 0].T, jnp.transpose(flat, (1, 2, 0))


def _upper_offsets(n: int, cutoff: int) -> list[int]:
    """Node-axis offset of each stored level l in [cutoff, depth) inside the
    concatenated upper array (level l holds n >> l nodes)."""
    depth = max((n - 1).bit_length(), 0)
    offs = []
    acc = 0
    for l in range(cutoff, depth):
        offs.append(acc)
        acc += n >> l
    return offs


@jax.jit
def _path_gather_jit(flat, idxs):
    """flat (total, 8) one rep's concatenated upper levels, idxs (L,) int32
    -> (L, 8) sibling nodes of one query path."""
    return jnp.take(flat, idxs, axis=0)


class DeviceUppers:
    """Upper taptree levels of one shard rep-group, kept ON DEVICE.

    The host only ever reads ~(depth - cutoff) sibling nodes per repetition
    (each rep tree serves exactly one FRI query), so fetching whole levels
    (~n/2^cutoff nodes x 32 B x reps) over the relay is almost entirely
    wasted transfer. Openings instead gather the single query path on
    device; the FRI prover pre-samples every query index and materializes
    all gathers in one jax.device_get (see fri/prover.py)."""

    def __init__(self, flat_dev, n: int, cutoff: int):
        self.flat = flat_dev  # (R, total, 8) uint32
        self.n = n
        self.cutoff = cutoff
        self.depth = max((n - 1).bit_length(), 0)
        self.offsets = _upper_offsets(n, cutoff)

    def view(self, rep: int) -> "DeviceUppersPath":
        return DeviceUppersPath(self, rep)


class DeviceUppersPath:
    """One repetition's lazy path accessor (the `upper_levels` argument of
    SparseNativeTaptree). plan(i) dispatches the gather asynchronously;
    path_bytes(i) returns the sibling hashes for levels [cutoff, depth),
    fetching on demand if no prefetch happened."""

    def __init__(self, group: DeviceUppers, rep: int):
        self._g = group
        self._rep = rep
        self._pending: dict[int, object] = {}
        self._cache: dict[int, list[bytes]] = {}

    def _idxs(self, i: int) -> np.ndarray:
        from ..utils import reverse_bits_len

        g = self._g
        # levels are stored in bit-reversed node order (lane p = node
        # brv(p), see _trees_all_reps_jit): the sibling NODE index maps
        # through brv over the level's width
        return np.array(
            [
                off
                + reverse_bits_len(
                    ((i >> l) ^ 1) & ((g.n >> l) - 1), g.depth - l
                )
                for off, l in zip(g.offsets, range(g.cutoff, g.depth))
            ],
            dtype=np.int32,
        )

    def plan(self, i: int):
        """Dispatch the path gather (async); returns a device handle (or
        None when cached/empty). The caller batches handles into one
        jax.device_get and hands results back via materialize()."""
        if i in self._cache or i in self._pending or not self._g.offsets:
            return None
        h = _path_gather_jit(self._g.flat[self._rep], jnp.asarray(self._idxs(i)))
        self._pending[i] = h
        return h

    def materialize(self, i: int, fetched: np.ndarray) -> None:
        self._pending.pop(i, None)
        self._cache[i] = _nodes_to_bytes(fetched)

    def path_bytes(self, i: int) -> list[bytes]:
        if i not in self._cache:
            if not self._g.offsets:
                return []
            h = self._pending.pop(i, None)
            if h is None:
                h = _path_gather_jit(
                    self._g.flat[self._rep], jnp.asarray(self._idxs(i))
                )
            self._cache[i] = _nodes_to_bytes(np.asarray(h))
        return self._cache[i]


def _nodes_to_bytes(nodes: np.ndarray) -> list[bytes]:
    """(L, 8) uint32 big-endian digest words -> L x 32-byte hashes."""
    b = np.ascontiguousarray(nodes.astype(">u4")).view(np.uint8).reshape(-1, 32)
    return [bytes(row) for row in b]


@functools.partial(jax.jit, static_argnums=(2,))
def _value_block_jit(vals, base, block: int):
    """vals (N, K, L) canonical uint32, base int32 -> (block, K, L): one
    leaf-block gather (dynamic start, static size)."""
    return jax.lax.dynamic_slice(
        vals, (base, 0, 0), (block,) + tuple(vals.shape[1:])
    )


class DeviceValues:
    """Canonical padding-matrix leaf values kept ON DEVICE through the open
    phase. Openings only ever read one 2^cutoff-row block per (query,
    commit) — the leaf-block rebuild plus the opened row — so downloading
    whole canonical matrices over the relay (~3-7 MB/s either way; ~300 MB
    across all commits at the 2^20 north star) is almost entirely wasted
    transfer. plan_tuple(i) dispatches the block gather asynchronously; the
    FRI prover batches every query's gather (values + upper tree paths)
    into ONE jax.device_get (materialize_path_plans)."""

    def __init__(self, vals_dev, cutoff: int):
        self.dev = vals_dev  # (N, K, L) canonical uint32 device array
        self.n = int(vals_dev.shape[0])
        self.block = min(1 << cutoff, self.n) if self.n else 1
        self._pending: dict[int, object] = {}
        self._cache: dict[int, np.ndarray] = {}
        self._full: np.ndarray | None = None

    def _base(self, i: int) -> int:
        return (int(i) // self.block) * self.block

    def plan_tuple(self, i: int):
        """(view, base, handle) for materialize_path_plans, or None when the
        block is already cached/pending."""
        base = self._base(i)
        if self._full is not None or base in self._cache or base in self._pending:
            return None
        h = _value_block_jit(self.dev, jnp.int32(base), self.block)
        self._pending[base] = h
        return (self, base, h)

    def materialize(self, base: int, fetched: np.ndarray) -> None:
        self._pending.pop(base, None)
        self._cache[base] = np.asarray(fetched)

    def _block(self, base: int) -> np.ndarray:
        if self._full is not None:
            return self._full[base : base + self.block]
        if base not in self._cache:
            h = self._pending.pop(base, None)
            if h is None:
                h = _value_block_jit(self.dev, jnp.int32(base), self.block)
            self._cache[base] = np.asarray(h)
        return self._cache[base]

    def full(self) -> np.ndarray:
        """Whole-matrix fallback for access patterns outside the per-query
        blocks (none on the prover hot path)."""
        if self._full is None:
            self._full = np.asarray(self.dev)
        return self._full

    def __getitem__(self, k):
        if isinstance(k, (int, np.integer)):
            base = self._base(k)
            return self._block(base)[int(k) - base]
        return self.full()[k]

    def shard(self, lo: int, hi: int) -> "DeviceValuesShard":
        return DeviceValuesShard(self, lo, hi)


class DeviceValuesShard:
    """Column-shard view of a DeviceValues (the `values_shard` argument of
    SparseNativeTaptree): serves whole-block slices from the per-query
    block cache without materializing the full matrix."""

    def __init__(self, dv: DeviceValues, lo: int, hi: int):
        self._dv = dv
        self._lo, self._hi = lo, hi

    def __getitem__(self, k):
        if isinstance(k, slice) and k.step is None:
            start = k.start or 0
            base = self._dv._base(start)
            if k.stop is not None and k.stop <= base + self._dv.block:
                blk = self._dv._block(base)
                return np.ascontiguousarray(
                    blk[start - base : k.stop - base, self._lo : self._hi]
                )
        if isinstance(k, (int, np.integer)):
            return self._dv[k][self._lo : self._hi]
        return np.ascontiguousarray(self._dv.full()[k, self._lo : self._hi])


def shard_trees_rep_group_async(
    suffix_words, midstates: np.ndarray, rem_words: np.ndarray, cutoff: int
):
    """Dispatch one rep-group's tree program WITHOUT fetching the roots:
    returns (roots_dev (R, 8), DeviceUppers). The caller batches every
    (shard, group) root fetch of a commit into one jax.device_get — the
    per-group blocking fetch was ~40 relay round trips per prove at the
    north star."""
    roots_dev, flat_dev = _trees_all_reps_jit(
        suffix_words, jnp.asarray(midstates), jnp.asarray(rem_words), cutoff
    )
    return roots_dev, DeviceUppers(flat_dev, int(suffix_words.shape[1]), cutoff)


def roots_to_bytes(roots_np: np.ndarray) -> list[bytes]:
    """(R, 8) uint32 root words -> R x 32-byte big-endian root hashes."""
    return [
        np.ascontiguousarray(roots_np[r].astype(">u4")).tobytes()
        for r in range(roots_np.shape[0])
    ]


def shard_trees_rep_group(suffix_words, midstates: np.ndarray, rem_words: np.ndarray, cutoff: int):
    """A group of repetitions of one shard in one jitted program: returns
    (roots: [bytes]*R and a DeviceUppers handle whose per-rep views serve
    query paths later). Blocking variant of shard_trees_rep_group_async
    (tests / single-group callers)."""
    roots_dev, uppers = shard_trees_rep_group_async(
        suffix_words, midstates, rem_words, cutoff
    )
    return roots_to_bytes(jax.device_get(roots_dev)), uppers


