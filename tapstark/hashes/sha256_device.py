"""Batched SHA-256 / BIP-341 tagged hashing on device (jnp uint32 lanes).

The taptree commit phase hashes ~height x reps tapleaf scripts plus a full
binary tree of TapBranch nodes; on the TPU prover the LDE already lives in
HBM, so hashing there removes the host SHA wall (README: 70 of 76.5 s at
2^20 on the 4-core box). This module is the hash layer: fixed-length
messages (every leaf script of a shard is padded to one length) compress as
(N, 16)-word blocks in uint32 lanes — the same vectorization discipline as
the challenger's blake3 grind batch.

Tagged hashing (reference rust-bitcoin TapLeafHash/TapNodeHash semantics,
/root/reference/basic/src/tcs/builder.rs:26-64): the 64-byte
sha256(tag)||sha256(tag) prefix is exactly one block, so each tag's
midstate is a constant and only the message blocks run per item.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .sha256 import sha256

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

IV = np.array(
    [
        0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
        0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
    ],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


_PALLAS_SUB = 8
_PALLAS_LANE_BLK = 256
# Below this many lanes the (relay) dispatch overhead beats the kernel win.
# Note the pad granularity is _PALLAS_SUB * _PALLAS_LANE_BLK = 2048 lanes
# (one full grid step of (8, 256) vregs per word), so batches in
# [1024, 2048) pad up to 2048 — accepted: one padded grid step is still far
# cheaper than 1024+ lanes of the 64-iteration scan fallback, whose carry
# round-trips through HBM every round.
_PALLAS_MIN_LANES = 1024


def _sha_round_ops(a, b, c, d, e, f, g, h, wi, ki):
    s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
    ch = (e & f) ^ (~e & g)
    t1 = h + s1 + ch + ki + wi
    s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
    maj = (a & b) ^ (a & c) ^ (b & c)
    return t1 + s0 + maj, a, b, c, d + t1, e, f, g


def _sha_pallas_kernel(s_ref, b_ref, o_ref):
    """64 fully unrolled rounds per lane block: states/schedule live in
    vector registers (the lax.scan form round-trips its (lanes, 24)-word
    carry through HBM on every one of the 64 iterations — 100x the
    compulsory traffic, and the reason the first device taptree commit ran
    SLOWER than the host SHA-NI engine at 2^22 leaves).

    Each word variable is a FULL (8, 256) 2-D tile: a 1-D (lanes,) slice
    lays out as (1, lanes) vregs using one of eight sublanes, so every VPU
    op would run at 1/8 utilization — the word axis stays in the leading
    ref dimension and the lane axis is 2-D."""
    w = [b_ref[i] for i in range(16)]
    st = tuple(s_ref[i] for i in range(8))
    for i in range(64):
        if i >= 16:
            w1 = w[i - 15]
            w14 = w[i - 2]
            s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> jnp.uint32(3))
            s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> jnp.uint32(10))
            w.append(w[i - 16] + s0 + w[i - 7] + s1)
        st = _sha_round_ops(*st, w[i], jnp.uint32(int(_K[i])))
    for i in range(8):
        o_ref[i] = st[i] + s_ref[i]


def _pallas_compress_wm(st, bl):
    """Core Pallas dispatch on WORD-MAJOR operands: st (8, M), bl (16, M)
    uint32 -> (8, M). Lanes fill full (sublane, lane) = (8, 256) tiles per
    word; words ride the leading (ref) axis."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = st.shape[1]
    tile = _PALLAS_SUB * _PALLAS_LANE_BLK  # messages per grid step
    pad = (-m) % tile
    if pad:
        st = jnp.pad(st, ((0, 0), (0, pad)))
        bl = jnp.pad(bl, ((0, 0), (0, pad)))
    mp = st.shape[1]
    g = mp // tile
    st = st.reshape(8, g * _PALLAS_SUB, _PALLAS_LANE_BLK)
    bl = bl.reshape(16, g * _PALLAS_SUB, _PALLAS_LANE_BLK)
    out = pl.pallas_call(
        _sha_pallas_kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (8, _PALLAS_SUB, _PALLAS_LANE_BLK),
                lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16, _PALLAS_SUB, _PALLAS_LANE_BLK),
                lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (8, _PALLAS_SUB, _PALLAS_LANE_BLK),
            lambda j: (0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((8, g * _PALLAS_SUB, _PALLAS_LANE_BLK), jnp.uint32),
    )(st, bl)
    return out.reshape(8, mp)[:, :m]


def _compress_batch_pallas(state, block):
    """Word-minor wrapper: transposes lanes to word-major around the kernel."""
    lead = block.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    st = jnp.broadcast_to(state, lead + (8,)).reshape(m, 8).T  # (8, M)
    bl = block.reshape(m, 16).T  # (16, M)
    return _pallas_compress_wm(st, bl).T.reshape(lead + (8,))


def compress_batch_wm(state_wm, block_wm):
    """WORD-MAJOR batched compression: state (8, ...), block (16, ...) ->
    (8, ...). On TPU this feeds the Pallas kernel with no lane relayout —
    the word-minor compress_batch transposes the whole (M, 16) block tensor
    to (16, M) around every call, which inside the taptree scan is two
    extra HBM round trips of ~1 GB per block step. Off-TPU it falls back
    to the scan form via cheap host transposes."""
    import jax

    lanes_shape = block_wm.shape[1:]
    m = int(np.prod(lanes_shape)) if lanes_shape else 1
    if jax.default_backend() == "tpu" and m >= _PALLAS_MIN_LANES:
        out = _pallas_compress_wm(
            state_wm.reshape(8, m), block_wm.reshape(16, m)
        )
        return out.reshape((8,) + lanes_shape)
    st = jnp.moveaxis(state_wm, 0, -1)
    bl = jnp.moveaxis(block_wm, 0, -1)
    return jnp.moveaxis(compress_batch(st, bl), -1, 0)


def compress_batch(state, block):
    """One SHA-256 compression per lane: state (..., 8) uint32, block
    (..., 16) uint32 big-endian words -> new state (..., 8).

    On TPU with enough lanes this runs the fully-unrolled Pallas kernel
    (registers only). Elsewhere a 64-iteration lax.scan fuses the message
    schedule into the rounds: the carry holds a 16-word rolling window
    (window[j] = w[i+j]) instead of materializing all 64 schedule words — a
    fully unrolled jnp form sends XLA:CPU's scheduler into multi-minute
    compiles, and a separate schedule scan materializes a (64, lanes)
    tensor that OOMs HBM at taptree scale (64 words x reps x 2^22 leaves =
    16 GB at the 2^20-row north star)."""
    import jax
    from jax import lax

    lanes = int(np.prod(block.shape[:-1])) if block.ndim > 1 else 1
    if jax.default_backend() == "tpu" and lanes >= _PALLAS_MIN_LANES:
        return _compress_batch_pallas(state, block)

    def round_body(c, ki):
        (a, b, cc, d, e, f, g, h), w = c
        wi = w[..., 0]
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + ki + wi
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & cc) ^ (b & cc)
        t2 = s0 + maj
        # extend the schedule window: w[i+16] = w[i] + s0(w[i+1]) + w[i+9]
        # + s1(w[i+14]) (the last 16 extensions are unused, negligible)
        e0 = (
            _rotr(w[..., 1], 7)
            ^ _rotr(w[..., 1], 18)
            ^ (w[..., 1] >> jnp.uint32(3))
        )
        e1 = (
            _rotr(w[..., 14], 17)
            ^ _rotr(w[..., 14], 19)
            ^ (w[..., 14] >> jnp.uint32(10))
        )
        new = wi + e0 + w[..., 9] + e1
        w = jnp.concatenate([w[..., 1:], new[..., None]], axis=-1)
        return ((t1 + t2, a, b, cc, d + t1, e, f, g), w), None

    init = (tuple(state[..., i] for i in range(8)), block)
    (out, _), _ = lax.scan(round_body, init, jnp.asarray(_K))
    return jnp.stack(out, axis=-1) + state


def sha256_blocks(blocks):
    """Full SHA-256 over pre-padded messages: blocks (N, nb, 16) uint32
    big-endian words -> digests (N, 8)."""
    n, nb, _ = blocks.shape
    state = jnp.broadcast_to(jnp.asarray(IV), (n, 8))
    for i in range(nb):
        state = compress_batch(state, blocks[:, i, :])
    return state


def _compress_np(state: np.ndarray, block: np.ndarray) -> np.ndarray:
    """Pure-numpy single SHA-256 compression (host constants only — e.g.
    tag midstates — so it stays usable inside jit traces)."""
    M = np.uint64(0xFFFFFFFF)

    def rotr(x, n):
        return ((x >> np.uint64(n)) | (x << np.uint64(32 - n))) & M

    w = [np.uint64(x) for x in block]
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> np.uint64(3))
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> np.uint64(10))
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M)
    a, b, c, d, e, f, g, h = (np.uint64(x) for x in state)
    for i in range(64):
        s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g & M)
        t1 = (h + s1 + ch + np.uint64(int(_K[i])) + w[i]) & M
        s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (s0 + maj) & M
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M, c, b, a, (t1 + t2) & M
    out = np.array([a, b, c, d, e, f, g, h], dtype=np.uint64)
    return ((out + state.astype(np.uint64)) & M).astype(np.uint32)


@functools.lru_cache(maxsize=None)
def tag_midstate_words(tag: bytes) -> np.ndarray:
    """(8,) uint32: SHA-256 state after the one-block tagged-hash prefix
    sha256(tag) || sha256(tag) (pure numpy: safe to call under jit)."""
    t = sha256(tag)
    block = np.frombuffer(t + t, dtype=">u4").astype(np.uint32)
    return _compress_np(IV.copy(), block)


@functools.lru_cache(maxsize=None)
def _tag_msg_padding_words(msg_bytes: int) -> np.ndarray:
    """SHA-256 padding words appended to a word-aligned tagged-hash message
    of msg_bytes bytes (the 64-byte sha256(tag)||sha256(tag) prefix block
    counts toward the encoded bit length). Single source of truth for both
    the generic tagged hash and the constant TapBranch second block."""
    assert msg_bytes % 4 == 0
    w = msg_bytes // 4
    total = 64 + msg_bytes  # prefix block + message
    # padding for the FULL sha256 input (prefix included in the bit length)
    pad_total = msg_bytes + 1 + 8
    nblocks = -(-pad_total // 64)
    pad = np.zeros(nblocks * 16 - w, dtype=np.uint32)
    pad[0] = 0x80000000
    bitlen = total * 8
    pad[-2] = (bitlen >> 32) & 0xFFFFFFFF
    pad[-1] = bitlen & 0xFFFFFFFF
    return pad


def tagged_hash_fixed_batch(tag: bytes, msg_words, msg_bytes: int):
    """Batched tagged_hash over fixed-length messages that are a whole
    number of u32 words: msg_words (..., W) uint32 big-endian -> (..., 8).
    The message length includes the 64-byte prefix for padding purposes."""
    w = msg_words.shape[-1]
    lead = msg_words.shape[:-1]
    assert msg_bytes == 4 * w
    pad = _tag_msg_padding_words(msg_bytes)
    pad_len_words = pad.shape[0]
    nblocks = (w + pad_len_words) // 16

    state = jnp.broadcast_to(jnp.asarray(tag_midstate_words(tag)), lead + (8,))
    padded = jnp.concatenate(
        [
            msg_words,
            jnp.broadcast_to(jnp.asarray(pad), lead + (pad_len_words,)),
        ],
        axis=-1,
    )
    for i in range(nblocks):
        state = compress_batch(state, padded[..., 16 * i : 16 * i + 16])
    return state


def _lex_sort_pair(h1, h2, word_axis: int):
    """Sort two batched 8-word big-endian digests lexicographically per
    lane: returns (lo, hi). `word_axis` is the axis holding the 8 digest
    words (0 for word-major tensors, -1 for word-minor) — lexicographic
    byte order equals big-endian word-array order. Shared by both
    tapbranch_hash_batch layouts so the compare cannot diverge."""
    less = decided = None
    for i in range(8):
        w1 = jnp.take(h1, i, axis=word_axis)
        w2 = jnp.take(h2, i, axis=word_axis)
        lt = w1 < w2
        if less is None:
            less, decided = lt, w1 != w2
        else:
            less = jnp.where(~decided & lt, True, less)
            decided = decided | (w1 != w2)
    m = jnp.expand_dims(less, word_axis)
    return jnp.where(m, h1, h2), jnp.where(m, h2, h1)


@functools.lru_cache(maxsize=None)
def _tapbranch_block2_round_consts() -> tuple:
    """64 uint32 round constants (K[i] + w[i]) for TapBranch's SECOND
    compression block: its 16 message words are the constant padding block
    (_tag_msg_padding_words(64)), so the whole 64-word schedule — and its
    per-round K addition — folds to compile-time constants, removing the
    schedule-extension arithmetic (~18% of the rounds' ops) from the fused
    kernel."""
    m = 0xFFFFFFFF

    def rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & m

    w = [int(x) for x in _tag_msg_padding_words(64)]
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & m)
    return tuple((w[i] + int(_K[i])) & m for i in range(64))


def _tapbranch_pallas_kernel(h1_ref, h2_ref, o_ref):
    """One WHOLE TapBranch node per lane, fused: in-register lexicographic
    pair sort, first compression over lo||hi from the baked TapBranch
    midstate, second compression with the fully constant-folded padding
    block. The unfused form ran compare/select/concat as XLA glue and two
    separate compress dispatches, round-tripping the (8, lanes) state
    through HBM between them."""
    h1 = [h1_ref[i] for i in range(8)]
    h2 = [h2_ref[i] for i in range(8)]
    less = decided = None
    for i in range(8):
        lt = h1[i] < h2[i]
        ne = h1[i] != h2[i]
        if less is None:
            less, decided = lt, ne
        else:
            less = less | (~decided & lt)
            decided = decided | ne
    w = [jnp.where(less, a, b) for a, b in zip(h1, h2)]
    w += [jnp.where(less, b, a) for a, b in zip(h1, h2)]
    mid = tag_midstate_words(b"TapBranch")
    st = tuple(jnp.uint32(int(x)) for x in mid)
    for i in range(64):
        if i >= 16:
            w1 = w[i - 15]
            w14 = w[i - 2]
            s0 = _rotr(w1, 7) ^ _rotr(w1, 18) ^ (w1 >> jnp.uint32(3))
            s1 = _rotr(w14, 17) ^ _rotr(w14, 19) ^ (w14 >> jnp.uint32(10))
            w.append(w[i - 16] + s0 + w[i - 7] + s1)
        st = _sha_round_ops(*st, w[i], jnp.uint32(int(_K[i])))
    st1 = tuple(s + jnp.uint32(int(x)) for s, x in zip(st, mid))
    st = st1
    for kw in _tapbranch_block2_round_consts():
        st = _sha_round_ops(*st, jnp.uint32(0), jnp.uint32(kw))
    for i in range(8):
        o_ref[i] = st[i] + st1[i]


def _tapbranch_pallas_wm(h1, h2):
    """Fused-kernel dispatch on WORD-MAJOR digests: h1, h2 (8, M) uint32 ->
    (8, M). Same tiling discipline as _pallas_compress_wm."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = h1.shape[1]
    tile = _PALLAS_SUB * _PALLAS_LANE_BLK
    pad = (-m) % tile
    if pad:
        h1 = jnp.pad(h1, ((0, 0), (0, pad)))
        h2 = jnp.pad(h2, ((0, 0), (0, pad)))
    mp = h1.shape[1]
    g = mp // tile
    h1 = h1.reshape(8, g * _PALLAS_SUB, _PALLAS_LANE_BLK)
    h2 = h2.reshape(8, g * _PALLAS_SUB, _PALLAS_LANE_BLK)
    spec = pl.BlockSpec(
        (8, _PALLAS_SUB, _PALLAS_LANE_BLK),
        lambda j: (0, j, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _tapbranch_pallas_kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(g,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((8, g * _PALLAS_SUB, _PALLAS_LANE_BLK), jnp.uint32),
    )(h1, h2)
    return out.reshape(8, mp)[:, :m]


def tapbranch_fused_wm(h1, h2):
    """WORD-MAJOR TapBranch with the fused Pallas kernel on TPU (enough
    lanes), falling back to the two-compress XLA form elsewhere. Byte-exact
    with tapbranch_hash_batch_wm (tools/pallas_sha_tpu_check.py records the
    on-chip parity run)."""
    import jax

    lanes = h1.shape[1:]
    m = int(np.prod(lanes)) if lanes else 1
    if jax.default_backend() == "tpu" and m >= _PALLAS_MIN_LANES:
        out = _tapbranch_pallas_wm(h1.reshape(8, m), h2.reshape(8, m))
        return out.reshape((8,) + lanes)
    return tapbranch_hash_batch_wm(h1, h2)


def tapbranch_hash_batch_wm(h1, h2):
    """WORD-MAJOR batched TapBranch: h1, h2 (8, ...) uint32 big-endian
    digest words -> (8, ...). Same semantics as tapbranch_hash_batch with
    the word axis leading (no lane relayout around the Pallas compress)."""
    lo, hi = _lex_sort_pair(h1, h2, 0)
    lanes = h1.shape[1:]
    mid = jnp.broadcast_to(
        jnp.asarray(tag_midstate_words(b"TapBranch")).reshape((8,) + (1,) * len(lanes)),
        (8,) + lanes,
    )
    state = compress_batch_wm(mid, jnp.concatenate([lo, hi], axis=0))
    # constant second block: 64-byte payload padding from the shared helper
    pad = jnp.broadcast_to(
        jnp.asarray(_tag_msg_padding_words(64)).reshape((16,) + (1,) * len(lanes)),
        (16,) + lanes,
    )
    return compress_batch_wm(state, pad)


def tapbranch_hash_batch(h1, h2):
    """Batched TapBranch: h1, h2 (N, 8) uint32 big-endian digest words ->
    (N, 8). Pairs sort lexicographically (big-endian word compare)."""
    lo, hi = _lex_sort_pair(h1, h2, -1)
    return tagged_hash_fixed_batch(
        b"TapBranch", jnp.concatenate([lo, hi], axis=-1), 64
    )


