"""Device-side FRI commit-phase transcript chain.

The FRI commit phase is transcript-SEQUENTIAL: each layer's fold needs its
beta, which the host derives by fetching the layer's taptree roots (one
blocking ~30 ms relay round trip per layer on the remote TPU) and advancing
the Blake3 duplex — so every layer drains the device pipeline. This module
runs that chain ON DEVICE: a jitted step consumes the (R, 8) root words the
tree program just produced (still resident in HBM), computes the
observe_commitment digest (blake3 over the root bytes), advances a bit-exact
twin of the BfChallenger duplex, and emits the layer's beta in Montgomery
form for the fold kernel — no host round trip anywhere in the loop.

The host BfChallenger is REPLAYED afterward from the batched root fetch
(fri/prover.py flush) and every replayed sample is asserted word-identical
to the device chain's, so transcript semantics, the DSL op_log, and the
proof bytes are unchanged — the twin is validated on every prove.

Duplex semantics twinned from challenger.BfChallenger (v2 compression
duplex): absorb rate 16 words with compression at a full buffer; sample
pops from the END of the 8-word squeeze output; observe clears the output
buffer. Within the FRI loop each layer does observe(8 digest words) then
sample() of 4 ext words, so only the FIRST layer can carry a nonempty
pending input buffer (every sample flushes it).

All compressions use the scanned vector form (hashes.blake3.compress_scan)
— the unrolled per-word graph trips a ~200x XLA-CPU runtime pathology.

Reference anchor: the commit-phase loop this accelerates is
/root/reference/fri/src/prover.rs:92-141 (observe root -> sample beta ->
fold) driving basic/src/challenger/mod.rs.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from ..field.constants import P
from ..hashes.blake3 import CHUNK_END, CHUNK_START, ROOT, compress_scan
from . import FLAGS, Blake3Compression, TestPermutation

# cumulative step count across all chains (test observability)
TOTAL_STEPS = 0


def _jnp():
    import jax.numpy as jnp

    return jnp


def _byteswap32(x):
    jnp = _jnp()
    return (
        (x >> jnp.uint32(24))
        | ((x >> jnp.uint32(8)) & jnp.uint32(0xFF00))
        | ((x & jnp.uint32(0xFF00)) << jnp.uint32(8))
        | (x << jnp.uint32(24))
    )


def _blake3_words_dev(msg):
    """blake3 of a (n,) uint32 array of little-endian message words
    (single-chunk: n <= 256 words / 1024 bytes). Returns the (8,) digest
    words — exactly the words BfChallenger.observe_commitment absorbs (it
    re-parses the digest bytes little-endian)."""
    jnp = _jnp()
    n = int(msg.shape[0])
    total_bytes = 4 * n
    assert total_bytes <= 1024
    nb = max(1, -(-n // 16))
    blocks = jnp.zeros((nb * 16,), jnp.uint32).at[:n].set(msg).reshape(nb, 16)
    from ..hashes.blake3 import IV

    cv = jnp.asarray(np.array(IV, dtype=np.uint32))
    for bi in range(nb):
        flags = 0
        if bi == 0:
            flags |= CHUNK_START
        if bi == nb - 1:
            flags |= CHUNK_END | ROOT
        block_len = min(64, total_bytes - 64 * bi)
        cv = compress_scan(cv, blocks[bi], 0, block_len, flags)
    return cv


def _duplex_compress(cv, block, block_len: int, kind: str):
    """One duplex step on (8,)/(16,) vectors: bit-exact twin of
    Blake3Compression.compress / TestPermutation.compress."""
    jnp = _jnp()
    if kind == "blake3":
        return compress_scan(cv, block, 0, block_len, FLAGS)
    # TestPermutation: mixed[i] = ((cv[i] ^ b[i]) + b[i+8] + len + i) mod
    # 2^32, output reversed (challenger.TestPermutation)
    mixed = (
        (cv ^ block[:8])
        + block[8:]
        + jnp.uint32(block_len)
        + jnp.arange(8, dtype=jnp.uint32)
    )
    return mixed[::-1]


def _step(cv, pending, roots, kind: str):
    """One FRI-layer transcript step: observe_commitment(roots) then
    sample() of an EF4 beta.

    cv (8,) u32 duplex chaining value; pending (k,) u32 input-buffer words
    (k static via shape; nonzero only on the first chain step); roots
    (R, 8) u32 BIG-endian SHA words of the R repetition taptree roots.
    Returns (cv' (8,), beta_mont (4,), beta_words (4,) raw popped words)."""
    jnp = _jnp()
    from ..field.device import to_mont

    # observe_commitment digest: the host serializes root_words (LE ints of
    # the root hash bytes) back to little-endian bytes — i.e. the raw root
    # hashes, whose LE message words are the byteswapped device SHA words.
    digest = _blake3_words_dev(_byteswap32(roots.reshape(-1)))

    k = int(pending.shape[0]) + 8
    buf = jnp.concatenate([pending, digest])
    did16 = k >= 16
    if did16:
        cv = _duplex_compress(cv, buf[:16], 64, kind)
        buf = buf[16:]
        k -= 16
    if k or not did16:
        block = jnp.zeros((16,), jnp.uint32).at[:k].set(buf)
        cv = _duplex_compress(cv, block, 4 * k, kind)
    # sample() pops 4 words from the END of the squeeze output (h7 first)
    w = cv[4:8][::-1]
    beta_mont = to_mont(w % jnp.uint32(P))
    return cv, beta_mont, w


@functools.lru_cache(maxsize=None)
def _step_jit(kind: str):
    import jax

    return jax.jit(functools.partial(_step, kind=kind))


def chain_supported(challenger, reps: int) -> bool:
    """True when the device transcript chain can twin this challenger:
    a known compression (real blake3 or the test permutation), a
    single-chunk observe_commitment digest (reps * 32 B <= 1024 B), and
    not disabled via TAPSTARK_DEVICE_CHALLENGER=0."""
    if os.environ.get("TAPSTARK_DEVICE_CHALLENGER") == "0":
        return False
    if type(challenger.compression) not in (Blake3Compression, TestPermutation):
        return False
    return reps * 32 <= 1024


class DeviceTailChain:
    """Device twin of the challenger for the FRI commit-phase loop.

    Snapshot the host challenger's (cv, pending-input) state once, then
    step() per layer with the layer's device-resident roots: returns the
    fold's beta in Montgomery form plus the raw sampled words (fetched
    later by the flush for the host-replay assert). The host challenger
    must not be advanced between steps."""

    def __init__(self, challenger):
        self._kind = (
            "test"
            if isinstance(challenger.compression, TestPermutation)
            else "blake3"
        )
        self._cv = np.array(challenger.cv, dtype=np.uint32)
        self._pending = np.array(challenger.input_buffer, dtype=np.uint32)
        self.steps = 0

    def step(self, roots_dev):
        global TOTAL_STEPS
        jnp = _jnp()
        cv, beta_mont, beta_words = _step_jit(self._kind)(
            jnp.asarray(self._cv), jnp.asarray(self._pending), roots_dev
        )
        self._cv = cv
        self._pending = np.zeros(0, dtype=np.uint32)
        self.steps += 1
        TOTAL_STEPS += 1
        return beta_mont, beta_words
