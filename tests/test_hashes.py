"""Hash layer tests: blake3 vs official vectors, ripemd160 fallback vs
OpenSSL, tagged hashes vs BIP-341 structure."""

import hashlib

import numpy as np

from tapstark.hashes import blake3, hash160, ripemd160, tagged_hash, tapleaf_hash
from tapstark.hashes.blake3 import CHUNK_END, CHUNK_START, ROOT, compress_batch
from tapstark.hashes.ripemd160 import _ripemd160_py


def _tv_input(n: int) -> bytes:
    # Official BLAKE3 test-vector input: bytes 0,1,...,249 repeating.
    return bytes(i % 251 for i in range(n))


def test_blake3_official_vectors():
    vectors = {
        0: "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262",
        1: "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213",
        2: "7b7015bb92cf0b318037702a6cdd81dee41224f734684c2c122cd6359cb1ee63",
    }
    for n, want in vectors.items():
        assert blake3(_tv_input(n)).hex() == want, n


def test_blake3_multi_block_and_chunk_structure():
    # >64B single chunk (multi-block) and >1024B (parent nodes) must at least
    # be self-consistent and length-sensitive.
    seen = set()
    for n in (63, 64, 65, 127, 128, 1023, 1024, 1025, 2048, 3072):
        d = blake3(_tv_input(n))
        assert len(d) == 32
        assert d not in seen
        seen.add(d)


def test_compress_batch_matches_scalar():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, (16, 33), dtype=np.uint64).astype(np.uint32)
    out = compress_batch(np, [words[i] for i in range(16)])
    for b in range(33):
        msg = b"".join(int(words[i, b]).to_bytes(4, "little") for i in range(16))
        want = blake3(msg)
        got = b"".join(int(out[i][b]).to_bytes(4, "little") for i in range(8))
        assert got == want, b


def test_compress_batch_jnp():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    words = rng.integers(0, 1 << 32, (16, 8), dtype=np.uint64).astype(np.uint32)
    out_np = compress_batch(np, [words[i] for i in range(16)])
    out_j = compress_batch(jnp, [jnp.asarray(words[i]) for i in range(16)])
    for i in range(8):
        np.testing.assert_array_equal(np.asarray(out_j[i]), out_np[i])


def test_ripemd160():
    # Standard RIPEMD-160 vectors.
    assert ripemd160(b"").hex() == "9c1185a5c5e9fc54612808977ee8f548b2258d31"
    assert ripemd160(b"abc").hex() == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc"
    # pure-python fallback agrees with OpenSSL on random inputs
    rng = np.random.default_rng(2)
    for n in (0, 1, 55, 56, 63, 64, 65, 200):
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert _ripemd160_py(data) == ripemd160(data), n


def test_hash160():
    data = b"tapstark"
    want = _ripemd160_py(hashlib.sha256(data).digest())
    assert hash160(data) == want


def test_tagged_hash_structure():
    tag = b"TapLeaf"
    msg = b"\x01\x02"
    t = hashlib.sha256(tag).digest()
    want = hashlib.sha256(t + t + msg).digest()
    assert tagged_hash(tag, msg) == want
    # tapleaf hash of a tiny script
    script = b"\x51"  # OP_1
    want_leaf = hashlib.sha256(
        t + t + bytes([0xC0]) + bytes([1]) + script
    ).digest()
    assert tapleaf_hash(script) == want_leaf
