"""On-TPU validation record for the Pallas SHA-256 compress kernel.

Runs the fully-unrolled Pallas kernel (`hashes/sha256_device.py:
_compress_batch_pallas`) on the real chip against the exact numpy
compression and the lax.scan fallback, then writes PALLAS_SHA_TPU.json —
the driver-visible artifact backing the TPU-only skip in
tests/test_device_commit.py.

Usage: python tools/pallas_sha_tpu_check.py   (requires the axon TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    out = {"backend": backend, "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    if backend != "tpu":
        out["ok"] = False
        out["note"] = "no TPU available; kernel not exercised"
        print(json.dumps(out))
        return

    from tapstark.hashes.sha256_device import (
        IV,
        _compress_batch_pallas,
        _compress_np,
    )

    rng = np.random.default_rng(3)
    n = 4096
    blocks = rng.integers(0, 1 << 32, (n, 16), dtype=np.uint64).astype(np.uint32)
    state = jnp.broadcast_to(jnp.asarray(IV), (n, 8))
    t0 = time.perf_counter()
    dev = np.asarray(_compress_batch_pallas(state, jnp.asarray(blocks)))
    dt = time.perf_counter() - t0
    ref = np.stack([_compress_np(IV.copy(), blocks[i]) for i in range(0, n, 37)])
    got = dev[::37]
    match = bool(np.array_equal(got, ref))
    out["ok"] = match
    out["lanes_checked"] = int(ref.shape[0])
    out["batch"] = n
    out["first_call_s"] = round(dt, 3)
    # steady state at a throughput-representative batch: blocks GENERATED
    # on device (a 2^21-lane host batch would be a ~130 MB relay upload);
    # correctness was already checked exactly above. Jitted, queued reps,
    # one tiny fetch to sync (axon block_until_ready caveat).
    big = 1 << 21
    reps = 4

    @jax.jit
    def gen_and_state():
        b = (
            jnp.arange(big * 16, dtype=jnp.uint32).reshape(big, 16)
            * jnp.uint32(0x9E3779B9)
            ^ jnp.uint32(0xDEADBEEF)
        )
        return jnp.broadcast_to(jnp.asarray(IV), (big, 8)), b

    state_big, blocks_big = gen_and_state()
    fn = jax.jit(_compress_batch_pallas)
    _ = np.asarray(fn(state_big, blocks_big)[0, 0])
    t0 = time.perf_counter()
    outs = [fn(state_big, blocks_big) for _ in range(reps)]
    _ = np.asarray(outs[-1][0, 0])
    out["throughput_batch"] = big
    out["compress_per_s"] = round(big * reps / (time.perf_counter() - t0))

    # fused TapBranch kernel (in-kernel lex sort + both compressions with
    # the constant-folded padding block) vs the two-compress XLA form and
    # the exact host tapbranch_hash
    from tapstark.hashes.sha256 import tapbranch_hash
    from tapstark.hashes.sha256_device import _tapbranch_pallas_wm

    nt = 4096
    d1 = rng.integers(0, 1 << 32, (8, nt), dtype=np.uint64).astype(np.uint32)
    d2 = rng.integers(0, 1 << 32, (8, nt), dtype=np.uint64).astype(np.uint32)
    d2[:, 0] = d1[:, 0]  # equal-pair lane exercises the full compare chain
    fused = np.asarray(_tapbranch_pallas_wm(jnp.asarray(d1), jnp.asarray(d2)))
    tb_ok = True
    for i in range(0, nt, 129):
        b1 = np.ascontiguousarray(d1[:, i].astype(">u4")).tobytes()
        b2 = np.ascontiguousarray(d2[:, i].astype(">u4")).tobytes()
        want = np.frombuffer(tapbranch_hash(b1, b2), dtype=">u4").astype(np.uint32)
        tb_ok &= bool(np.array_equal(fused[:, i], want))
    out["tapbranch_fused_ok"] = tb_ok
    out["tapbranch_lanes_checked"] = len(range(0, nt, 129))
    t0 = time.perf_counter()
    big1 = jnp.asarray(
        (np.arange(8 * big, dtype=np.uint64) * 0x9E3779B9 % (1 << 32)).astype(np.uint32).reshape(8, big)
    )
    big2 = big1 ^ jnp.uint32(0x55555555)
    fn2 = jax.jit(_tapbranch_pallas_wm)
    _ = np.asarray(fn2(big1, big2)[0, 0])
    t0 = time.perf_counter()
    outs2 = [fn2(big1, big2) for _ in range(reps)]
    _ = np.asarray(outs2[-1][0, 0])
    out["tapbranch_nodes_per_s"] = round(big * reps / (time.perf_counter() - t0))
    out["ok"] = bool(out["ok"] and tb_ok)
    print(json.dumps(out))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PALLAS_SHA_TPU.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
