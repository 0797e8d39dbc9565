"""tapstark — a TPU-native STARK proving framework with TapSTARK's capabilities.

A from-scratch JAX/XLA/Pallas implementation of the TapSTARK protocol
(reference: bitlayer-org/tap-stark): a univariate STARK over BabyBear whose
polynomial commitment is a Bitcoin Taptree + Winternitz bit-commitment scheme,
whose Fiat-Shamir challenger is a Blake3 sponge, and which emits a Bitcoin
Script verifier (BitVM2 paradigm).

Layering (TPU-first, by data layout and device boundary — see SURVEY.md §7):

  field      BabyBear / EF4 arithmetic: host scalars (exact ints) +
             device kernels (Montgomery-form uint32 jnp arrays)
  poly       NTT / coset LDE / barycentric interpolation / FRI fold (device)
  hashes     blake3, tagged SHA-256, ripemd160/hash160 (host batch + device)
  challenger Blake3 duplex sponge Fiat-Shamir transcript (host, device grind)
  script     Bitcoin Script serialization + Tapscript interpreter (host)
  commit     Winternitz / bit-commitments / taptree / TCS / TapTreeMmcs (host,
             device-batched hashing)
  fri        FRI low-degree test + TwoAdicFriPcs
  air        AIR protocol, symbolic constraint analysis, constraint folders
  stark      uni-STARK prove / verify
  mesh       multi-chip sharding of NTT / fold / quotient over jax.sharding
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Serve large allocations from the (never-trimmed) heap instead of
    fresh mmaps. The prover allocates/frees multi-GB hash and value arrays
    per phase; with glibc's default 128 KB mmap threshold every cycle
    returns the pages to the OS and re-faults them on the next touch — on
    lazily-faulted VMs (snapshot-restored or ballooned guests) first-touch
    runs at ~10-50 MB/s, dwarfing all compute. Keeping freed blocks on the
    heap makes steady-state allocation reuse warm pages. No-op off glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: 1 GB
        libc.mallopt(-1, 0x7FFFFFFF)  # M_TRIM_THRESHOLD: never trim
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_allocator()
