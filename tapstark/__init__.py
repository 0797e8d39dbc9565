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
