"""zk_toolkit_tpu — a TPU-native zero-knowledge cryptography framework.

A brand-new JAX/XLA/Pallas implementation of the full capability surface of the
exfinen/zk-toolkit reference library (see SURVEY.md): prime fields, BLS12-381
tower fields and pairing, secp256k1 / curve25519 / BLS12-381 group operations,
SHA-256/512 + HMAC, ECDSA / Ed25519 / BLS signatures, the equation-parser ->
gates -> R1CS -> QAP SNARK frontend, and the Groth16 / Pinocchio / Bulletproofs
protocols.

Architecture (two tiers, mirroring the reference's pure-Rust vs. mcl-C++ split,
reference: src/building_block/mcl/ vs src/building_block/field/):

- **host tier**: exact Python-int arithmetic used for protocol control flow,
  small fixed-cost steps, and as the differential-testing oracle for every
  kernel. This plays the role of the reference's pure-Rust layer.
- **device tier** (`zk_toolkit_tpu.ops`): batched 16-bit-limb Montgomery
  arithmetic in uint32 lanes, curve kernels, Pippenger MSM, NTT, SHA-2 —
  jit-compiled for TPU, shardable over a `jax.sharding.Mesh`
  (`zk_toolkit_tpu.parallel`). This plays the role of the reference's
  mcl C++ backend, but TPU-native.
"""

__version__ = "0.1.0"

from zk_toolkit_tpu.fields.prime_field import PrimeField, PrimeFieldElem, PrimeFieldElems
