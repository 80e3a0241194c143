"""BLS12-381 parameters.

Parity: reference curves/bls12_381/params.rs:8-30 — base prime field q
(381-bit), subgroup order r (255-bit), embedding degree 12.
"""

from zk_toolkit_tpu.fields.prime_field import PrimeField

#: Base field modulus q (381 bits)
Q = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
#: Subgroup order r (255 bits); 2-adicity 32 (r - 1 = 2^32 * odd), which is
#: what makes radix-2 NTT over Fr possible for the QAP pipeline.
R = int("73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16)

EMBEDDING_DEGREE = 12

#: BLS parameter x (the curve was generated from x = -0xd201000000010000);
#: used by the optimal-ate fast path (device tier).
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

BASE_PRIME_FIELD = PrimeField(Q)
SUBGROUP = PrimeField(R)


def base_prime_field() -> PrimeField:
    return BASE_PRIME_FIELD


def subgroup() -> PrimeField:
    return SUBGROUP


def embedding_degree() -> int:
    return EMBEDDING_DEGREE
