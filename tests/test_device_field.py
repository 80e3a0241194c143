"""Differential tests: device limb/Montgomery kernels vs the host Python-int
oracle, on all production moduli plus tiny fields.

Corpus parity: the reference's exhaustive inverse tables mod 97/53/11
(prime_field_elem.rs:625-800) run against the device inverse; random
differential sweeps cover add/sub/neg/mul/pow/inv on secp256k1 p & n,
curve25519 q, BLS12-381 q & r.
"""

import random

import numpy as np
import pytest

from zk_toolkit_tpu.ops import limbs as L

SECP_P = 2**256 - 2**32 - 977
SECP_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
ED_Q = 2**255 - 19
BLS_Q = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab", 16)
BLS_R = int("73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16)

MODULI = [97, 11, 53, 3911, SECP_P, SECP_N, ED_Q, BLS_Q, BLS_R]


def rand_elems(p, n, seed):
    rng = random.Random(seed)
    return [rng.randrange(p) for _ in range(n)]


@pytest.mark.parametrize("p", MODULI)
def test_roundtrip_pack_unpack(p):
    spec = L.field_spec(p)
    xs = rand_elems(p, 16, 1)
    a = L.pack(xs, spec)
    assert L.unpack(a, spec) == xs


@pytest.mark.parametrize("p", MODULI)
def test_add_sub_neg(p):
    spec = L.field_spec(p)
    xs = rand_elems(p, 32, 2)
    ys = rand_elems(p, 32, 3)
    a, b = L.pack(xs, spec), L.pack(ys, spec)
    assert L.unpack(L.add_mod(a, b, spec), spec) == [(x + y) % p for x, y in zip(xs, ys)]
    assert L.unpack(L.sub_mod(a, b, spec), spec) == [(x - y) % p for x, y in zip(xs, ys)]
    assert L.unpack(L.neg_mod(a, spec), spec) == [(-x) % p for x in xs]
    # edge values 0, 1, p-1
    e = L.pack([0, 1, p - 1], spec)
    assert L.unpack(L.neg_mod(e, spec), spec) == [0, p - 1, 1]
    assert L.unpack(L.add_mod(e, e, spec), spec) == [0, 2 % p, (2 * p - 2) % p]


@pytest.mark.parametrize("p", MODULI)
def test_mont_mul(p):
    spec = L.field_spec(p)
    xs = rand_elems(p, 64, 4) + [0, 1, p - 1, p // 2]
    ys = rand_elems(p, 64, 5) + [p - 1, 0, p - 1, 2 % p]
    a, b = L.pack(xs, spec), L.pack(ys, spec)
    got = L.unpack(L.mont_mul(a, b, spec), spec)
    assert got == [(x * y) % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("p", [97, SECP_P, BLS_Q, BLS_R])
def test_mont_inv_and_pow(p):
    spec = L.field_spec(p)
    xs = [x for x in rand_elems(p, 16, 6) if x != 0] + [1, p - 1]
    a = L.pack(xs, spec)
    inv = L.unpack(L.mont_inv(a, spec), spec)
    assert inv == [pow(x, -1, p) for x in xs]
    # static pow: x^13
    bits = tuple(int(b) for b in bin(13)[2:])
    got = L.unpack(L.mont_pow_static(a, bits, spec), spec)
    assert got == [pow(x, 13, p) for x in xs]


def test_exhaustive_inverse_tables_on_device():
    # reference prime_field_elem.rs:625-800 corpus
    for p in (11, 53, 97):
        spec = L.field_spec(p)
        xs = list(range(1, p))
        inv = L.unpack(L.mont_inv(L.pack(xs, spec), spec), spec)
        assert inv == [pow(x, -1, p) for x in xs]


def test_dynamic_pow():
    p = BLS_R
    spec = L.field_spec(p)
    xs = rand_elems(p, 8, 7)
    es = rand_elems(1 << 64, 8, 8)
    a = L.pack(xs, spec)
    e_limbs = L.pack([e for e in es], L.field_spec((1 << 64) + 13), mont=False)  # just limb container
    got = L.unpack(L.mont_pow_dynamic(a, e_limbs, spec, 64), spec)
    assert got == [pow(x, e, p) for x, e in zip(xs, es)]


def test_batched_shapes():
    spec = L.field_spec(BLS_R)
    xs = rand_elems(BLS_R, 24, 9)
    a = L.pack(xs, spec).reshape(2, 3, 4, spec.K)
    sq = L.mont_mul(a, a, spec)
    assert sq.shape == (2, 3, 4, spec.K)
    got = L.unpack(sq.reshape(-1, spec.K), spec)
    assert got == [(x * x) % BLS_R for x in xs]
