"""Differential tests: device tower-field kernels (Fq2/Fq6/Fq12) vs the host
tower oracle (which is itself vector-tested against the reference's exact
decimal fixtures, fq2.rs:161-235, fq6.rs:173-275, fq12.rs:174-329)."""

import random

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.curves.bls12_381.tower import Fq2, Fq6, Fq12, fq1
from zk_toolkit_tpu.ops import tower_ops as T
from zk_toolkit_tpu.ops import limbs as L

SPEC = L.field_spec(params.Q)
F, E2, E6, E12 = T.make_tower(params.Q)


def rand_fq2(rng):
    return Fq2(fq1(rng.randrange(params.Q)), fq1(rng.randrange(params.Q)))


def rand_fq6(rng):
    return Fq6(rand_fq2(rng), rand_fq2(rng), rand_fq2(rng))


def rand_fq12(rng):
    return Fq12(rand_fq6(rng), rand_fq6(rng))


def test_fq2_ops():
    rng = random.Random(20)
    xs = [rand_fq2(rng) for _ in range(6)] + [Fq2.zero(), Fq2.one()]
    ys = [rand_fq2(rng) for _ in range(6)] + [Fq2.one(), Fq2.zero()]
    a, b = T.pack_fq2(xs, SPEC), T.pack_fq2(ys, SPEC)
    assert T.unpack_fq2(E2.mul(a, b), SPEC) == [x * y for x, y in zip(xs, ys)]
    assert T.unpack_fq2(E2.sq(a), SPEC) == [x * x for x in xs]
    assert T.unpack_fq2(E2.add(a, b), SPEC) == [x + y for x, y in zip(xs, ys)]
    assert T.unpack_fq2(E2.sub(a, b), SPEC) == [x - y for x, y in zip(xs, ys)]
    assert T.unpack_fq2(E2.neg(a), SPEC) == [-x for x in xs]
    assert T.unpack_fq2(E2.mul_by_xi(a), SPEC) == [x.reduce() for x in xs]
    assert T.unpack_fq2(E2.conjugate(a), SPEC) == [x.conjugate() for x in xs]
    nz = [x for x in xs if not x.is_zero()]
    an = T.pack_fq2(nz, SPEC)
    assert T.unpack_fq2(E2.inv(an), SPEC) == [x.inv() for x in nz]
    # is_zero mask
    z = T.pack_fq2([Fq2.zero(), Fq2.one()], SPEC)
    assert list(E2.is_zero(z)) == [True, False]


def test_fq6_ops():
    rng = random.Random(21)
    xs = [rand_fq6(rng) for _ in range(4)] + [Fq6.one()]
    ys = [rand_fq6(rng) for _ in range(4)] + [Fq6.one()]
    a, b = T.pack_fq6(xs, SPEC), T.pack_fq6(ys, SPEC)
    assert T.unpack_fq6(E6.mul(a, b), SPEC) == [x * y for x, y in zip(xs, ys)]
    assert T.unpack_fq6(E6.sq(a), SPEC) == [x * x for x in xs]
    assert T.unpack_fq6(E6.add(a, b), SPEC) == [x + y for x, y in zip(xs, ys)]
    assert T.unpack_fq6(E6.mul_by_w(a), SPEC) == [x.reduce() for x in xs]
    assert T.unpack_fq6(E6.inv(a), SPEC) == [x.inv() for x in xs]


def test_fq12_ops():
    rng = random.Random(22)
    xs = [rand_fq12(rng) for _ in range(3)] + [Fq12.one()]
    ys = [rand_fq12(rng) for _ in range(3)] + [Fq12.one()]
    a, b = T.pack_fq12(xs, SPEC), T.pack_fq12(ys, SPEC)
    assert T.unpack_fq12(E12.mul(a, b), SPEC) == [x * y for x, y in zip(xs, ys)]
    assert T.unpack_fq12(E12.sq(a), SPEC) == [x * x for x in xs]
    assert T.unpack_fq12(E12.inv(a), SPEC) == [x.inv() for x in xs]
    assert T.unpack_fq12(E12.conjugate(a), SPEC) == [x.conjugate() for x in xs]
    # mul * inv == one
    prod = E12.mul(a, E12.inv(a))
    assert T.unpack_fq12(prod, SPEC) == [Fq12.one()] * len(xs)


def test_fq2_one_like_and_const():
    rng = random.Random(23)
    a = T.pack_fq2([rand_fq2(rng)], SPEC)
    assert T.unpack_fq2(E2.one_like(a), SPEC) == [Fq2.one()]
    assert T.unpack_fq2(E2.const(5, a), SPEC) == [Fq2.from_int(5)]
    b = T.pack_fq12([rand_fq12(rng)], SPEC)
    assert T.unpack_fq12(E12.one_like(b), SPEC) == [Fq12.one()]
