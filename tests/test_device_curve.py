"""Differential tests: device Jacobian curve kernels vs the host affine
oracle, on secp256k1 and BLS12-381 G1.

Corpus parity: 1G..10G tables (reference secp256k1/affine_point.rs:292-311,
g1_point.rs:315-333), scalar-mul vectors, special-case addition
(infinity/equal/negated inputs — the reference's macros.rs:35-215 case
analysis), and MSM vs the sequential host sum (polynomial.rs:271-293).
"""

import random

import pytest

from zk_toolkit_tpu.curves import secp256k1 as secp
from zk_toolkit_tpu.curves.bls12_381 import g1 as bls_g1, params as bls_params
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops.field_ops import FqOps

CASES = [
    ("secp256k1", secp.P, secp.N, secp.g, secp.infinity),
    ("bls_g1", bls_params.Q, bls_params.R, bls_g1.g, bls_g1.infinity),
]


def host_xy(pt):
    return None if pt.is_zero() else (pt.x.e, pt.y.e)


@pytest.mark.parametrize("name,p,order,gen,inf", CASES, ids=[c[0] for c in CASES])
def test_generator_multiples(name, p, order, gen, inf):
    spec = L.field_spec(p)
    ops = FqOps(spec)
    g = gen()
    pts = C.pack_points([g] * 10, spec)
    ks = C.pack_scalars(list(range(1, 11)), 256)
    got = C.unpack_points(C.scalar_mul(ops, pts, ks, 256), spec)
    want = [host_xy(g * k) for k in range(1, 11)]
    assert got == want


@pytest.mark.parametrize("name,p,order,gen,inf", CASES, ids=[c[0] for c in CASES])
def test_addition_cases(name, p, order, gen, inf):
    spec = L.field_spec(p)
    ops = FqOps(spec)
    rng = random.Random(10)
    g = gen()
    P = g * rng.randrange(1, order)
    Q = g * rng.randrange(1, order)
    pairs = [(P, Q), (P, P), (P, -P), (inf(), P), (P, inf()), (inf(), inf()),
             (Q, -Q + Q), (g, g)]
    a = C.pack_points([x for x, _ in pairs], spec)
    b = C.pack_points([y for _, y in pairs], spec)
    got = C.unpack_points(C.point_add(ops, a, b), spec)
    want = [host_xy(x + y) for x, y in pairs]
    assert got == want


@pytest.mark.parametrize("name,p,order,gen,inf", CASES, ids=[c[0] for c in CASES])
def test_scalar_mul_random(name, p, order, gen, inf):
    spec = L.field_spec(p)
    ops = FqOps(spec)
    rng = random.Random(11)
    g = gen()
    base_pts = [g * rng.randrange(1, order) for _ in range(6)]
    ks = [0, 1, order - 1] + [rng.randrange(order) for _ in range(3)]
    pts = C.pack_points(base_pts, spec)
    scal = C.pack_scalars(ks, 256)
    got = C.unpack_points(C.scalar_mul(ops, pts, scal, 256), spec)
    want = [host_xy(pt * k) for pt, k in zip(base_pts, ks)]
    assert got == want


def test_msm_naive_vs_host():
    spec = L.field_spec(secp.P)
    ops = FqOps(spec)
    rng = random.Random(12)
    g = secp.g()
    n = 13  # non-power-of-two to exercise padding
    base_pts = [g * rng.randrange(1, secp.N) for _ in range(n)]
    ks = [rng.randrange(secp.N) for _ in range(n)]
    pts = C.pack_points(base_pts, spec)
    scal = C.pack_scalars(ks, 256)
    got = C.unpack_points(tuple(a[None] for a in C.msm_naive(ops, pts, scal, 256)), spec)[0]
    acc = secp.infinity()
    for pt, k in zip(base_pts, ks):
        acc = acc + pt * k
    assert got == host_xy(acc)


def test_mixed_add_and_double():
    spec = L.field_spec(secp.P)
    ops = FqOps(spec)
    rng = random.Random(13)
    g = secp.g()
    P = g * rng.randrange(1, secp.N)
    Q = g * rng.randrange(1, secp.N)
    jac = C.pack_points([P, P, P, secp.infinity()], spec)
    qx, qy, qz = C.pack_points([Q, P, secp.infinity(), Q], spec)
    q_inf = C.is_infinity(ops, (qx, qy, qz))
    got = C.unpack_points(C.point_add_mixed(ops, jac, (qx, qy, q_inf)), spec)
    want = [host_xy(P + Q), host_xy(P + P), host_xy(P), host_xy(Q)]
    assert got == want
    # doubling of infinity stays infinity
    dbl = C.unpack_points(C.point_double(ops, C.pack_points([secp.infinity(), P], spec)), spec)
    assert dbl == [None, host_xy(P + P)]
