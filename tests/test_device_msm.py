"""Pippenger MSM vs host oracle: window sizes, window batching, edge scalars
(0, 1, n-1), infinity padding. (Replaces the reference's sequential
eval_with_g1_hidings, polynomial.rs:271-293.)"""

import random

import pytest

from zk_toolkit_tpu.curves import secp256k1
from zk_toolkit_tpu.ops import curve_ops as C, limbs as L, msm as M
from zk_toolkit_tpu.ops.field_ops import FqOps

SPEC = L.field_spec(secp256k1.P)
OPS = FqOps(SPEC)


def _case(n, seed):
    random.seed(seed)
    pts = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(n)]
    ks = [random.randrange(0, secp256k1.N) for _ in range(n)]
    if n > 3:
        ks[0], ks[1], ks[2] = 0, 1, secp256k1.N - 1
    expected = secp256k1.infinity()
    for p, k in zip(pts, ks):
        expected = expected + p * k
    exp = None if expected.is_zero() else (expected.x.e, expected.y.e)
    return C.pack_points(pts, SPEC), C.pack_scalars(ks, 256), exp


@pytest.mark.parametrize("n,c,wc", [(16, 4, 1), (16, 4, 8), (16, 8, 32)])
def test_msm_pippenger_variants(n, c, wc):
    pts, scalars, exp = _case(n, seed=n * 31 + c)
    res = M.msm_pippenger(OPS, pts, scalars, 256, c=c, window_chunk=wc)
    out = C.unpack_points(tuple(a[None] for a in res), SPEC)[0]
    assert out == exp


def test_msm_default_window():
    pts, scalars, exp = _case(16, seed=5)
    res = M.msm_pippenger(OPS, pts, scalars, 256)
    out = C.unpack_points(tuple(a[None] for a in res), SPEC)[0]
    assert out == exp


def test_msm_all_same_digit():
    """Adversarial bucket pattern: all scalars equal (single giant run)."""
    random.seed(6)
    pts = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(16)]
    k = random.randrange(1, secp256k1.N)
    expected = secp256k1.infinity()
    for p in pts:
        expected = expected + p * k
    res = M.msm_pippenger(
        OPS, C.pack_points(pts, SPEC), C.pack_scalars([k] * 16, 256), 256,
        c=4, window_chunk=8,
    )
    out = C.unpack_points(tuple(a[None] for a in res), SPEC)[0]
    assert out == (expected.x.e, expected.y.e)
