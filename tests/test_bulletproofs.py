"""Bulletproofs range-proof tests (reference bulletproofs.rs:249-282):
commit to aL = bits of upsilon, prove 0 <= upsilon < 2^n, with and without
the inner-product argument; plus the Fiat-Shamir extension."""

import pytest

from zk_toolkit_tpu.curves import secp256k1
from zk_toolkit_tpu.curves.secp256k1 import AffinePoints
from zk_toolkit_tpu.fields.prime_field import PrimeFieldElems
from zk_toolkit_tpu.protocols.bulletproofs import Bulletproofs
from zk_toolkit_tpu.utils.rng import Rng


def setup_range_proof(n, upsilon, rng):
    f_n = secp256k1.curve_group()
    aL = PrimeFieldElems([f_n.elem((upsilon >> i) & 1) for i in range(n)])
    gamma = f_n.rand_elem(True, rng)
    g = secp256k1.rand_point(True, rng)
    h = secp256k1.rand_point(True, rng)
    gg = AffinePoints.rand_points(n, True, rng)
    hh = AffinePoints.rand_points(n, True, rng)
    upsilon_fe = f_n.elem(upsilon)
    V = h * gamma + g * upsilon_fe
    return V, aL, gamma, g, h, gg, hh


@pytest.mark.parametrize("use_ipa", [False, True])
def test_range_proof_accepts_valid(use_ipa):
    rng = Rng(1000)
    n, upsilon = 4, 9  # 9 = 0b1001 < 2^4
    V, aL, gamma, g, h, gg, hh = setup_range_proof(n, upsilon, rng)
    bp = Bulletproofs(rng=rng)
    assert bp.range_proof(n, V, aL, gamma, g, h, gg, hh, use_ipa)


@pytest.mark.parametrize("use_ipa", [False, True])
def test_range_proof_rejects_wrong_commitment(use_ipa):
    rng = Rng(2000)
    n, upsilon = 4, 9
    V, aL, gamma, g, h, gg, hh = setup_range_proof(n, upsilon, rng)
    bad_V = V + g  # commitment to a different value
    bp = Bulletproofs(rng=rng)
    assert not bp.range_proof(n, bad_V, aL, gamma, g, h, gg, hh, use_ipa)


def test_range_proof_fiat_shamir():
    rng = Rng(3000)
    n, upsilon = 8, 137
    V, aL, gamma, g, h, gg, hh = setup_range_proof(n, upsilon, rng)
    bp = Bulletproofs(rng=rng, fiat_shamir=True)
    assert bp.range_proof(n, V, aL, gamma, g, h, gg, hh, True)


def test_inner_product_argument_direct():
    rng = Rng(4000)
    f_n = secp256k1.curve_group()
    n = 4
    gg = AffinePoints.rand_points(n, True, rng)
    hh = AffinePoints.rand_points(n, True, rng)
    u = secp256k1.rand_point(True, rng)
    a = f_n.rand_elems(n, True, rng)
    b = f_n.rand_elems(n, True, rng)
    P = (gg * a).sum() + (hh * b).sum() + u * (a * b).sum()
    bp = Bulletproofs(rng=rng)
    assert bp.inner_product_argument(n, gg, hh, u, P, a, b)
    # wrong P rejected
    bp2 = Bulletproofs(rng=Rng(4001))
    assert not bp2.inner_product_argument(n, gg, hh, u, P + u, a, b)
