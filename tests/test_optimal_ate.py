"""Host optimal-ate pairing (the mcl-equivalent fast path) tests.

The reference's mcl backend exposes `Pairing::e` as an optimal ate pairing
(reference mcl/pairing.rs:9-18) and cross-checks it against the pure path via
the duplicated protocol suites (SURVEY.md §4.5). Here the host optimal-ate is
validated algebraically (bilinearity, order, non-degeneracy — mirroring
reference pairing.rs:107-196) and against the full-pow final exponentiation;
the device path (tests/test_device_pairing.py) is then checked bit-exactly
against this oracle.
"""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import g1, g2, params
from zk_toolkit_tpu.curves.bls12_381 import optimal_ate as oa
from zk_toolkit_tpu.curves.bls12_381.tower import Fq12, Fq2, Fq6, fq1


def _rand_fq12():
    vals = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41]
    it = iter(vals)
    def f2():
        return Fq2(fq1(next(it)), fq1(next(it)))
    return Fq12(Fq6(f2(), f2(), f2()), Fq6(f2(), f2(), f2()))


def test_frobenius_constants():
    f = _rand_fq12()
    assert oa.frobenius(f, 1) == f.pow(params.Q)
    assert oa.frobenius(f, 2) == f.pow(params.Q**2)
    assert oa.frobenius(f, 3) == f.pow(params.Q**3)


def test_hard_part_identity():
    u = -params.BLS_X
    h = (params.Q**4 - params.Q**2 + 1) // params.R
    assert 3 * h == (u - 1) ** 2 * (u + params.Q) * (u**2 + params.Q**2 - 1) + 3


def test_final_exp_matches_full_pow():
    m = oa.miller_loop(g1.g(), g2.g())
    full = m.pow(3 * ((params.Q**12 - 1) // params.R))
    assert oa.final_exp(m) == full


def test_bilinearity_and_order():
    pair = oa.OptimalAtePairing()
    p, q = g1.g(), g2.g()
    e1 = pair.e(p, q)
    assert pair.e(p + p, q).e == e1.e * e1.e
    assert pair.e(p, q + q).e == e1.e * e1.e
    a, b = 1234, 777
    assert pair.e(p * a, q * b).e == e1.e.pow(a * b % params.R)
    assert e1.e != Fq12.one()
    assert e1.e.pow(params.R) == Fq12.one()


def test_infinity_inputs():
    pair = oa.OptimalAtePairing()
    assert pair.e(g1.infinity(), g2.g()).e == Fq12.one()
    assert pair.e(g1.g(), g2.infinity()).e == Fq12.one()
