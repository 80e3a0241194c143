"""Polynomial / SparseVec / SparseMatrix tests (reference field/ layer)."""

import pytest

from zk_toolkit_tpu.fields.prime_field import PrimeField
from zk_toolkit_tpu.fields.polynomial import Polynomial
from zk_toolkit_tpu.fields.sparse_vec import SparseVec
from zk_toolkit_tpu.fields.sparse_matrix import SparseMatrix

pytestmark = pytest.mark.quick

F = PrimeField(3911)


def test_polynomial_normalize_and_ops():
    p = Polynomial(F, [1, 2, 0, 0])
    assert p.degree() == 1
    q = Polynomial(F, [3, 1])
    assert (p + q).coeffs[0].e == 4
    assert (p - q).coeffs[0].e == F.elem_from_signed(-2).e
    # (1 + 2x)(3 + x) = 3 + 7x + 2x^2
    assert [c.e for c in (p * q).coeffs] == [3, 7, 2]
    assert p.eval_at(F.elem(5)).e == 11
    assert [v.e for v in p.eval_from_1_to_n(3)] == [3, 5, 7]


def test_polynomial_division_exact_and_remainder():
    # (x-1)(x-2) = 2 - 3x + x^2
    t = Polynomial(F, [2, F.elem_from_signed(-3).e, 1])
    d = Polynomial(F, [F.elem_from_signed(-1).e, 1])  # x - 1
    res = t.divide_by(d)
    assert res.is_exact
    assert [c.e for c in res.quotient.coeffs] == [F.elem_from_signed(-2).e, 1]
    res2 = t.divide_by(Polynomial(F, [F.elem_from_signed(-5).e, 1]))  # x - 5
    assert not res2.is_exact
    # q*d + r == t round trip
    back = res2.quotient * Polynomial(F, [F.elem_from_signed(-5).e, 1]) + res2.remainder
    assert back == t


def test_polynomial_msm_hidings():
    from zk_toolkit_tpu.curves import secp256k1 as s

    # p(x) = 2 + 3x; hidings of x^i: [G, 5G] -> 2*G + 3*(5G) = 17G
    p = Polynomial(s.curve_group(), [2, 3])
    powers = [s.g(), s.g() * 5]
    assert p.eval_with_g1_hidings(powers) == s.g() * 17


def test_sparse_vec():
    v = SparseVec(F, 5)
    v.set(1, 7)
    v.set(3, 2)
    v.set(3, 0)  # zero drops entry
    assert v.indices() == [1]
    assert v.get(3).e == 0
    assert v.sum().e == 7
    v.set(4, 3)
    w = SparseVec.from_dense(F, [0, 2, 0, 0, 5])
    assert (v * w).sum().e == 14 + 15
    assert v.inner_prod(w).e == 29
    assert (v + w).get(1).e == 9
    assert v.slice(1, 4).get(0).e == 7
    assert v.concat(w).size == 10
    assert v.concat(w).get(6).e == 2
    with pytest.raises(IndexError):
        v.get(5)


def test_sparse_matrix():
    rows = [
        SparseVec.from_dense(F, [1, 2, 0]),
        SparseVec.from_dense(F, [0, 0, 3]),
    ]
    m = SparseMatrix.from_rows(rows)
    assert (m.width, m.height) == (3, 2)
    assert m.get(1, 0).e == 2
    t = m.transpose()
    assert (t.width, t.height) == (2, 3)
    assert t.get(0, 1).e == 2
    assert [v.e for v in m.get_column(2).to_dense()] == [0, 3]
    # matrix * vector
    v = SparseVec.from_dense(F, [1, 1, 1])
    assert [x.e for x in (m * v).to_dense()] == [3, 3]
    # matrix * matrix: m (2x3) * t (3x2) -> 2x2
    mt = m * t
    assert mt.get(0, 0).e == 5
    assert mt.get(1, 1).e == 9
    # flatten / multiply_column / row_transform / normalize
    assert m.flatten_rows().get(5).e == 3
    scaled = m.multiply_column(SparseVec.from_dense(F, [2, 3]))
    assert scaled.get(1, 0).e == 4 and scaled.get(2, 1).e == 9
    doubled = m.row_transform(lambda r: r * 2)
    assert doubled.get(0, 0).e == 2
    m2 = SparseMatrix(F, 3, 4)
    m2.set(0, 1, 5)
    norm = m2.normalize()
    assert norm.height == 1 and norm.get(0, 0).e == 5
    # to_polynomials
    polys = m.to_polynomials()
    assert polys[0].eval_at(F.elem(1)).e == 3
