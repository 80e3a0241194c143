"""Host prime-field tests.

Vector corpus: the reference's exhaustive inverse tables mod 97/53/11
(reference: prime_field_elem.rs:625-800) and its secp256k1-field inverse
check (:812-821), plus algebraic property tests.
"""

import pytest

from zk_toolkit_tpu.fields import PrimeField, PrimeFieldElems
from zk_toolkit_tpu.utils.rng import Rng

pytestmark = pytest.mark.quick

SECP256K1_P = 2**256 - 2**32 - 977


@pytest.mark.parametrize("p", [11, 53, 97])
def test_exhaustive_inverse_tables(p):
    f = PrimeField(p)
    for v in range(1, p):
        inv = f.elem(v).inv()
        assert (inv * v).e == 1
        # cross-check against Fermat
        assert inv.e == pow(v, p - 2, p)


def test_inverse_of_zero_raises():
    f = PrimeField(11)
    with pytest.raises(ZeroDivisionError):
        f.elem(0).inv()


def test_secp256k1_field_inverse():
    f = PrimeField(SECP256K1_P)
    a = f.elem(0xDEADBEEF_12345678_9ABCDEF0_55555555)
    assert (a * a.inv()).e == 1


def test_basic_ops_and_signed():
    f = PrimeField(97)
    assert (f.elem(50) + f.elem(60)).e == 13
    assert (f.elem(5) - f.elem(10)).e == 92
    assert (f.elem(13) * f.elem(15)).e == (13 * 15) % 97
    assert f.elem_from_signed(-1).e == 96
    assert (f.elem(3) ** 5).e == pow(3, 5, 97)
    assert f.elem(5).sq().e == 25
    assert f.elem(2).cube().e == 8
    assert (-f.elem(1)).e == 96
    assert (f.elem(7) / f.elem(7)).e == 1


def test_powers_and_seq():
    f = PrimeField(97)
    powers = f.first_n_powers_of_x(3, 5)
    assert [e.e for e in powers] == [1, 3, 9, 27, 81]
    assert [e.e for e in f.elem(3).pow_seq(4)] == [1, 3, 9, 27]
    assert [e.e for e in f.seq(5, 3)] == [5, 6, 7]
    assert [e.e for e in f.elem(4).repeat(3)] == [4, 4, 4]


def test_rand_elem_deterministic_with_seeded_rng():
    f = PrimeField(97)
    a = f.rand_elem(rng=Rng(42))
    b = f.rand_elem(rng=Rng(42))
    assert a == b
    assert f.rand_elem(exclude_zero=True, rng=Rng(7)).e != 0


def test_elems_vector_ops():
    f = PrimeField(97)
    a = PrimeFieldElems([f.elem(1), f.elem(2), f.elem(3)])
    b = PrimeFieldElems([f.elem(4), f.elem(5), f.elem(6)])
    assert [(x).e for x in (a + b)] == [5, 7, 9]
    assert [(x).e for x in (a * b)] == [4, 10, 18]
    assert a.inner_prod(b).e == (4 + 10 + 18) % 97
    assert a.sum().e == 6
    assert [x.e for x in a.from_(1)] == [2, 3]
    assert [x.e for x in a.to(2)] == [1, 2]
    assert [(x).e for x in (a * f.elem(2))] == [2, 4, 6]
