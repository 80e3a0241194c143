"""Native host Montgomery engine (native/zkt_host.cpp via ctypes) vs Python
ints — the host-side analog of the reference's mcl FFI backend."""

import random

import numpy as np
import pytest

from zk_toolkit_tpu.native import available, engine


pytestmark = pytest.mark.skipif(not available(), reason="no g++ toolchain")


@pytest.fixture(scope="module")
def eng():
    from zk_toolkit_tpu.curves.bls12_381 import params

    return engine(params.R)


def test_mul_add_sub_inv(eng):
    random.seed(4)
    p = eng.p
    xs = [random.randrange(p) for _ in range(257)]
    ys = [random.randrange(p) for _ in range(257)]
    a, b = eng.from_ints(xs), eng.from_ints(ys)
    assert eng.to_ints(eng.mul(a, b)) == [x * y % p for x, y in zip(xs, ys)]
    assert eng.to_ints(eng.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert eng.to_ints(eng.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert eng.to_ints(eng.inv(a)) == [pow(x, -1, p) for x in xs]
    z = eng.from_ints([0, 5])
    assert eng.to_ints(eng.inv(z)) == [0, pow(5, -1, p)]


def test_pow_table_and_repack(eng):
    p = eng.p
    t = eng.pow_table(7, 64)
    assert eng.to_ints(t) == [pow(7, i, p) for i in range(64)]
    a = eng.from_ints([123456789, p - 1, 0])
    assert np.array_equal(eng.unpack16(eng.repack16(a, 16)), a)


def test_secp_order_engine():
    from zk_toolkit_tpu.curves import secp256k1

    e2 = engine(secp256k1.N)
    random.seed(9)
    xs = [random.randrange(secp256k1.N) for _ in range(64)]
    assert e2.to_ints(e2.inv(e2.from_ints(xs))) == [
        pow(x, -1, secp256k1.N) for x in xs
    ]
