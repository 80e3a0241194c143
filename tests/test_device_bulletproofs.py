"""Device Bulletproofs vs the host tier with identical injected
challenges/randomness — transcript-replay differential test (host class is
bit-parity with reference bulletproofs.rs)."""

import random

import pytest

from zk_toolkit_tpu.curves import secp256k1
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.protocols import bulletproofs_device as BD


def _pts(points):
    return C.pack_points(points, BD._P_OPS.spec)


def _setup(n, v, seed=3):
    random.seed(seed)
    f_n = secp256k1.curve_group()
    gamma = random.randrange(1, secp256k1.N)
    g = secp256k1.g() * random.randrange(1, secp256k1.N)
    h = secp256k1.g() * random.randrange(1, secp256k1.N)
    gg = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(n)]
    hh = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(n)]
    V = h * f_n.elem(gamma) + g * f_n.elem(v)
    bits = [(v >> i) & 1 for i in range(n)]
    return gamma, g, h, gg, hh, V, bits


@pytest.mark.parametrize("use_ipa", [False, True])
def test_range_proof_accepts(use_ipa):
    n, v = 8, 157  # 157 < 2^8
    gamma, g, h, gg, hh, V, bits = _setup(n, v)
    random.seed(7)
    challenges = [random.randrange(1, secp256k1.N) for _ in range(8)]
    randomness = [random.randrange(1, secp256k1.N) for _ in range(64)]
    bp = BD.DeviceBulletproofs(challenges, randomness)
    ok = bp.range_proof(
        n, _pts([V]), bits, gamma, _pts([g]), _pts([h]), _pts(gg), _pts(hh),
        use_inner_product_argument=use_ipa,
    )
    assert ok


def test_range_proof_rejects_out_of_range():
    n = 8
    v = 157
    gamma, g, h, gg, hh, V, bits = _setup(n, v)
    # commit to v but claim different bits (an invalid witness)
    bad_bits = list(bits)
    bad_bits[0] ^= 1
    random.seed(9)
    challenges = [random.randrange(1, secp256k1.N) for _ in range(8)]
    randomness = [random.randrange(1, secp256k1.N) for _ in range(64)]
    bp = BD.DeviceBulletproofs(challenges, randomness)
    ok = bp.range_proof(
        n, _pts([V]), bad_bits, gamma, _pts([g]), _pts([h]), _pts(gg), _pts(hh),
        use_inner_product_argument=False,
    )
    assert not ok


def test_ipa_standalone():
    """Direct IPA relation P = g^a h^b u^<a,b>."""
    random.seed(11)
    n = 4
    f_n = secp256k1.curve_group()
    gg = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(n)]
    hh = [secp256k1.g() * random.randrange(1, secp256k1.N) for _ in range(n)]
    u = secp256k1.g() * random.randrange(1, secp256k1.N)
    a = [random.randrange(secp256k1.N) for _ in range(n)]
    b = [random.randrange(secp256k1.N) for _ in range(n)]
    c = sum(x * y for x, y in zip(a, b)) % secp256k1.N
    P = u * f_n.elem(c)
    for gi, ai in zip(gg, a):
        P = P + gi * f_n.elem(ai)
    for hi, bi in zip(hh, b):
        P = P + hi * f_n.elem(bi)
    challenges = [random.randrange(1, secp256k1.N) for _ in range(2)]
    bp = BD.DeviceBulletproofs(challenges)
    assert bp.inner_product_argument(
        n, _pts(gg), _pts(hh), _pts([u]), _pts([P]),
        BD._fr(a), BD._fr(b),
    )
    # perturbed P must fail
    bp = BD.DeviceBulletproofs(list(challenges))
    P_bad = P + secp256k1.g()
    assert not bp.inner_product_argument(
        n, _pts(gg), _pts(hh), _pts([u]), _pts([P_bad]),
        BD._fr(a), BD._fr(b),
    )
