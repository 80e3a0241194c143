"""Quick-tier device-kernel smoke: one cheap compile per kernel family so
the fast gate catches device regressions (VERDICT r2 weak #5: the old quick
tier contained no device coverage at all). Everything here compiles in
seconds even on XLA-CPU at O0 — heavier device paths (pairings, MSM trees,
proofs) live in their own files.
"""

import hashlib
import random

import numpy as np
import pytest

from zk_toolkit_tpu.ops import limbs as L

pytestmark = pytest.mark.quick

BLS_Q = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab", 16)


def test_mont_mul_add_inv_quick():
    spec = L.field_spec(BLS_Q)
    rng = random.Random(7)
    xs = [rng.randrange(BLS_Q) for _ in range(8)]
    ys = [rng.randrange(BLS_Q) for _ in range(8)]
    a = L.pack(xs, spec)
    b = L.pack(ys, spec)
    assert L.unpack(L.mont_mul(a, b, spec), spec) == [
        x * y % BLS_Q for x, y in zip(xs, ys)
    ]
    assert L.unpack(L.add_mod(a, b, spec), spec) == [
        (x + y) % BLS_Q for x, y in zip(xs, ys)
    ]
    assert L.unpack(L.mont_inv(a, spec), spec) == [
        pow(x, -1, BLS_Q) for x in xs
    ]


def test_sha256_batch_quick():
    from zk_toolkit_tpu.ops import sha_ops as S

    msgs = np.stack([
        np.frombuffer(f"quick-{i}".encode().ljust(8), dtype=np.uint8)
        for i in range(4)
    ])
    d = S.sha256_batch(msgs)
    for i in range(4):
        assert bytes(d[i].tobytes()) == hashlib.sha256(
            msgs[i].tobytes()
        ).digest()


def test_point_add_quick():
    """One batched Jacobian add + the infinity/double select paths on
    secp256k1 — the group-law compile the MSM/prove stack rides on."""
    from zk_toolkit_tpu.curves import secp256k1
    from zk_toolkit_tpu.ops import curve_ops as C
    from zk_toolkit_tpu.ops.field_ops import FqOps

    spec = L.field_spec(secp256k1.P)
    ops = FqOps(spec)
    g = secp256k1.g()
    pts = C.pack_points([g, g * 2, g * 3], spec)
    qts = C.pack_points([g, g * 2, secp256k1.infinity()], spec)
    out = C.point_add(ops, pts, qts)
    got = C.unpack_points(out, spec)
    for got_i, want in zip(got, [g * 2, g * 4, g * 3]):
        assert got_i == (want.x.e, want.y.e)
