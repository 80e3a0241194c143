"""Device optimal-ate pairing vs the host oracle — bit-exact differential test
(the cross-implementation pattern of the reference's duplicated mcl suites,
SURVEY.md §4.5)."""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import g1, g2
from zk_toolkit_tpu.curves.bls12_381.optimal_ate import OptimalAtePairing
from zk_toolkit_tpu.ops import pairing_ops as P
from zk_toolkit_tpu.ops.tower_ops import unpack_fq12


def test_device_pairing_matches_host():
    ops = P.bls_pairing_ops()
    spec = ops.f.spec
    ps = [g1.g(), g1.g() * 7, g1.g() * 123456789, g1.infinity()]
    qs = [g2.g(), g2.g() * 11, g2.g() * 987654321, g2.g()]
    pa = P.pack_g1_affine(ps, spec)
    qa = P.pack_g2_affine(qs, spec)
    gt_dev = unpack_fq12(P.pairing_e(ops, pa, qa), spec)
    pair = OptimalAtePairing()
    for i, (p, q) in enumerate(zip(ps, qs)):
        assert gt_dev[i] == pair.e(p, q).e, f"pairing {i} mismatch"


@pytest.mark.slow
def test_device_weil_tate_match_host():
    """Batched naive Weil/Tate (r-1-bit Miller + full final pow) bit-exact
    vs the host object tier (reference pairing.rs:57-100 semantics) —
    VERDICT r2 missing #5."""
    from zk_toolkit_tpu.curves.bls12_381.pairing import Pairing

    ops = P.bls_pairing_ops()
    spec = ops.f.spec
    ps = [g1.g(), g1.g() * 5]
    qs = [g2.g(), g2.g() * 9]
    pa = P.pack_g1_affine(ps, spec)
    qa = P.pack_g2_affine(qs, spec)
    host = Pairing()

    tate_dev = unpack_fq12(P.pairing_tate(ops, pa, qa), spec)
    weil_dev = unpack_fq12(P.pairing_weil(ops, pa, qa), spec)
    for i, (p, q) in enumerate(zip(ps, qs)):
        assert tate_dev[i] == host.tate(p, q).e, f"tate {i} mismatch"
        assert weil_dev[i] == host.weil(p, q).e, f"weil {i} mismatch"


def test_device_pairing_product_check():
    ops = P.bls_pairing_ops()
    spec = ops.f.spec
    # e(aP, Q) * e(-P, aQ) == 1  (bilinearity folded into a product check)
    a = 42
    ps = [[g1.g() * a, -g1.g()], [g1.g() * 3, g1.g()]]
    qs = [[g2.g(), g2.g() * a], [g2.g(), g2.g()]]
    import jax.numpy as jnp

    pa = [P.pack_g1_affine(row, spec) for row in ps]
    qa = [P.pack_g2_affine(row, spec) for row in qs]
    p_b = tuple(jnp.stack([r[i] for r in pa]) for i in range(3))
    q_b = tuple(jnp.stack([r[i] for r in qa]) for i in range(3))
    ok = P.pairing_product_is_one(ops, p_b, q_b)
    assert bool(ok[0]) is True   # bilinear identity holds
    assert bool(ok[1]) is False  # e(3P,Q)*e(P,Q) != 1
