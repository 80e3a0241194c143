"""Aux subsystems: curve registry/config, CRS persistence, profiling spans."""

import logging

import pytest

from zk_toolkit_tpu import config
from zk_toolkit_tpu.utils import profiling

pytestmark = pytest.mark.quick


def test_registry_curves():
    sec = config.curve("secp256k1")
    assert sec.group_order.bit_length() == 256
    assert sec.limbs == 16
    assert sec.field_spec().K == 16
    bls = config.curve("bls12_381_g1")
    assert bls.limbs == 24
    assert bls.scalar_spec().K == 16
    with pytest.raises(KeyError):
        config.curve("nope")


def test_profiling_spans():
    profiling.reset()
    with profiling.timed("unit"):
        pass
    with profiling.trace("unit"):
        pass
    rep = profiling.report()
    assert rep["unit"]["count"] == 2
    profiling.reset()
    assert profiling.report() == {}


def test_crs_roundtrip(tmp_path):
    from zk_toolkit_tpu.curves.bls12_381 import params
    from zk_toolkit_tpu.protocols import groth16_device as GD
    from zk_toolkit_tpu.snark import term as T
    from zk_toolkit_tpu.utils.serialize import save_crs, load_crs
    import numpy as np
    import jax

    F = params.SUBGROUP
    wit = {
        T.One(): F.elem(1), T.Var("x"): F.elem(3), T.Out(): F.elem(35),
        T.TmpVar(1): F.elem(9), T.TmpVar(2): F.elem(27),
        T.TmpVar(3): F.elem(8), T.TmpVar(4): F.elem(35),
    }
    mat = GD.CircuitMatrices.from_expr("(x * x * x) + x + 5 == 35")
    crs = GD.DeviceCRS.from_trapdoor(mat, tau=5, alpha=6, beta=7, gamma=8, delta=9)
    path = str(tmp_path / "crs.npz")
    save_crs(path, crs)
    crs2 = load_crs(path, mat)
    for name in ("g1_alpha", "g1_u", "g2_v", "g1_xt"):
        a = getattr(crs, name)
        b = getattr(crs2, name)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(jax.device_get(x)),
                                  np.asarray(jax.device_get(y))), name
    # proof with the loaded CRS verifies
    prover = GD.DeviceGroth16Prover(mat, wit)
    proof = prover.prove_with_rs(crs2, r=11, s=12)
    assert GD.DeviceGroth16Verifier().verify(proof, crs2, prover.statement())
