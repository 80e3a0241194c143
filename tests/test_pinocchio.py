"""Pinocchio end-to-end on the flagship circuit
(reference: pinocchio/prover.rs:179-210)."""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.protocols.pinocchio import Prover, CRS, Verifier
from zk_toolkit_tpu.snark import term as T
from zk_toolkit_tpu.utils.rng import Rng

F = params.SUBGROUP


def flagship_witness():
    return {
        T.One(): F.elem(1),
        T.Var("x"): F.elem(3),
        T.Out(): F.elem(35),
        T.TmpVar(1): F.elem(9),
        T.TmpVar(2): F.elem(27),
        T.TmpVar(3): F.elem(8),
        T.TmpVar(4): F.elem(35),
    }


@pytest.mark.slow
def test_pinocchio_prove_and_verify():
    expr = "(x * x * x) + x + 5 == 35"
    prover = Prover(F, expr, flagship_witness())
    crs = CRS(F, prover, rng=Rng(11))
    proof = prover.prove(crs, rng=Rng(22))
    verifier = Verifier()
    assert verifier.verify(proof, crs, prover.witness.io())


@pytest.mark.slow
def test_pinocchio_rejects_wrong_io():
    from zk_toolkit_tpu.fields.sparse_vec import SparseVec

    expr = "(x * x * x) + x + 5 == 35"
    prover = Prover(F, expr, flagship_witness())
    crs = CRS(F, prover, rng=Rng(33))
    proof = prover.prove(crs, rng=Rng(44))
    verifier = Verifier()
    bad_io = SparseVec.from_dense(F, [1, 4, 35])
    assert not verifier.verify(proof, crs, bad_io)
