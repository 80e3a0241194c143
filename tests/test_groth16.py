"""Groth16 end-to-end: prove + verify on the reference's flagship circuit
(x * x * x) + x + 5 == 35 with witness x = 3
(reference: zktoolkit_based/prover.rs:159-192).
"""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.curves.bls12_381.pairing import Pairing
from zk_toolkit_tpu.protocols.groth16 import Prover, CRS, Verifier
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
def test_groth16_prove_and_verify():
    expr = "(x * x * x) + x + 5 == 35"
    prover = Prover(F, expr, flagship_witness())
    pairing = Pairing()
    crs = CRS(F, prover, pairing, rng=Rng(111))
    proof = prover.prove(crs, rng=Rng(222))
    verifier = Verifier(pairing)
    assert verifier.verify(proof, crs, prover.wires.statement())


@pytest.mark.slow
def test_groth16_rejects_wrong_statement():
    from zk_toolkit_tpu.fields.sparse_vec import SparseVec

    expr = "(x * x * x) + x + 5 == 35"
    prover = Prover(F, expr, flagship_witness())
    pairing = Pairing()
    crs = CRS(F, prover, pairing, rng=Rng(333))
    proof = prover.prove(crs, rng=Rng(444))
    verifier = Verifier(pairing)
    bad_stmt = SparseVec.from_dense(F, [1, 4, 35])  # claims x = 4
    assert not verifier.verify(proof, crs, bad_stmt)
