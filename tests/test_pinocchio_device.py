"""Device Pinocchio end-to-end on the reference's flagship circuit
(pinocchio/prover.rs:179-210 analog), all verifier pairings in one batched
Miller product."""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.protocols import groth16_device as GD
from zk_toolkit_tpu.protocols import pinocchio_device as PD
from zk_toolkit_tpu.snark import term as T

F = params.SUBGROUP

TRAPDOOR = dict(r_v=3, r_w=5, alpha_v=7, alpha_w=11, alpha_y=13, beta=17,
                gamma=19, s=23456789)


def witness_map():
    return {
        T.One(): F.elem(1),
        T.Var("x"): F.elem(3),
        T.Out(): F.elem(35),
        T.TmpVar(1): F.elem(9),
        T.TmpVar(2): F.elem(27),
        T.TmpVar(3): F.elem(8),
        T.TmpVar(4): F.elem(35),
    }


@pytest.fixture(scope="module")
def setup():
    mat = GD.CircuitMatrices.from_expr("(x * x * x) + x + 5 == 35")
    crs = PD.DevicePinocchioCRS.from_trapdoor(mat, **TRAPDOOR)
    prover = PD.DevicePinocchioProver(mat, witness_map())
    proof = prover.prove_with_deltas(crs, delta_v=424243, delta_y=535354)
    return mat, crs, prover, proof


def test_prove_and_verify(setup):
    mat, crs, prover, proof = setup
    assert PD.DevicePinocchioVerifier().verify(proof, crs, prover.statement())


def test_wrong_io_rejected(setup):
    mat, crs, prover, proof = setup
    bad = list(prover.statement())
    bad[-1] = (bad[-1] + 1) % params.R
    assert not PD.DevicePinocchioVerifier().verify(proof, crs, bad)
