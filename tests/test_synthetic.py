"""Validity gate for the synthetic R1CS generator feeding the flagship bench.

Round 2 post-mortem: the generator emitted invalid R1CS for n >= ~64 (gates
could sample the Out wire as an operand before its value was patched in), and
nothing caught it before the driver burned a full 2^16 CRS build. These tests
run in <1 s and must stay green for every (n, seed) the bench/dryrun uses.
"""

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.snark.r1cs import R1CS
from zk_toolkit_tpu.snark.synthetic import synthetic_r1cs

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("n", [2, 16, 64, 256, 1024, 4096])
@pytest.mark.parametrize("seed", [0, 2, 7])
def test_synthetic_r1cs_validates(n, seed):
    f = params.SUBGROUP
    tmpl, wit = synthetic_r1cs(f, n, seed=seed)
    r1cs = R1CS.from_tmpl(f, tmpl, wit)
    r1cs.validate()  # raises R1CSValidationError on any broken constraint
    assert len(tmpl.constraints) == n


def test_synthetic_r1cs_pad_wires():
    f = params.SUBGROUP
    tmpl, wit = synthetic_r1cs(f, 64, seed=2, pad_wires_to=8)
    assert len(tmpl.witness) % 8 == 0
    R1CS.from_tmpl(f, tmpl, wit).validate()
