"""SNARK frontend tests: parser, gates, R1CS, QAP.

Corpus: reference gate.rs tests (x + 4 == 9 lowering), the flagship circuit
(x * x * x) + x + 5 == 35 with witness x = 3
(zktoolkit_based/prover.rs:159-192), and QAP divisibility checks
(qap.rs tests).
"""

import pytest

from zk_toolkit_tpu.fields.prime_field import PrimeField
from zk_toolkit_tpu.fields.sparse_vec import SparseVec
from zk_toolkit_tpu.snark import term as T
from zk_toolkit_tpu.snark.equation_parser import EquationParser, Add, Sub, Mul, Div, VarExpr, NumExpr
from zk_toolkit_tpu.snark import gate as gate_mod
from zk_toolkit_tpu.snark.r1cs import R1CSTmpl, R1CS, R1CSValidationError
from zk_toolkit_tpu.snark import qap as qap_mod

pytestmark = pytest.mark.quick

F = PrimeField(3911)


def test_parser_simple_add():
    eq = EquationParser.parse(F, "x + 4 == 9")
    assert isinstance(eq.lhs, Add)
    assert eq.lhs.signal_id == 1
    assert isinstance(eq.lhs.left, VarExpr) and eq.lhs.left.name == "x"
    assert isinstance(eq.lhs.right, NumExpr) and eq.lhs.right.n.e == 4
    assert eq.rhs.e == 9


def test_parser_flagship_shape():
    eq = EquationParser.parse(F, "(x * x * x) + x + 5 == 35")
    lhs = eq.lhs
    # outer: Add(4, Mul(2, x, Mul(1, x, x)), Add(3, x, 5))
    assert isinstance(lhs, Add) and lhs.signal_id == 4
    m = lhs.left
    assert isinstance(m, Mul) and m.signal_id == 2
    assert isinstance(m.right, Mul) and m.right.signal_id == 1
    a = lhs.right
    assert isinstance(a, Add) and a.signal_id == 3


def test_parser_negative_and_spaces():
    eq = EquationParser.parse(F, "  x *  -3 ==  -6 ")
    assert eq.rhs.e == F.elem_from_signed(-6).e
    assert isinstance(eq.lhs, Mul)
    assert eq.lhs.right.n.e == F.elem_from_signed(-3).e


def test_parser_chain_right_grouping_quirk():
    # reference quirk: a - b - c parses as a - (b - c)
    eq = EquationParser.parse(F, "a - b - c == 0")
    lhs = eq.lhs
    assert isinstance(lhs, Sub)
    assert isinstance(lhs.right, Sub)
    assert isinstance(lhs.left, VarExpr) and lhs.left.name == "a"


def test_parser_errors():
    with pytest.raises(ValueError):
        EquationParser.parse(F, "x + == 9")
    with pytest.raises(ValueError):
        EquationParser.parse(F, "x + 4 = 9")
    with pytest.raises(ValueError):
        EquationParser.parse(F, "x + 4 == y")


def test_gate_build_add():
    eq = EquationParser.parse(F, "x + 4 == 9")
    gates = gate_mod.build(F, eq)
    assert len(gates) == 2
    assert gates[0].a == T.Sum(T.Var("x"), T.Num(F.elem(4)))
    assert gates[0].b == T.One()
    assert gates[0].c == T.TmpVar(1)
    assert gates[1].a == T.TmpVar(1)
    assert gates[1].c == T.Out()


def test_gate_build_sub():
    eq = EquationParser.parse(F, "x - 4 == 9")
    gates = gate_mod.build(F, eq)
    assert len(gates) == 2
    # (4 + t1) * 1 = x
    assert gates[0].a == T.Sum(T.Num(F.elem(4)), T.TmpVar(1))
    assert gates[0].c == T.Var("x")


def test_gate_build_div():
    eq = EquationParser.parse(F, "x / 2 == 5")
    gates = gate_mod.build(F, eq)
    # 2 * t1 = x
    assert gates[0].a == T.Num(F.elem(2))
    assert gates[0].b == T.TmpVar(1)
    assert gates[0].c == T.Var("x")


def flagship_r1cs():
    eq = EquationParser.parse(F, "(x * x * x) + x + 5 == 35")
    gates = gate_mod.build(F, eq)
    tmpl = R1CSTmpl(F, gates)
    witness = {
        T.One(): F.elem(1),
        T.Var("x"): F.elem(3),
        T.Out(): F.elem(35),
        T.TmpVar(1): F.elem(9),
        T.TmpVar(2): F.elem(27),
        T.TmpVar(3): F.elem(8),
        T.TmpVar(4): F.elem(35),
    }
    r1cs = R1CS.from_tmpl(F, tmpl, witness)
    return tmpl, r1cs


def test_r1cs_flagship_layout_and_validation():
    tmpl, r1cs = flagship_r1cs()
    # witness layout: [1, x, Out, t1..t4]
    assert tmpl.witness[0] == T.One()
    assert tmpl.witness[1] == T.Var("x")
    assert tmpl.witness[2] == T.Out()
    assert tmpl.mid_beg == 3
    assert len(tmpl.witness) == 7
    assert len(tmpl.constraints) == 5
    r1cs.validate()  # must not raise


def test_r1cs_bad_witness_rejected():
    eq = EquationParser.parse(F, "(x * x * x) + x + 5 == 35")
    gates = gate_mod.build(F, eq)
    tmpl = R1CSTmpl(F, gates)
    bad = {
        T.One(): F.elem(1),
        T.Var("x"): F.elem(2),  # wrong x
        T.Out(): F.elem(35),
        T.TmpVar(1): F.elem(9),
        T.TmpVar(2): F.elem(27),
        T.TmpVar(3): F.elem(8),
        T.TmpVar(4): F.elem(35),
    }
    r1cs = R1CS.from_tmpl(F, tmpl, bad)
    with pytest.raises(R1CSValidationError):
        r1cs.validate()
    # missing term
    with pytest.raises(R1CSValidationError):
        R1CS.from_tmpl(F, tmpl, {T.One(): F.elem(1)})


def test_qap_build_and_divisibility():
    tmpl, r1cs = flagship_r1cs()
    qap = qap_mod.QAP.build(F, r1cs)
    assert qap.is_valid(r1cs.witness, qap.num_constraints)
    # perturbed witness must fail divisibility
    bad = SparseVec(F, r1cs.witness.size)
    for i in range(r1cs.witness.size):
        bad.set(i, r1cs.witness.get(i))
    bad.set(1, F.elem(7))
    assert not qap.is_valid(bad, qap.num_constraints)


def test_qap_lagrange_polynomials_hit_targets():
    vals = SparseVec.from_dense(F, [3, 0, 2, 7])
    p = qap_mod.build_polynomial(F, vals)
    for i in range(4):
        assert p.eval_at(F.elem(i + 1)) == vals.get(i)


def test_build_t_roots():
    t = qap_mod.build_t(F, 5)
    for i in range(1, 6):
        assert t.eval_at(F.elem(i)).is_zero()
    assert not t.eval_at(F.elem(6)).is_zero()
    assert t.degree() == 5


def test_circuits_helpers():
    from zk_toolkit_tpu.snark.circuits import (
        half_adder, full_adder, Number, BLeaf, BXor, BAnd, BOr,
        eval_bool, bool_to_arith, eval_arith,
    )

    assert (half_adder(True, True).sum, half_adder(True, True).carry) == (False, True)
    assert (full_adder(True, True, True).sum, full_adder(True, True, True).carry) == (True, True)
    n = Number(5)
    assert n.bits[0] and not n.bits[1] and n.bits[2]
    assert Number(-1).bits[63]
    f = PrimeField(97)
    for a in (False, True):
        for b in (False, True):
            for Op in (BAnd, BXor, BOr):
                c = Op(BLeaf(a), BLeaf(b))
                assert eval_arith(bool_to_arith(f, c)).e == int(eval_bool(c))
