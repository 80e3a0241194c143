"""NTT/INTT over BLS12-381 Fr vs a Python-int DFT oracle, plus the coset
quotient identity that powers the device QAP pipeline."""

import random

import pytest

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import ntt as N

R = params.R


def _eval_poly(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


@pytest.mark.parametrize("n", [2, 8, 32])
def test_ntt_matches_dft_oracle(n):
    random.seed(n)
    dom = N.fr_domain(n)
    coeffs = [random.randrange(R) for _ in range(n)]
    dev = L.pack(coeffs, dom.spec)
    evals = L.unpack(N.ntt(dom, dev), dom.spec)
    for j in range(n):
        assert evals[j] == _eval_poly(coeffs, pow(dom.w, j, R)), f"eval {j}"
    back = L.unpack(N.intt(dom, N.ntt(dom, dev)), dom.spec)
    assert back == coeffs


def test_coset_ntt_evaluates_on_coset():
    random.seed(9)
    n = 16
    dom = N.fr_domain(n)
    coeffs = [random.randrange(R) for _ in range(n)]
    dev = L.pack(coeffs, dom.spec)
    evals = L.unpack(N.coset_ntt(dom, dev), dom.spec)
    g = N.FR_GENERATOR
    for j in range(n):
        x = g * pow(dom.w, j, R) % R
        assert evals[j] == _eval_poly(coeffs, x), f"coset eval {j}"
    back = L.unpack(N.coset_intt(dom, N.coset_ntt(dom, dev)), dom.spec)
    assert back == coeffs


def test_quotient_by_vanishing_polynomial():
    """a, b random of degree < n; c = (a*b) mod (x^n - 1). Then
    h = (a*b - c)/(x^n - 1) is exactly the high half of the product
    coefficients — the device coset pipeline must recover it bit-exactly."""
    random.seed(21)
    n = 8
    dom = N.fr_domain(n)
    a = [random.randrange(R) for _ in range(n)]
    b = [random.randrange(R) for _ in range(n)]
    p = [0] * (2 * n - 1)
    for i in range(n):
        for j in range(n):
            p[i + j] = (p[i + j] + a[i] * b[j]) % R
    h_expected = p[n:] + [0]                               # degree <= n-2
    c = [(p[i] + (p[n + i] if n + i < len(p) else 0)) % R for i in range(n)]
    a_ev = [_eval_poly(a, pow(dom.w, j, R)) for j in range(n)]
    b_ev = [_eval_poly(b, pow(dom.w, j, R)) for j in range(n)]
    c_ev = [_eval_poly(c, pow(dom.w, j, R)) for j in range(n)]
    dev = lambda v: L.pack(v, dom.spec)
    out = L.unpack(
        N.h_coset_then_coeffs(dom, dev(a_ev), dev(b_ev), dev(c_ev)), dom.spec
    )
    assert out == h_expected
