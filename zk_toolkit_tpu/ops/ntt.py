"""Radix-2 NTT/INTT over BLS12-381 Fr on device — the QAP polynomial engine.

Replaces the reference's O(n^2) per-column Lagrange interpolation
(reference qap/qap.rs `build_polynomial` :33-97) for large constraint systems:
Fr has 2-adicity 32 (r - 1 = 2^32 * odd, params.rs:8-17 value), so any
power-of-two domain up to 2^32 supports radix-2 butterflies. The Groth16 /
Pinocchio device pipeline works in evaluation form over the domain
H = <w_n>; the vanishing polynomial t(x) = x^n - 1 is constant on a coset gH
(t(g w^j) = g^n - 1), which turns the reference's polynomial long division
`p.divide_by(t)` (polynomial.rs:204-238) into one scalar multiplication in
evaluation space.

Shapes: a polynomial/evaluation vector is uint32[n, K] Montgomery limbs
(K = 16 for the 255-bit r). The full log2(n)-stage transform is ONE jitted
executable — with the compact limb kernels (ops/limbs.py) a stage is a single
stacked Montgomery multiply, so the whole graph stays small.

The small bit-exact anchor for the *reference's* interpolation domain
(x = 1..n) stays on the host tier (snark/qap.py); this module is the
throughput path whose outputs are validated against the host NTT oracle and
by end-to-end proof verification.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.utils.bigint import int_to_limbs

#: Smallest generator of Fr* (the standard choice for this field); the
#: 2^32-th root of unity below and all domain roots derive from it.
FR_GENERATOR = 7

R = params.R


def _mont_np(v: int, spec) -> np.ndarray:
    return np.asarray(int_to_limbs(v * spec.r_mod_p % spec.p, spec.K), dtype=np.uint32)


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@dataclasses.dataclass(frozen=True, eq=False)
class NttDomain:
    """Precomputed tables for a size-n (power of two) evaluation domain over
    Fr: per-stage twiddles for forward/inverse DIT butterflies, the
    bit-reversal permutation, n^-1, and coset-shift powers of FR_GENERATOR."""

    n: int

    def __post_init__(self):
        n = self.n
        assert n & (n - 1) == 0 and n >= 2, "domain size must be a power of 2"
        log_n = n.bit_length() - 1
        assert log_n <= 32, "Fr 2-adicity is 32"
        spec = L.field_spec(R)
        object.__setattr__(self, "spec", spec)
        object.__setattr__(self, "log_n", log_n)

        w = pow(FR_GENERATOR, (R - 1) >> log_n, R)   # primitive n-th root
        object.__setattr__(self, "w", w)
        w_inv = pow(w, -1, R)
        n_inv = pow(n, -1, R)

        def stage_tables(root):
            tables = []
            for s in range(1, log_n + 1):
                half = 1 << (s - 1)
                ws = pow(root, n >> s, R)            # primitive 2^s-th root
                tw = np.zeros((half, spec.K), dtype=np.uint32)
                cur = 1
                for j in range(half):
                    tw[j] = _mont_np(cur, spec)
                    cur = cur * ws % R
                tables.append(tw)
            return tuple(tables)

        object.__setattr__(self, "twiddles", stage_tables(w))
        object.__setattr__(self, "inv_twiddles", stage_tables(w_inv))
        object.__setattr__(self, "bitrev", _bit_reverse_perm(n))
        object.__setattr__(self, "n_inv_mont", _mont_np(n_inv, spec))

        def pow_table(base):
            t = np.zeros((n, spec.K), dtype=np.uint32)
            cur = 1
            for i in range(n):
                t[i] = _mont_np(cur, spec)
                cur = cur * base % R
            return t

        g = FR_GENERATOR
        object.__setattr__(self, "coset_pows", pow_table(g))
        object.__setattr__(self, "coset_pows_inv", pow_table(pow(g, -1, R)))
        # t(x) = x^n - 1 on the coset gH is the constant g^n - 1.
        t_coset = (pow(g, n, R) - 1) % R
        object.__setattr__(self, "t_coset_inv_mont", _mont_np(pow(t_coset, -1, R), spec))


@functools.lru_cache(maxsize=None)
def fr_domain(n: int) -> NttDomain:
    return NttDomain(n)


def _dit(dom: NttDomain, x, tables):
    """Iterative decimation-in-time butterflies; bit-reversed input ->
    natural-order output."""
    spec = dom.spec
    n = dom.n
    x = jnp.take(x, jnp.asarray(dom.bitrev), axis=0)
    for s in range(1, dom.log_n + 1):
        half = 1 << (s - 1)
        m = 1 << s
        x = x.reshape(n // m, m, spec.K)
        u = x[:, :half]
        v = L.mont_mul(x[:, half:], jnp.asarray(tables[s - 1])[None], spec)
        x = jnp.concatenate(
            [L.add_mod(u, v, spec), L.sub_mod(u, v, spec)], axis=1
        )
    return x.reshape(n, spec.K)


def dit_rows(dom: NttDomain, x, inverse: bool = False):
    """Row-batched DIT butterflies: transform axis -2 of x[..., n, K] for a
    whole batch of independent rows in one pass. This is the local-transform
    engine of the four-step sharded NTT (parallel/sharded_ntt.py), where each
    device transforms its row block between all_to_all transposes. Natural
    order in, natural order out (bit-reversal internal). No 1/n scaling."""
    spec = dom.spec
    n = dom.n
    assert x.shape[-2] == n
    tables = dom.inv_twiddles if inverse else dom.twiddles
    lead = x.shape[:-2]
    x = jnp.take(x, jnp.asarray(dom.bitrev), axis=-2)
    for s in range(1, dom.log_n + 1):
        half = 1 << (s - 1)
        m = 1 << s
        x = x.reshape(lead + (n // m, m, spec.K))
        u = x[..., :half, :]
        v = L.mont_mul(x[..., half:, :], jnp.asarray(tables[s - 1]), spec)
        x = jnp.concatenate(
            [L.add_mod(u, v, spec), L.sub_mod(u, v, spec)], axis=-2
        )
    return x.reshape(lead + (n, spec.K))


@functools.partial(jax.jit, static_argnums=(0,))
def ntt(dom: NttDomain, coeffs):
    """Coefficients (little-endian degree order, reference polynomial.rs:34
    convention) -> evaluations at w^0..w^(n-1)."""
    return _dit(dom, coeffs, dom.twiddles)


@functools.partial(jax.jit, static_argnums=(0,))
def intt(dom: NttDomain, evals):
    """Evaluations -> coefficients."""
    x = _dit(dom, evals, dom.inv_twiddles)
    return L.mont_mul(x, jnp.asarray(dom.n_inv_mont)[None], dom.spec)


@functools.partial(jax.jit, static_argnums=(0,))
def coset_ntt(dom: NttDomain, coeffs):
    """Evaluations at g*w^j (coset gH): scale coefficient i by g^i, then NTT."""
    scaled = L.mont_mul(coeffs, jnp.asarray(dom.coset_pows), dom.spec)
    return _dit(dom, scaled, dom.twiddles)


@functools.partial(jax.jit, static_argnums=(0,))
def coset_intt(dom: NttDomain, evals):
    x = _dit(dom, evals, dom.inv_twiddles)
    x = L.mont_mul(x, jnp.asarray(dom.n_inv_mont)[None], dom.spec)
    return L.mont_mul(x, jnp.asarray(dom.coset_pows_inv), dom.spec)


def h_coset_then_coeffs(dom: NttDomain, a_ev, b_ev, c_ev):
    """h coefficients from A/B/C evaluations over H:
    h(g w^j) = (A*B - C)(g w^j) * (g^n - 1)^-1, then coset-INTT.
    The device replacement for the reference's build_p + divide_by(t)
    (qap.rs:99-112, polynomial.rs:204-238): division by the vanishing
    polynomial is one constant multiplication on the coset."""
    spec = dom.spec
    ac = intt(dom, a_ev)
    bc = intt(dom, b_ev)
    cc = intt(dom, c_ev)
    a_cs = coset_ntt(dom, ac)
    b_cs = coset_ntt(dom, bc)
    c_cs = coset_ntt(dom, cc)
    ab = L.mont_mul(a_cs, b_cs, spec)
    num = L.sub_mod(ab, c_cs, spec)
    h_cs = L.mont_mul(num, jnp.asarray(dom.t_coset_inv_mont)[None], spec)
    return coset_intt(dom, h_cs)
