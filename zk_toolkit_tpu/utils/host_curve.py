"""Fast host-side (raw Python int) Jacobian curve arithmetic.

The object host tier (curves/bls12_381/{g1,g2}.py) is reference-parity by
design — affine chord-tangent with a per-add extended-Euclid inverse and a
square-and-multiply written over PrimeFieldElem objects (reference
macros.rs:1-33), which costs ~3 s per G1 scalar multiplication. That is the
*oracle*, not a tool: CRS generation for the multichip dryrun needs ~90
generator multiples and was burning ~280 s of host Python through it.

This module is the throughput host path: inversion-free Jacobian formulas
(dbl-2009-l / add-2007-bl — the same formulas as the device tier,
ops/curve_ops.py) over bare ints / int-pairs, with ONE modular inverse per
to_affine. ~1000x faster per scalar mul; bit-validated against the object
tier in tests/test_aux.py.

Field protocol: a tiny namespace with mul/sq/add/sub/dbl/inv/is_zero over
raw values — int for Fq (G1), (int, int) for Fq2 (G2, u^2 = -1).
Points are (x, y, z) triples; z == 0 (field zero) means infinity.
"""

from __future__ import annotations

import numpy as np

from zk_toolkit_tpu.utils.bigint import int_to_limbs


class FpHost:
    """Raw-int arithmetic mod p."""

    def __init__(self, p: int):
        self.p = p
        self.zero = 0
        self.one = 1

    def mul(self, a, b):
        return a * b % self.p

    def sq(self, a):
        return a * a % self.p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def dbl(self, a):
        return 2 * a % self.p

    def inv(self, a):
        return pow(a, -1, self.p)

    def is_zero(self, a):
        return a == 0


class Fp2Host:
    """(u0, u1) pairs over Fq with u^2 = -1 (bls12_381 Fq2, fq2.rs:134-152
    semantics)."""

    def __init__(self, p: int):
        self.p = p
        self.zero = (0, 0)
        self.one = (1, 0)

    def mul(self, a, b):
        p = self.p
        a0, a1 = a
        b0, b1 = b
        return ((a0 * b0 - a1 * b1) % p, (a0 * b1 + a1 * b0) % p)

    def sq(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        p = self.p
        return ((a[0] + b[0]) % p, (a[1] + b[1]) % p)

    def sub(self, a, b):
        p = self.p
        return ((a[0] - b[0]) % p, (a[1] - b[1]) % p)

    def dbl(self, a):
        p = self.p
        return (2 * a[0] % p, 2 * a[1] % p)

    def inv(self, a):
        p = self.p
        a0, a1 = a
        d = pow(a0 * a0 + a1 * a1, -1, p)
        return (a0 * d % p, -a1 * d % p)

    def is_zero(self, a):
        return a == (0, 0)


def jac_double(F, pt):
    x, y, z = pt
    if F.is_zero(z) or F.is_zero(y):
        return (F.one, F.one, F.zero)
    a = F.sq(x)
    b = F.sq(y)
    c = F.sq(b)
    d = F.dbl(F.sub(F.sub(F.sq(F.add(x, b)), a), c))
    e = F.add(F.dbl(a), a)
    f = F.sq(e)
    x3 = F.sub(f, F.dbl(d))
    c8 = F.dbl(F.dbl(F.dbl(c)))
    y3 = F.sub(F.mul(e, F.sub(d, x3)), c8)
    z3 = F.dbl(F.mul(y, z))
    return (x3, y3, z3)


def jac_add(F, p1, p2):
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    if F.is_zero(z1):
        return p2
    if F.is_zero(z2):
        return p1
    z1z1 = F.sq(z1)
    z2z2 = F.sq(z2)
    u1 = F.mul(x1, z2z2)
    u2 = F.mul(x2, z1z1)
    s1 = F.mul(F.mul(y1, z2), z2z2)
    s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, u1)
    r = F.dbl(F.sub(s2, s1))
    if F.is_zero(h):
        if F.is_zero(r):
            return jac_double(F, p1)
        return (F.one, F.one, F.zero)
    i = F.sq(F.dbl(h))
    j = F.mul(h, i)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.sq(r), j), F.dbl(v))
    y3 = F.sub(F.mul(r, F.sub(v, x3)), F.dbl(F.mul(s1, j)))
    z3 = F.mul(F.dbl(F.mul(z1, z2)), h)
    return (x3, y3, z3)


def jac_mul(F, pt, k: int):
    """k * P, left-to-right double-and-add over raw values."""
    acc = (F.one, F.one, F.zero)
    if k == 0 or F.is_zero(pt[2]):
        return acc
    for bit in bin(k)[2:]:
        acc = jac_double(F, acc)
        if bit == "1":
            acc = jac_add(F, acc, pt)
    return acc


def jac_to_affine(F, pt):
    """(x, y) or None (infinity) — one inverse total."""
    x, y, z = pt
    if F.is_zero(z):
        return None
    zi = F.inv(z)
    zi2 = F.sq(zi)
    return (F.mul(x, zi2), F.mul(y, F.mul(zi2, zi)))


def from_affine(F, xy):
    if xy is None:
        return (F.one, F.one, F.zero)
    return (xy[0], xy[1], F.one)


def multi_mul(F, base_affine, scalars):
    """[k * G for k in scalars] as affine tuples (None = infinity)."""
    base = from_affine(F, base_affine)
    return [jac_to_affine(F, jac_mul(F, base, int(k))) for k in scalars]


# -- device packing (raw ints -> Montgomery limb Jacobian tuples) -------------

def pack_g1_jac(affs, spec):
    """Affine (x, y)/None list -> device Jacobian tuple (x, y, z) uint32[N,K],
    Montgomery form, infinity = (1, 1, 0)."""
    import jax.numpy as jnp

    n = len(affs)
    xs = np.zeros((n, spec.K), dtype=np.uint32)
    ys = np.zeros((n, spec.K), dtype=np.uint32)
    zs = np.zeros((n, spec.K), dtype=np.uint32)
    one = int_to_limbs(spec.r_mod_p, spec.K)
    for i, a in enumerate(affs):
        if a is None:
            xs[i] = one
            ys[i] = one
        else:
            xs[i] = int_to_limbs(a[0] * spec.r_mod_p % spec.p, spec.K)
            ys[i] = int_to_limbs(a[1] * spec.r_mod_p % spec.p, spec.K)
            zs[i] = one
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


def pack_g2_jac(affs, spec):
    """Affine ((x0,x1), (y0,y1))/None list -> device Jacobian tuple with
    Fq2 structure axis: uint32[N, 2, K] each, infinity = (1, 1, 0)."""
    import jax.numpy as jnp

    n = len(affs)
    xs = np.zeros((n, 2, spec.K), dtype=np.uint32)
    ys = np.zeros((n, 2, spec.K), dtype=np.uint32)
    zs = np.zeros((n, 2, spec.K), dtype=np.uint32)
    one = int_to_limbs(spec.r_mod_p, spec.K)
    for i, a in enumerate(affs):
        if a is None:
            xs[i, 0] = one
            ys[i, 0] = one
        else:
            (x0, x1), (y0, y1) = a
            xs[i, 0] = int_to_limbs(x0 * spec.r_mod_p % spec.p, spec.K)
            xs[i, 1] = int_to_limbs(x1 * spec.r_mod_p % spec.p, spec.K)
            ys[i, 0] = int_to_limbs(y0 * spec.r_mod_p % spec.p, spec.K)
            ys[i, 1] = int_to_limbs(y1 * spec.r_mod_p % spec.p, spec.K)
            zs[i, 0] = one
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))
