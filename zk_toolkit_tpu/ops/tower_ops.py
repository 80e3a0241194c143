"""Batched BLS12-381 tower-field arithmetic on device: Fq2 / Fq6 / Fq12.

Mirrors the host tower (curves/bls12_381/tower.py — itself bit-exact to the
reference: fq2.rs:26-152, fq6.rs:23-171, fq12.rs:31-152) over Montgomery limb
arrays. Tower structure is expressed as extra trailing axes before the limb
axis:

    Fq1:  uint32[..., K]
    Fq2:  uint32[..., 2, K]        (index 0 = u0, 1 = u1;  u^2 = -1)
    Fq6:  uint32[..., 3, 2, K]     (index i = v_i;         w^3 = xi = 1+u)
    Fq12: uint32[..., 2, 3, 2, K]  (index i = w_i;         z^2 = w)

Each level exposes the same ops protocol as FqOps (mul/sq/add/sub/neg/dbl/
inv/is_zero/select/one_like/...), so the Jacobian group law in
ops/curve_ops.py and the Miller loop in ops/pairing_ops.py are written once
and instantiated per level — the device analog of the reference's
macro-generated sharing (curves/macros.rs).

Multiplications are Karatsuba at every level (3 base muls per Fq2 mul,
6 Fq2 muls per Fq6 mul, 3 Fq6 muls per Fq12 mul = 54 base muls per Fq12
mul vs 36+ of a schoolbook tower) — the per-bit Miller-loop cost sits
directly on this.

TPU-critical batching: at every level the independent sub-multiplications are
*stacked along a new leading axis* and dispatched as ONE call to the level
below, so a full Fq12 mul lowers to exactly one base-field mont_mul over a
54x-stacked batch. This keeps the XLA graph per tower op near-constant
(instead of 54 copies of the ~300-op limb-multiply graph) — which is what
makes Miller-loop scan bodies compilable — and feeds the VPU maximal batch
per dispatch.

Add/sub/neg/select are structure-agnostic (elementwise mod p over the limb
axis), so they delegate straight to the base FqOps regardless of level.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops.field_ops import FqOps
from zk_toolkit_tpu.utils.bigint import int_to_limbs


def _stack(parts, axis):
    return jnp.stack(parts, axis=axis)


@dataclasses.dataclass(frozen=True)
class Fq2Ops:
    """u0 + u1*u over Fq, u^2 = -1 (reference fq2.rs)."""

    base: FqOps
    ndim_struct: int = 2

    @property
    def spec(self):
        return self.base.spec

    # -- structure-agnostic (limbwise mod-p) --
    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def dbl(self, a):
        return self.base.dbl(a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=tuple(range(-self.ndim_struct, 0)))

    def equal(self, a, b):
        return jnp.all(a == b, axis=tuple(range(-self.ndim_struct, 0)))

    def select(self, mask, a, b):
        m = mask
        for _ in range(self.ndim_struct):
            m = m[..., None]
        return jnp.where(m, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def _embed_const(self, c0_int: int, shape_like):
        """Montgomery embed an Fq constant into the c0 slot of this level."""
        k = self.spec.K
        v = c0_int % self.spec.p * self.spec.r_mod_p % self.spec.p
        flat = np.zeros(shape_like.shape[-self.ndim_struct:], dtype=np.uint32)
        flat.reshape(-1, k)[0] = int_to_limbs(v, k)
        return jnp.broadcast_to(jnp.asarray(flat), shape_like.shape)

    def one_like(self, a):
        return self._embed_const(1, a)

    def const(self, value: int, shape_like):
        return self._embed_const(value, shape_like)

    # -- level-specific --
    # Each method stacks its independent base-field products into ONE
    # batched mont_mul (see module docstring).
    def mul(self, a, b):
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        A = _stack([a0, a1, f.add(a0, a1)], axis=0)
        B = _stack([b0, b1, f.add(b0, b1)], axis=0)
        m0, m1, m2 = f.mul(A, B)
        r0 = f.sub(m0, m1)                       # u0*v0 - u1*v1
        r1 = f.sub(f.sub(m2, m0), m1)            # u0*v1 + u1*v0
        return _stack([r0, r1], axis=-2)

    def sq(self, a):
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        # (a0+a1)(a0-a1), a0*a1
        A = _stack([f.add(a0, a1), a0], axis=0)
        B = _stack([f.sub(a0, a1), a1], axis=0)
        r0, m = f.mul(A, B)
        return _stack([r0, f.dbl(m)], axis=-2)

    def inv(self, a):
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        s0, s1 = f.mul(_stack([a0, a1], axis=0), _stack([a0, a1], axis=0))
        fac = f.inv(f.add(s0, s1))
        p0, p1 = f.mul(_stack([a0, a1], axis=0), jnp.broadcast_to(fac, (2,) + fac.shape))
        return _stack([p0, f.neg(p1)], axis=-2)

    def mul_by_xi(self, a):
        """Multiply by xi = 1 + u: (u0 - u1, u0 + u1)
        (reference fq2.rs `reduce` :52-59)."""
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        return _stack([f.sub(a0, a1), f.add(a0, a1)], axis=-2)

    def conjugate(self, a):
        f = self.base
        return _stack([a[..., 0, :], f.neg(a[..., 1, :])], axis=-2)

    def mul_fq1(self, a, s):
        """Multiply by a base-field scalar s: uint32[..., K]."""
        f = self.base
        sb = jnp.broadcast_to(s, (2,) + s.shape)
        p0, p1 = f.mul(_stack([a[..., 0, :], a[..., 1, :]], axis=0), sb)
        return _stack([p0, p1], axis=-2)


@dataclasses.dataclass(frozen=True)
class Fq6Ops:
    """v0 + v1*w + v2*w^2 over Fq2, w^3 = xi (reference fq6.rs)."""

    fq2: Fq2Ops
    ndim_struct: int = 3

    @property
    def spec(self):
        return self.fq2.spec

    add = Fq2Ops.add
    sub = Fq2Ops.sub
    neg = Fq2Ops.neg
    dbl = Fq2Ops.dbl
    is_zero = Fq2Ops.is_zero
    equal = Fq2Ops.equal
    select = Fq2Ops.select
    zero_like = Fq2Ops.zero_like
    _embed_const = Fq2Ops._embed_const
    one_like = Fq2Ops.one_like
    const = Fq2Ops.const

    @property
    def base(self):
        return self.fq2.base

    def _parts(self, a):
        return a[..., 0, :, :], a[..., 1, :, :], a[..., 2, :, :]

    def mul(self, a, b):
        """Karatsuba-3 over Fq2 with xi-folding of the w^3/w^4 terms
        (behavior of fq6.rs:148-171). All 6 Fq2 products in one stacked
        call -> one base mont_mul."""
        e = self.fq2
        a0, a1, a2 = self._parts(a)
        b0, b1, b2 = self._parts(b)
        A = _stack([a0, a1, a2, e.add(a0, a1), e.add(a0, a2), e.add(a1, a2)], axis=0)
        B = _stack([b0, b1, b2, e.add(b0, b1), e.add(b0, b2), e.add(b1, b2)], axis=0)
        m0, m1, m2, k01, k02, k12 = e.mul(A, B)
        s01 = e.sub(e.sub(k01, m0), m1)
        s02 = e.sub(e.sub(k02, m0), m2)
        s12 = e.sub(e.sub(k12, m1), m2)
        r0 = e.add(m0, e.mul_by_xi(s12))
        r1 = e.add(s01, e.mul_by_xi(m2))
        r2 = e.add(s02, m1)
        return _stack([r0, r1, r2], axis=-3)

    def sq(self, a):
        return self.mul(a, a)

    def inv(self, a):
        """(fq6.rs:23-38); the three t-products and the three norm-products
        each batch into one stacked Fq2 mul."""
        e = self.fq2
        a0, a1, a2 = self._parts(a)
        p0, p1, p2, p3, p4, p5 = e.mul(
            _stack([a0, a1, a2, a0, a1, a0], axis=0),
            _stack([a0, a2, a2, a1, a1, a2], axis=0),
        )  # a0^2, a1*a2, a2^2, a0*a1, a1^2, a0*a2
        t0 = e.sub(p0, e.mul_by_xi(p1))
        t1 = e.sub(e.mul_by_xi(p2), p3)
        t2 = e.sub(p4, p5)
        n0, n1, n2 = e.mul(
            _stack([a0, a2, a1], axis=0), _stack([t0, t1, t2], axis=0)
        )
        fac = e.inv(e.add(n0, e.add(e.mul_by_xi(n1), e.mul_by_xi(n2))))
        facb = jnp.broadcast_to(fac, (3,) + fac.shape)
        q0, q1, q2 = e.mul(_stack([t0, t1, t2], axis=0), facb)
        return _stack([q0, q1, q2], axis=-3)

    def mul_by_w(self, a):
        """Multiply by w: (xi*v2, v0, v1) (fq6.rs `reduce` :54-62)."""
        a0, a1, a2 = self._parts(a)
        return _stack([self.fq2.mul_by_xi(a2), a0, a1], axis=-3)

    def mul_fq2(self, a, s):
        """Multiply componentwise by an Fq2 scalar s: uint32[..., 2, K]."""
        e = self.fq2
        a0, a1, a2 = self._parts(a)
        sb = jnp.broadcast_to(s, (3,) + s.shape)
        p0, p1, p2 = e.mul(_stack([a0, a1, a2], axis=0), sb)
        return _stack([p0, p1, p2], axis=-3)


@dataclasses.dataclass(frozen=True)
class Fq12Ops:
    """w0 + w1*z over Fq6, z^2 = w (reference fq12.rs)."""

    fq6: Fq6Ops
    ndim_struct: int = 4

    @property
    def spec(self):
        return self.fq6.spec

    add = Fq2Ops.add
    sub = Fq2Ops.sub
    neg = Fq2Ops.neg
    dbl = Fq2Ops.dbl
    is_zero = Fq2Ops.is_zero
    equal = Fq2Ops.equal
    select = Fq2Ops.select
    zero_like = Fq2Ops.zero_like
    _embed_const = Fq2Ops._embed_const
    one_like = Fq2Ops.one_like
    const = Fq2Ops.const

    @property
    def base(self):
        return self.fq6.base

    def mul(self, a, b):
        s = self.fq6
        a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
        b0, b1 = b[..., 0, :, :, :], b[..., 1, :, :, :]
        A = _stack([a0, a1, s.add(a0, a1)], axis=0)
        B = _stack([b0, b1, s.add(b0, b1)], axis=0)
        m0, m1, m2 = s.mul(A, B)
        r0 = s.add(m0, s.mul_by_w(m1))           # w0*v0 + w*(w1*v1)
        r1 = s.sub(s.sub(m2, m0), m1)            # w0*v1 + w1*v0
        return _stack([r0, r1], axis=-4)

    def sq(self, a):
        return self.mul(a, a)

    def inv(self, a):
        """(fq12.rs:31-40)."""
        s = self.fq6
        a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
        s0, s1 = s.mul(_stack([a0, a1], axis=0), _stack([a0, a1], axis=0))
        norm = s.sub(s0, s.mul_by_w(s1))
        fac = s.inv(norm)
        facb = jnp.broadcast_to(fac, (2,) + fac.shape)
        p0, p1 = s.mul(_stack([a0, a1], axis=0), facb)
        return _stack([p0, s.neg(p1)], axis=-4)

    def conjugate(self, a):
        """z -> -z (the q^6 Frobenius; fq12.rs parity with host
        Fq12.conjugate)."""
        s = self.fq6
        a0, a1 = a[..., 0, :, :, :], a[..., 1, :, :, :]
        return _stack([a0, s.neg(a1)], axis=-4)


def make_tower(p: int):
    """(FqOps, Fq2Ops, Fq6Ops, Fq12Ops) for base modulus p."""
    f = FqOps(L.field_spec(p))
    e2 = Fq2Ops(f)
    e6 = Fq6Ops(e2)
    e12 = Fq12Ops(e6)
    return f, e2, e6, e12


# -- host conversions --------------------------------------------------------

def _mont(v: int, spec) -> list:
    return int_to_limbs(v * spec.r_mod_p % spec.p, spec.K)


def pack_fq2(xs, spec) -> jnp.ndarray:
    """Host Fq2 objects -> uint32[n, 2, K] Montgomery."""
    out = np.zeros((len(xs), 2, spec.K), dtype=np.uint32)
    for i, x in enumerate(xs):
        out[i, 0] = _mont(x.u0.e, spec)
        out[i, 1] = _mont(x.u1.e, spec)
    return jnp.asarray(out)


def pack_fq6(xs, spec) -> jnp.ndarray:
    out = np.zeros((len(xs), 3, 2, spec.K), dtype=np.uint32)
    for i, x in enumerate(xs):
        for j, c in enumerate((x.v0, x.v1, x.v2)):
            out[i, j, 0] = _mont(c.u0.e, spec)
            out[i, j, 1] = _mont(c.u1.e, spec)
    return jnp.asarray(out)


def pack_fq12(xs, spec) -> jnp.ndarray:
    out = np.zeros((len(xs), 2, 3, 2, spec.K), dtype=np.uint32)
    for i, x in enumerate(xs):
        for w, six in enumerate((x.w0, x.w1)):
            for j, c in enumerate((six.v0, six.v1, six.v2)):
                out[i, w, j, 0] = _mont(c.u0.e, spec)
                out[i, w, j, 1] = _mont(c.u1.e, spec)
    return jnp.asarray(out)


def unpack_fq2(a, spec) -> list:
    """uint32[..., 2, K] -> host Fq2 objects (flattened batch)."""
    from zk_toolkit_tpu.curves.bls12_381.tower import Fq2, fq1

    ints = L.unpack(a.reshape(-1, spec.K), spec)
    out = []
    for i in range(0, len(ints), 2):
        out.append(Fq2(fq1(ints[i + 1]), fq1(ints[i])))
    return out


def unpack_fq6(a, spec) -> list:
    from zk_toolkit_tpu.curves.bls12_381.tower import Fq6

    fq2s = unpack_fq2(a.reshape(-1, 2, spec.K), spec)
    return [Fq6(fq2s[i + 2], fq2s[i + 1], fq2s[i]) for i in range(0, len(fq2s), 3)]


def unpack_fq12(a, spec) -> list:
    from zk_toolkit_tpu.curves.bls12_381.tower import Fq12

    fq6s = unpack_fq6(a.reshape(-1, 3, 2, spec.K), spec)
    return [Fq12(fq6s[i + 1], fq6s[i]) for i in range(0, len(fq6s), 2)]
