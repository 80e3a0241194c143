"""Batched twisted-Edwards group law on device (curve25519 / Ed25519).

Device counterpart of the host Edwards addition law (curves/curve25519.py,
reference curve25519/affine_point.rs:117-149). Representation is extended
homogeneous coordinates (X, Y, Z, T) with x = X/Z, y = Y/Z, T = XY/Z on
-x^2 + y^2 = 1 + d x^2 y^2 (a = -1), using the HWCD'08 *unified* addition —
one formula for add/double/identity, so unlike the Weierstrass path
(ops/curve_ops.py) there is no case analysis at all, and the identity is the
plain point (0, 1, 1, 0).

Independent field multiplications are stacked into single Montgomery
dispatches like everywhere else in the device tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves import curve25519 as ed
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops.field_ops import FqOps
from zk_toolkit_tpu.utils.bigint import LIMB_BITS, int_to_limbs


@functools.lru_cache(maxsize=1)
def fq_ops() -> FqOps:
    return FqOps(L.field_spec(ed.Q))


@functools.lru_cache(maxsize=1)
def _consts():
    spec = fq_ops().spec
    d = ed.d().e
    d2 = 2 * d % ed.Q

    def mont(v):
        return np.asarray(int_to_limbs(v * spec.r_mod_p % ed.Q, spec.K), dtype=np.uint32)

    return {"d2": mont(d2)}


def identity_like(x):
    """(0, 1, 1, 0) broadcast to the batch shape of limb array x."""
    ops = fq_ops()
    one = ops.one_like(x)
    zero = jnp.zeros_like(x)
    return (zero, one, one, zero)


def point_add(p, q):
    """Unified extended-coordinate addition (a = -1):
    A=(Y1-X1)(Y2-X2), B=(Y1+X1)(Y2+X2), C=2d T1 T2, D=2 Z1 Z2,
    E=B-A, F=D-C, G=D+C, H=B+A; X3=EF, Y3=GH, T3=EH, Z3=FG."""
    ops = fq_ops()
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    d2 = jnp.broadcast_to(jnp.asarray(_consts()["d2"]), t1.shape)
    a, b, c, dd = ops.mul(
        jnp.stack([ops.sub(y1, x1), ops.add(y1, x1), ops.mul(t1, d2), z1]),
        jnp.stack([ops.sub(y2, x2), ops.add(y2, x2), t2, ops.dbl(z2)]),
    )
    e = ops.sub(b, a)
    f = ops.sub(dd, c)
    g = ops.add(dd, c)
    h = ops.add(b, a)
    x3, y3, t3, z3 = ops.mul(
        jnp.stack([e, g, e, f]), jnp.stack([f, h, h, g])
    )
    return (x3, y3, z3, t3)


def select(mask, p, q):
    ops = fq_ops()
    return tuple(ops.select(mask, a, b) for a, b in zip(p, q))


@functools.partial(jax.jit, static_argnums=(2,))
def scalar_mul(p, scalars, nbits: int):
    """Batched double-and-add (MSB-first) with the unified law."""

    def step(acc, i):
        acc = point_add(acc, acc)
        limb = jnp.take(scalars, i // LIMB_BITS, axis=-1)
        bit = (limb >> (i % LIMB_BITS).astype(jnp.uint32)) & jnp.uint32(1)
        added = point_add(acc, p)
        acc = select(bit == 1, added, acc)
        return acc, None

    init = identity_like(p[0])
    acc, _ = jax.lax.scan(step, init, jnp.arange(nbits - 1, -1, -1))
    return acc


@functools.partial(jax.jit)
def to_affine(p):
    """(x, y) affine via batched Fermat inversion of Z."""
    ops = fq_ops()
    x, y, z, _ = p
    zi = ops.inv(z)
    ax, ay = ops.mul(jnp.stack([x, y]), jnp.broadcast_to(zi, (2,) + zi.shape))
    return ax, ay


# -- host conversions -----------------------------------------------------------

def pack_points(pts) -> tuple:
    """Host affine Edwards points ((x, y) ints or AffineEdwardsPoint with
    .x/.y elems) -> device extended coords, Montgomery form."""
    spec = fq_ops().spec
    n = len(pts)
    arrs = [np.zeros((n, spec.K), dtype=np.uint32) for _ in range(4)]

    def mont(v):
        return int_to_limbs(v * spec.r_mod_p % ed.Q, spec.K)

    for i, pt in enumerate(pts):
        if hasattr(pt, "is_zero") and pt.is_zero():
            x, y = 0, 1  # Edwards identity
        elif hasattr(pt, "x"):
            x, y = pt.x.e, pt.y.e
        else:
            x, y = pt
        arrs[0][i] = mont(x)
        arrs[1][i] = mont(y)
        arrs[2][i] = mont(1)
        arrs[3][i] = mont(x * y % ed.Q)
    return tuple(jnp.asarray(a) for a in arrs)


def unpack_points(p) -> list:
    """Device extended coords -> list of (x, y) host ints."""
    spec = fq_ops().spec
    ax, ay = to_affine(p)
    xs = L.unpack(ax, spec)
    ys = L.unpack(ay, spec)
    return list(zip(xs, ys))
