"""Batched short-Weierstrass (a=0) group law in Jacobian coordinates.

Device-tier replacement for the reference's affine chord-tangent macros
(reference: curves/macros.rs `impl_affine_add!` :35-215,
`impl_scalar_mul_point!` :1-33, `impl_jacobian_add!` :218-300): the affine law
needs a field inversion *per addition* — hopeless on TPU — so everything here
is inversion-free Jacobian (dbl-2009-l / add-2007-bl, the same formulas the
reference's dead Jacobian module names) with branch-free `select` case
handling, batched over a leading axis and generic over the coordinate field
via a field-ops namespace (FqOps for secp256k1/G1, Fq2Ops for G2).

Point representation: a `(x, y, z)` tuple of Montgomery limb arrays;
infinity ⇔ z == 0 (canonically (1, 1, 0) in Montgomery form). Scalars are
plain (non-Montgomery) 16-bit limb arrays, uint32[..., S].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops.field_ops import FqOps
from zk_toolkit_tpu.utils.bigint import LIMB_BITS, int_to_limbs


# -- point helpers -----------------------------------------------------------

def select_point(ops, mask, p, q):
    """Per-element point select: p where mask else q."""
    return tuple(ops.select(mask, a, b) for a, b in zip(p, q))


def infinity_like(ops, p):
    """(1, 1, 0) in Montgomery form, shaped like point p."""
    one = ops.one_like(p[0])
    return (one, one, ops.zero_like(p[2]))


def is_infinity(ops, p):
    return ops.is_zero(p[2])


def point_neg(ops, p):
    x, y, z = p
    return (x, ops.neg(y), z)


# -- group law (a = 0) -------------------------------------------------------

# Independent field multiplications within each formula are STACKED along a
# new leading axis and dispatched as one call — the same trick the tower
# (ops/tower_ops.py) uses. A point add is 3 stacked-mul + 2 stacked-sq
# instances instead of 16 inlined Montgomery multiplies: ~4x smaller XLA
# graphs (these formulas are inlined into every scan body and MSM tree level)
# and wider VPU batches per dispatch.

def _s(*xs):
    return jnp.stack(xs, axis=0)


# Fused-kernel dispatch: for base-field ops (FqOps) at real batch sizes on
# accelerator backends, the whole group law runs as ONE Pallas kernel on
# [K, block] VMEM tiles (ops/curve_kernels.py — measured 4-6x over the
# XLA-composed formulas, whose [batch, 24] layouts idle 80% of the VPU
# lanes). CPU lowerings and tower-field ops keep the XLA path; the platform
# choice happens at lowering time, so one trace serves mixed-platform
# programs, and tests/test_pallas_parity.py asserts bit-identity.

def _use_fused_law(ops, *pts):
    import os

    if os.environ.get("ZKT_NO_PA_KERNEL"):
        return False
    if getattr(ops, "ndim_struct", 1) != 1 or not hasattr(ops, "spec"):
        return False
    shapes = {a.shape for p in pts for a in p}
    if len(shapes) != 1:
        return False
    batch = int(np.prod(next(iter(shapes))[:-1]) or 1)
    return batch >= 256


@functools.partial(jax.jit, static_argnums=(0,))
def _point_double_dispatch(ops, x, y, z):
    """jit-wrapped platform dispatch: the Pallas kernel (whose trace builds
    ~5k equations per instance) and the platform cond are traced ONCE per
    shape process-wide — inlining them at every group-law instance made
    tracing/lowering of big MSM modules explode (round-5 regression)."""
    from zk_toolkit_tpu.ops import curve_kernels as CK

    def _fused(*xs):
        return CK.point_double_fused(tuple(xs), ops.spec)

    def _xla(*xs):
        return _point_double_formula(ops, tuple(xs))

    return jax.lax.platform_dependent(x, y, z, cpu=_xla, default=_fused)


def point_double(ops, p):
    if _use_fused_law(ops, p):
        return _point_double_dispatch(ops, *p)
    return _point_double_formula(ops, p)


def _point_double_formula(ops, p):
    """dbl-2009-l for y^2 = x^3 + b. Y=0 and Z=0 inputs both yield Z3=0 —
    no case analysis needed (reference's affine tangent/y=0 branches,
    macros.rs:131-163, collapse into the formula)."""
    x, y, z = p
    a, b = ops.sq(_s(x, y))
    e = ops.add(ops.dbl(a), a)
    c, g, f = ops.sq(_s(b, ops.add(x, b), e))
    d = ops.dbl(ops.sub(ops.sub(g, a), c))
    x3 = ops.sub(f, ops.dbl(d))
    c8 = ops.dbl(ops.dbl(ops.dbl(c)))
    t1, z3h = ops.mul(_s(e, y), _s(ops.sub(d, x3), z))
    y3 = ops.sub(t1, c8)
    z3 = ops.dbl(z3h)
    return (x3, y3, z3)


@functools.partial(jax.jit, static_argnums=(0,))
def _point_add_dispatch(ops, x1, y1, z1, x2, y2, z2):
    from zk_toolkit_tpu.ops import curve_kernels as CK

    def _fused(*xs):
        return CK.point_add_fused(tuple(xs[:3]), tuple(xs[3:]), ops.spec)

    def _xla(*xs):
        return _point_add_formula(ops, tuple(xs[:3]), tuple(xs[3:]))

    return jax.lax.platform_dependent(x1, y1, z1, x2, y2, z2,
                                      cpu=_xla, default=_fused)


def point_add(ops, p, q):
    if _use_fused_law(ops, p, q):
        return _point_add_dispatch(ops, *p, *q)
    return _point_add_formula(ops, p, q)


def _point_add_formula(ops, p, q):
    """Complete add: add-2007-bl with branch-free handling of
    P=∞ / Q=∞ / P=Q (double) / P=-Q (→ ∞, automatic via H=0 ⇒ Z3=0).
    Mirrors the reference's exhaustive affine case analysis
    (macros.rs:35-215) without branches."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1, z2z2 = ops.sq(_s(z1, z2))
    u1, u2, a, b, zz = ops.mul(
        _s(x1, x2, y1, y2, z1), _s(z2z2, z1z1, z2, z1, z2)
    )
    s1, s2 = ops.mul(_s(a, b), _s(z2z2, z1z1))
    h = ops.sub(u2, u1)
    r = ops.dbl(ops.sub(s2, s1))
    i, rr = ops.sq(_s(ops.dbl(h), r))
    j, v = ops.mul(_s(h, u1), _s(i, i))
    x3 = ops.sub(ops.sub(rr, j), ops.dbl(v))
    t1, t2, z3h = ops.mul(_s(r, s1, h), _s(ops.sub(v, x3), j, zz))
    y3 = ops.sub(t1, ops.dbl(t2))
    z3 = ops.dbl(z3h)
    out = (x3, y3, z3)

    same_x = ops.is_zero(h)
    same_y = ops.is_zero(r)
    out = select_point(ops, same_x & same_y, _point_double_formula(ops, p), out)
    out = select_point(ops, is_infinity(ops, q), p, out)
    out = select_point(ops, is_infinity(ops, p), q, out)
    return out


def point_add_mixed(ops, p, q_affine):
    """madd-2007-bl: add an affine (z=1) point — saves ~4 muls. `q_affine`
    is (x2, y2, inf_mask) with inf_mask bool[...batch]."""
    x1, y1, z1 = p
    x2, y2, q_inf = q_affine
    z1z1 = ops.sq(z1)
    u2, a = ops.mul(_s(x2, y2), _s(z1z1, z1))
    s2 = ops.mul(a, z1z1)
    h = ops.sub(u2, x1)
    r = ops.dbl(ops.sub(s2, y1))
    i, rr = ops.sq(_s(ops.dbl(h), r))
    j, v = ops.mul(_s(h, x1), _s(i, i))
    x3 = ops.sub(ops.sub(rr, j), ops.dbl(v))
    t1, t2, z3h = ops.mul(_s(r, y1, h), _s(ops.sub(v, x3), j, z1))
    y3 = ops.sub(t1, ops.dbl(t2))
    z3 = ops.dbl(z3h)
    out = (x3, y3, z3)

    same_x = ops.is_zero(h)
    same_y = ops.is_zero(r)
    out = select_point(ops, same_x & same_y, point_double(ops, p), out)
    one = ops.one_like(x2)
    out = select_point(ops, is_infinity(ops, p), (x2, y2, one), out)
    out = select_point(ops, q_inf, p, out)
    return out


# -- scalar multiplication ---------------------------------------------------

def _scalar_bit(scalars, i):
    """Bit i (0 = LSB) of each batched scalar limb-vector, uint32[...batch]."""
    limb = jnp.take(scalars, i // LIMB_BITS, axis=-1)
    return (limb >> (i % LIMB_BITS).astype(jnp.uint32)) & jnp.uint32(1)


@functools.partial(jax.jit, static_argnums=(0, 3))
def scalar_mul(ops, p, scalars, nbits: int):
    """Batched double-and-add, MSB-first over a static bit count
    (reference impl_scalar_mul_point!, macros.rs:1-33 — there per-bit on one
    point; here one fused scan over the whole batch)."""

    def step(acc, i):
        acc = point_double(ops, acc)
        bit = _scalar_bit(scalars, i)
        added = point_add(ops, acc, p)
        acc = select_point(ops, bit == 1, added, acc)
        return acc, None

    init = infinity_like(ops, p)
    acc, _ = jax.lax.scan(step, init, jnp.arange(nbits - 1, -1, -1))
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def _halving_add(ops, p):
    n = p[0].shape[0]
    half = n // 2
    return point_add(
        ops, tuple(a[:half] for a in p), tuple(a[half:] for a in p)
    )


def tree_sum(ops, p):
    """Reduce points over leading axis 0 by pairwise halving — log2(N) levels
    of batched adds. N must be a power of two (pad with infinity). Each level
    is its own small jitted executable (shared across callers/windows) — one
    fused graph would inline log2(N) copies of the group law and take XLA
    minutes to compile."""
    n = p[0].shape[0]
    assert n & (n - 1) == 0, "tree_sum requires power-of-two leading axis"
    while n > 1:
        p = _halving_add(ops, p)
        n //= 2
    return tuple(a[0] for a in p)


def pad_to_pow2(ops, p, scalars=None):
    """Pad leading axis with infinity points (and zero scalars) to a power
    of two."""
    n = p[0].shape[0]
    m = 1 << max(0, (n - 1).bit_length())
    if m == n:
        return (p, scalars) if scalars is not None else p
    pad = m - n
    inf = infinity_like(ops, tuple(a[:pad] for a in p))
    p = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(p, inf))
    if scalars is not None:
        z = jnp.zeros((pad,) + scalars.shape[1:], dtype=scalars.dtype)
        return p, jnp.concatenate([scalars, z], axis=0)
    return p


def scan_fold(ops, pts):
    """Fold the leading axis of a Jacobian batch with a SCANNED point_add:
    compile cost is one group-law instance regardless of length (an unrolled
    pad-to-pow2 tree inlines one instance per level — fine as separate small
    executables via tree_sum, ruinous inside a single traced module), and it
    works for ANY leading-axis length, not just powers of two. Runtime is
    sequential in the folded length — use only for short axes (device
    partials, proof assembly), never for point streams."""
    init = infinity_like(ops, tuple(a[0] for a in pts))

    def body(acc, row):
        return point_add(ops, acc, row), None

    acc, _ = jax.lax.scan(body, init, pts)
    return acc


def segmented_sum(ops, pts, seg_ids, n_seg: int):
    """Sum a Jacobian point stream into n_seg accumulators keyed by the
    per-row segment id (int32[B]) — ONE scanned point_add plus a dynamic
    slice/update per step. Same compile-cost rationale (and the same
    sequential-runtime caveat) as scan_fold."""
    init = infinity_like(
        ops, tuple(jnp.broadcast_to(a[:1], (n_seg,) + a.shape[1:]) for a in pts)
    )

    def body(acc, inp):
        sid = inp[-1]
        pt = tuple(a[None] for a in inp[:-1])
        cur = tuple(
            jax.lax.dynamic_slice_in_dim(a, sid, 1, axis=0) for a in acc
        )
        new = point_add(ops, cur, pt)
        acc = tuple(
            jax.lax.dynamic_update_slice_in_dim(a, n, sid, axis=0)
            for a, n in zip(acc, new)
        )
        return acc, None

    acc, _ = jax.lax.scan(body, init, (*pts, seg_ids))
    return acc


def msm_naive(ops, p, scalars, nbits: int):
    """Σᵢ kᵢ·Pᵢ — batched per-point double-and-add then tree reduction.
    Replaces the reference's sequential Σcᵢ·Pᵢ (polynomial.rs:271-293).
    The Pippenger path (ops/msm.py) supersedes this for large N; this is the
    correctness anchor. Deliberately NOT wrapped in one outer jit: it reuses
    the compiled scalar_mul / tree_sum executables instead of re-inlining
    the (expensive-to-compile) scan body into a fresh module."""
    muls = scalar_mul(ops, p, scalars, nbits)
    muls = pad_to_pow2(ops, muls)
    return tree_sum(ops, muls)


# -- affine normalization ----------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def to_affine(ops, p):
    """Jacobian → affine: (x/z², y/z³, inf_mask). Batch inverse via Fermat;
    infinity rows return x=y=0."""
    x, y, z = p
    inf = is_infinity(ops, p)
    zi = ops.inv(z)
    zi2 = ops.sq(zi)
    ax = ops.mul(x, zi2)
    ay = ops.mul(y, ops.mul(zi2, zi))
    ax = ops.select(inf, ops.zero_like(ax), ax)
    ay = ops.select(inf, ops.zero_like(ay), ay)
    return ax, ay, inf


# -- host conversion (base-field curves: secp256k1, BLS12-381 G1) -----------

def pack_points(pts, spec: L.FieldSpec):
    """Host affine points (objects with .x/.y PrimeFieldElem, .inf) →
    device Jacobian tuple in Montgomery form."""
    n = len(pts)
    xs = np.zeros((n, spec.K), dtype=np.uint32)
    ys = np.zeros((n, spec.K), dtype=np.uint32)
    zs = np.zeros((n, spec.K), dtype=np.uint32)
    one = int_to_limbs(spec.r_mod_p, spec.K)
    for i, pt in enumerate(pts):
        if pt.is_zero():
            xs[i] = one
            ys[i] = one
        else:
            xs[i] = int_to_limbs(pt.x.e * spec.r_mod_p % spec.p, spec.K)
            ys[i] = int_to_limbs(pt.y.e * spec.r_mod_p % spec.p, spec.K)
            zs[i] = one
    return (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs))


def unpack_points(p, spec: L.FieldSpec) -> list:
    """Device Jacobian tuple → list of (x, y) int tuples or None (infinity)."""
    ops = FqOps(spec)
    ax, ay, inf = to_affine(ops, p)
    xs = L.unpack(ax, spec)
    ys = L.unpack(ay, spec)
    infs = np.asarray(jax.device_get(inf)).reshape(-1)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def pack_scalars(ks, nbits: int):
    """Host ints → plain limb arrays uint32[N, ceil(nbits/16)]."""
    s = (nbits + LIMB_BITS - 1) // LIMB_BITS
    arr = np.zeros((len(ks), s), dtype=np.uint32)
    for i, k in enumerate(ks):
        arr[i] = int_to_limbs(int(k), s)
    return jnp.asarray(arr)
