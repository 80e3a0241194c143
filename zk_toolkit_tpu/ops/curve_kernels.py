"""Fused Pallas TPU kernels for the Jacobian group law (prime-field curves).

Why this exists (round-5 profiling on v5e): the XLA-composed group law in
ops/curve_ops.py runs at ~13-36M field-muls/s in MSM/scan contexts while the
bare Pallas mont_mul kernel sustains ~140-185M — a 4-6x gap. Two causes,
both structural:

1. Layout: every XLA-level limb op works on uint32[batch, K] with K = 24 in
   the MINOR dimension. TPU vector registers are (8 sublanes x 128 lanes);
   a 24-wide minor dim uses 24/128 lanes — 81% of the VPU idle — and every
   op between Pallas calls (add_mod's Kogge-Stone network, selects, stacks)
   pays it.
2. Traffic: the stacked-multiply idiom materializes jnp.stack copies of
   multi-hundred-MB coordinate arrays in HBM around each Pallas call, and
   each of the ~25 field ops per point-add round-trips HBM.

This kernel runs the ENTIRE complete point addition (add-2007-bl + the
branch-free double / infinity / inverse case handling of
curve_ops.point_add, reference macros.rs:35-215 semantics) on [K, block]
VMEM tiles with the batch in lanes: one HBM read of the six input
coordinates, one write of the three outputs, full lane utilization
throughout. point_double (dbl-2009-l) ships too for the scan paths.

Dispatch: curve_ops.point_add/point_double route here via
lax.platform_dependent for base-field ops namespaces (FqOps) on accelerator
backends at batch >= _MIN_BATCH; the XLA path remains the CPU/virtual-mesh
and small-batch path, and tests/test_pallas_parity.py asserts bit-identity
between the two on every case class (generic, double, inverse, infinity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 512
_MIN_BATCH = 256
M16 = 0xFFFF  # plain int: a jnp scalar would be a captured constant in-kernel


# -- tile helpers: uint32[rows, bt] arrays, limb axis MAJOR ------------------

def _up(x, d, rows):
    """Shift limb rows toward higher index by d, keeping `rows` rows."""
    return jnp.pad(x, [(d, 0), (0, 0)])[:rows]


def _ks(g, p, rows):
    """Kogge-Stone prefix of the carry/borrow operator along the limb axis."""
    d = 1
    while d < rows:
        g = g | (p & _up(g, d, rows))
        p = p & _up(p, d, rows)
        d *= 2
    return g


def _resolve(s):
    """Normalize columns (< 2^31) to 16-bit limbs; carry out of the top row
    is dropped (callers size `s` so it is zero or deliberately mod 2^16r)."""
    rows = s.shape[0]
    s1 = (s & M16) + _up(s >> 16, 1, rows)
    lo = s1 & M16
    g = _ks(s1 >> 16, (lo == M16).astype(jnp.uint32), rows)
    return (lo + _up(g, 1, rows)) & M16


def _cond_sub(res, p_col):
    """res - p where res >= p, else res. res [rows, bt], p_col [rows, 1]."""
    rows = res.shape[0]
    bor = _ks((res < p_col).astype(jnp.uint32),
              (res == p_col).astype(jnp.uint32), rows)
    diff = (res - p_col - _up(bor, 1, rows)) & M16
    return jnp.where((bor[rows - 1] == 0)[None, :], diff, res)


def _t_mont_mul(a, b, n_col, n0, k, t_ref=None):
    """Montgomery product on [k, bt] tiles (schoolbook + interleaved REDC,
    same column-magnitude analysis as limbs.mont_redc). Accumulates with
    full-width padded value adds — measured FASTER than ref-scratch
    static-slice RMW (Mosaic pipelines the pure-value dataflow better;
    .at[].add / dynamic_slice on values are not implemented at all)."""
    w = 2 * k + 2
    n = n_col[:, None]
    t = jnp.zeros((w, a.shape[1]), jnp.uint32)

    def acc(t, x, off):
        return t + jnp.pad(x, [(off, w - x.shape[0] - off), (0, 0)])

    for i in range(k):
        prod = a[i][None, :] * b
        t = acc(t, prod & M16, i)
        t = acc(t, prod >> 16, i + 1)
    for i in range(k):
        m = ((t[i] & M16) * n0) & M16
        prod = m[None, :] * n
        t = acc(t, prod & M16, i)
        t = acc(t, prod >> 16, i + 1)
        t = acc(t, (t[i] >> 16)[None, :], i + 1)

    res = _resolve(t[k:w])                       # [k+2, bt]
    px = jnp.pad(n_col, (0, 2))[:, None]
    return _cond_sub(res, px)[:k]


def _t_add(a, b, n_col, k):
    """(a + b) mod p on [k, bt] tiles (canonical inputs)."""
    s = jnp.pad(a, [(0, 1), (0, 0)]) + jnp.pad(b, [(0, 1), (0, 0)])
    res = _resolve(s)                            # [k+1, bt]
    px = jnp.pad(n_col, (0, 1))[:, None]
    return _cond_sub(res, px)[:k]


def _t_sub(a, b, n_col, k):
    """(a - b) mod p on [k, bt] tiles (canonical inputs)."""
    bor = _ks((a < b).astype(jnp.uint32), (a == b).astype(jnp.uint32), k)
    diff = (a - b - _up(bor, 1, k)) & M16
    wrapped = _resolve(diff + n_col[:, None])    # mod 2^(16k): == a - b + p
    return jnp.where((bor[k - 1] == 1)[None, :], wrapped, diff)


def _t_is_zero(a):
    return jnp.all(a == 0, axis=0)               # [bt] bool


def _t_sel(mask, a, b):
    return jnp.where(mask[None, :], a, b)


def _t_double(x1, y1, z1, MM, AD, SB):
    """dbl-2009-l on tiles; Y=0 / Z=0 inputs give Z3=0 automatically."""
    DB = lambda v: AD(v, v)
    a = MM(x1, x1)
    b = MM(y1, y1)
    e = AD(DB(a), a)
    c = MM(b, b)
    xb = AD(x1, b)
    g_ = MM(xb, xb)
    f = MM(e, e)
    d = DB(SB(SB(g_, a), c))
    x3 = SB(f, DB(d))
    c8 = DB(DB(DB(c)))
    y3 = SB(MM(e, SB(d, x3)), c8)
    z3 = DB(MM(y1, z1))
    return x3, y3, z3


@functools.lru_cache(maxsize=None)
def _point_add_call(k: int, block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(n_ref, n0_ref, x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr,
               ozr, t_ref):
        n_col = n_ref[:].T[:, 0]                 # [k]
        n0 = n0_ref[0]
        x1, y1, z1 = x1r[:].T, y1r[:].T, z1r[:].T
        x2, y2, z2 = x2r[:].T, y2r[:].T, z2r[:].T
        MM = lambda a, b: _t_mont_mul(a, b, n_col, n0, k, t_ref)
        AD = lambda a, b: _t_add(a, b, n_col, k)
        SB = lambda a, b: _t_sub(a, b, n_col, k)
        DB = lambda a: AD(a, a)

        # add-2007-bl (complete via selects, mirrors curve_ops.point_add)
        z1z1 = MM(z1, z1)
        z2z2 = MM(z2, z2)
        u1 = MM(x1, z2z2)
        u2 = MM(x2, z1z1)
        s1 = MM(MM(y1, z2), z2z2)
        s2 = MM(MM(y2, z1), z1z1)
        zz = MM(z1, z2)
        h = SB(u2, u1)
        r = DB(SB(s2, s1))
        h2 = DB(h)
        i = MM(h2, h2)
        rr = MM(r, r)
        j = MM(h, i)
        v = MM(u1, i)
        x3 = SB(SB(rr, j), DB(v))
        y3 = SB(MM(r, SB(v, x3)), DB(MM(s1, j)))
        z3 = DB(MM(h, zz))

        dx, dy, dz = _t_double(x1, y1, z1, MM, AD, SB)
        is_dbl = _t_is_zero(h) & _t_is_zero(r)
        x3 = _t_sel(is_dbl, dx, x3)
        y3 = _t_sel(is_dbl, dy, y3)
        z3 = _t_sel(is_dbl, dz, z3)
        q_inf = _t_is_zero(z2)
        x3 = _t_sel(q_inf, x1, x3)
        y3 = _t_sel(q_inf, y1, y3)
        z3 = _t_sel(q_inf, z1, z3)
        p_inf = _t_is_zero(z1)
        x3 = _t_sel(p_inf, x2, x3)
        y3 = _t_sel(p_inf, y2, y3)
        z3 = _t_sel(p_inf, z2, z3)

        oxr[:] = x3.T
        oyr[:] = y3.T
        ozr[:] = z3.T

    def call(n2d, n0arr, coords):
        bsz = coords[0].shape[0]
        bspec = pl.BlockSpec((block, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((bsz, k), jnp.uint32) for _ in range(3)
            ),
            grid=(bsz // block,),
            in_specs=[
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [bspec] * 6,
            out_specs=(bspec,) * 3,
            scratch_shapes=[pltpu.VMEM((2 * k + 2, block), jnp.uint32)],
        )(n2d, n0arr, *coords)

    return call


@functools.lru_cache(maxsize=None)
def _point_double_call(k: int, block: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(n_ref, n0_ref, x1r, y1r, z1r, oxr, oyr, ozr, t_ref):
        n_col = n_ref[:].T[:, 0]
        n0 = n0_ref[0]
        x1, y1, z1 = x1r[:].T, y1r[:].T, z1r[:].T
        MM = lambda a, b: _t_mont_mul(a, b, n_col, n0, k, t_ref)
        AD = lambda a, b: _t_add(a, b, n_col, k)
        SB = lambda a, b: _t_sub(a, b, n_col, k)
        x3, y3, z3 = _t_double(x1, y1, z1, MM, AD, SB)
        oxr[:] = x3.T
        oyr[:] = y3.T
        ozr[:] = z3.T

    def call(n2d, n0arr, coords):
        bsz = coords[0].shape[0]
        bspec = pl.BlockSpec((block, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=tuple(
                jax.ShapeDtypeStruct((bsz, k), jnp.uint32) for _ in range(3)
            ),
            grid=(bsz // block,),
            in_specs=[
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [bspec] * 3,
            out_specs=(bspec,) * 3,
            scratch_shapes=[pltpu.VMEM((2 * k + 2, block), jnp.uint32)],
        )(n2d, n0arr, *coords)

    return call


def _run(call_builder, spec, coords):
    """Flatten leading axes, pad the batch to a block multiple (zero rows are
    infinity points — harmless), run, restore shapes. Padding target is at
    least 8-aligned by construction (block is a multiple of 8), clearing the
    known misaligned-batch miscompile class (commit 904167d)."""
    shape = coords[0].shape
    k = shape[-1]
    batch = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    flat = [a.reshape(batch, k) for a in coords]
    block = min(_BLOCK, max(8, (batch + 7) // 8 * 8))
    pad = (-batch) % block
    if pad:
        flat = [jnp.pad(a, [(0, pad), (0, 0)]) for a in flat]
    n2d = jnp.asarray(spec.p_limbs)[None, :]
    n0 = jnp.asarray([spec.n0inv], dtype=jnp.uint32)
    out = call_builder(k, block)(n2d, n0, tuple(flat))
    if pad:
        out = tuple(a[:batch] for a in out)
    return tuple(a.reshape(shape) for a in out)


def point_add_fused(p, q, spec):
    """Complete Jacobian add on the fused TPU kernel. p, q: same-shape
    (x, y, z) tuples of uint32[..., K] Montgomery limbs."""
    return _run(_point_add_call, spec, tuple(p) + tuple(q))


def point_double_fused(p, spec):
    return _run(_point_double_call, spec, tuple(p))
