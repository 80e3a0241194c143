"""Mesh-sharded Bulletproofs inner-product argument — explicit shard_map +
collectives (SURVEY.md §2 distributed plan, item e; BASELINE.json "sharded
vector folds").

Layout: the length-n IPA vectors (g, h, a, b) are distributed CYCLICALLY —
global element i lives on device i mod D at local row i div D, materialized
as [D, n/D] arrays with the leading (device) axis sharded. The payoff: every
IPA fold pairs element i with i + n/2, and i ≡ i + n/2 (mod D) whenever
D | n/2 — so under the cyclic layout *every halving fold is co-located* and
the folds run collective-free for all rounds until the local slice is a
single element. (A contiguous block layout would ship half the vector across
the mesh every round.)

Per-round cross-device traffic is constant in the vector length:
  1. one all_gather of the per-device cross-inner-product partials
     (2 field elements per device), and
  2. one all_gather of the per-device partial L/R commitment points
     (2 Jacobian points per device, pre-scaled by x^2 / x^-2 so the
     replicated fold needs no further scalar-muls).

Each round is ONE jitted shard_map module containing ONE 256-bit
double-and-add scan instance: the L/R partial MSMs, the g/h basis folds, and
the u·cl·x^2 / u·cr·x^-2 terms all ride a single concatenated
[4·half + 4·half + 2]-point scalar-mul (sums via a segmented scan, folds via
slicing) — the multi-dispatch structure VERDICT r2 flagged is gone.

When the local slice reaches one element (n == D) the remaining log2(D)
rounds run through the single-device fused rounds
(protocols/bulletproofs_device._ipa_round/_ipa_final) on gathered data —
at that point the whole problem is D scalars + D points.

Validated in tests/test_parallel.py: bit-identical accept/reject vs the
single-device DeviceBulletproofs transcript on the virtual 8-device CPU
mesh. Reference semantics: zk/wo_trusted_setup/bulletproofs.rs:19-55.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.protocols import bulletproofs_device as BD

_OPS = BD._P_OPS
_SPEC = BD._N_SPEC
N_ORDER = BD.N_ORDER


def shard_ipa_inputs(mesh: Mesh, gg, hh, a, b, axis: str = "shard"):
    """Cyclic placement: [n, ...] arrays -> [D, n/D, ...] with row k holding
    the elements {i : i mod D == k} and the leading axis sharded."""
    d = mesh.shape[axis]

    def cyc(x):
        n = x.shape[0]
        assert n % d == 0, "vector length must be a multiple of the mesh size"
        xr = x.reshape((n // d, d) + x.shape[1:]).swapaxes(0, 1)
        return jax.device_put(
            xr, NamedSharding(mesh, P(axis, *([None] * (xr.ndim - 1))))
        )

    def put(x):
        return tuple(cyc(t) for t in x) if isinstance(x, tuple) else cyc(x)

    return put(gg), put(hh), put(a), put(b)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _round_jit(mesh, axis, gg, hh, a, b, Pt, u, x_m, xi_m):
    """One sharded IPA round. gg/hh: point tuples [D, nloc, ...]; a/b:
    Montgomery Fr [D, nloc, K]; Pt/u: replicated point tuples [1, ...];
    x_m/xi_m: replicated Montgomery challenge / inverse [K]."""
    shp = lambda t: P(axis, *([None] * (t.ndim - 1)))
    rep = lambda t: P(*([None] * t.ndim))
    tshp = lambda ts: tuple(shp(t) for t in ts)
    trep = lambda ts: tuple(rep(t) for t in ts)

    def local(gg, hh, a, b, Pt, u, x_m, xi_m):
        g = tuple(t[0] for t in gg)          # [nloc, ...]
        h = tuple(t[0] for t in hh)
        a0, b0 = a[0], b[0]                  # [nloc, K]
        half = a0.shape[0] // 2

        xsq = L.mont_mul(x_m, x_m, _SPEC)
        xsqi = L.mont_mul(xi_m, xi_m, _SPEC)

        # cross inner-product partials; gather first (cheap field ops), so
        # cl/cr are known replicated before the single scalar-mul below.
        cl_p = BD._tree_sum_fr(L.mont_mul(a0[:half], b0[half:], _SPEC))
        cr_p = BD._tree_sum_fr(L.mont_mul(a0[half:], b0[:half], _SPEC))
        sc_parts = jnp.stack([cl_p, cr_p])[None]          # [1, 2, K]
        # collective 1: [D, 2, K] partials everywhere
        sc_all = jax.lax.all_gather(sc_parts, axis, axis=0, tiled=True)
        d = sc_all.shape[0]
        cl, cr = sc_all[0, 0], sc_all[0, 1]
        for k in range(1, d):
            cl = L.add_mod(cl, sc_all[k, 0], _SPEC)
            cr = L.add_mod(cr, sc_all[k, 1], _SPEC)

        def bcast(s, m):
            return jnp.broadcast_to(s, (m,) + s.shape)

        # ONE scalar-mul instance over [4*half (L/R, pre-scaled) |
        #                               4*half (basis folds) | 2 (u terms)]
        lr_pts = tuple(
            jnp.concatenate([gt[half:], ht[:half], gt[:half], ht[half:]], 0)
            for gt, ht in zip(g, h)
        )
        lr_scal = jnp.concatenate([
            L.mont_mul(a0[:half], bcast(xsq, half), _SPEC),
            L.mont_mul(b0[half:], bcast(xsq, half), _SPEC),
            L.mont_mul(a0[half:], bcast(xsqi, half), _SPEC),
            L.mont_mul(b0[:half], bcast(xsqi, half), _SPEC),
        ], 0)
        fold_pts = tuple(
            jnp.concatenate([gt[:half], gt[half:], ht[:half], ht[half:]], 0)
            for gt, ht in zip(g, h)
        )
        fold_scal = jnp.concatenate([
            bcast(xi_m, half), bcast(x_m, half),
            bcast(x_m, half), bcast(xi_m, half),
        ], 0)
        u_scal = jnp.stack([
            L.mont_mul(cl, xsq, _SPEC), L.mont_mul(cr, xsqi, _SPEC)
        ])
        pts = tuple(
            jnp.concatenate([lp, fp, jnp.concatenate([ut, ut], 0)], 0)
            for lp, fp, ut in zip(lr_pts, fold_pts, u)
        )
        scal = L.from_mont(
            jnp.concatenate([lr_scal, fold_scal, u_scal], 0), _SPEC
        )
        muls = C.scalar_mul(_OPS, pts, scal, 256)

        # L/R partials (already x^2- / x^-2-scaled): the two segments are
        # contiguous halves, so reduce with log-depth batched halving adds
        # (ADVICE r4: the element-wise segmented scan was O(n_loc) sequential
        # steps and dominated the round at scale).
        lr = tuple(
            t[: 4 * half].reshape((2, 2 * half) + t.shape[1:]) for t in muls
        )
        while lr[0].shape[1] > 1:
            m = lr[0].shape[1] // 2
            lr = C.point_add(
                _OPS, tuple(t[:, :m] for t in lr), tuple(t[:, m:] for t in lr)
            )
        parts = tuple(t[:, 0] for t in lr)                # [2, ...]
        # collective 2: [D, 2, ...] partial points everywhere
        parts_all = tuple(
            jax.lax.all_gather(t[None], axis, axis=0, tiled=True)
            for t in parts
        )
        lr_sum = C.scan_fold(_OPS, parts_all)             # [2, ...]

        # P' = P + (L·x^2 + u·cl·x^2) + (R·x^-2 + u·cr·x^-2)
        ut = tuple(t[8 * half :] for t in muls)           # [2, ...]
        both = C.point_add(_OPS, lr_sum, ut)
        P2 = C.point_add(
            _OPS,
            C.point_add(_OPS, Pt, tuple(t[:1] for t in both)),
            tuple(t[1:] for t in both),
        )

        # basis folds g' = g_lo·x^-1 + g_hi·x, h' = h_lo·x + h_hi·x^-1
        fm = tuple(t[4 * half : 8 * half] for t in muls)
        gg2 = tuple(
            t[:half][None] for t in C.point_add(
                _OPS, tuple(t[:half] for t in fm),
                tuple(t[half : 2 * half] for t in fm),
            )
        )
        hh2 = tuple(
            t[:half][None] for t in C.point_add(
                _OPS, tuple(t[2 * half : 3 * half] for t in fm),
                tuple(t[3 * half :] for t in fm),
            )
        )

        # scalar folds a' = a_lo·x + a_hi·x^-1, b' = b_lo·x^-1 + b_hi·x
        a2 = L.add_mod(
            L.mont_mul(a0[:half], bcast(x_m, half), _SPEC),
            L.mont_mul(a0[half:], bcast(xi_m, half), _SPEC), _SPEC,
        )[None]
        b2 = L.add_mod(
            L.mont_mul(b0[:half], bcast(xi_m, half), _SPEC),
            L.mont_mul(b0[half:], bcast(x_m, half), _SPEC), _SPEC,
        )[None]
        return gg2, hh2, a2, b2, P2

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tshp(gg), tshp(hh), shp(a), shp(b), trep(Pt), trep(u),
                  rep(x_m), rep(xi_m)),
        out_specs=(tshp(gg), tshp(hh), shp(a), shp(b), trep(Pt)),
        check_vma=False,
    )
    return fn(gg, hh, a, b, Pt, u, x_m, xi_m)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _gather_tail_jit(mesh, axis, gg, hh, a, b):
    """Replicate the [D, 1, ...] cyclic shards everywhere with one
    all_gather per array (2 points + 2 scalars per device — constant)."""
    shp = lambda t: P(axis, *([None] * (t.ndim - 1)))
    rep = lambda t: P(*([None] * t.ndim))
    tshp = lambda ts: tuple(shp(t) for t in ts)
    trep = lambda ts: tuple(rep(t) for t in ts)

    def local(gg, hh, a, b):
        ag = lambda t: jax.lax.all_gather(t, axis, axis=0, tiled=True)
        return (tuple(ag(t) for t in gg), tuple(ag(t) for t in hh),
                ag(a), ag(b))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tshp(gg), tshp(hh), shp(a), shp(b)),
        out_specs=(trep(gg), trep(hh), rep(a), rep(b)),
        check_vma=False,
    )
    return fn(gg, hh, a, b)


def sharded_ipa(mesh: Mesh, n: int, gg, hh, u, Pt, a, b,
                challenges: list[int], axis: str = "shard") -> bool:
    """Distributed inner-product argument: P == g^a h^b u^<a,b>.

    gg/hh: device point tuples [n, ...]; u/Pt: [1, ...]; a/b: Montgomery Fr
    [n, K]; challenges consumed in transcript order (log2 n of them) —
    identical accept/reject and transcript to
    DeviceBulletproofs.inner_product_argument (asserted in tests).
    """
    d = mesh.shape[axis]
    # n and d must BOTH be powers of two: the halving loop needs every local
    # slice length even, and fold co-location needs D | n/2 at every round
    # (ADVICE r4: n = 6d passed the old multiple-of-d assert but silently
    # dropped an element at half = 3 // 2).
    assert n >= d and n & (n - 1) == 0 and d & (d - 1) == 0, (
        "sharded IPA needs power-of-two n and mesh size with n >= D"
    )
    chal = list(challenges)
    gg, hh, a, b = shard_ipa_inputs(mesh, gg, hh, a, b, axis)

    while n > d:
        x = chal.pop(0) % N_ORDER
        xi = pow(x, -1, N_ORDER)
        gg, hh, a, b, Pt = _round_jit(
            mesh, axis, gg, hh, a, b, Pt, u,
            BD._fr([x])[0], BD._fr([xi])[0],
        )
        n //= 2

    # tail: local slice is one element; finish replicated on gathered data
    # (cyclic layout with j == 0 means global index i == device index k, so
    # squeezing the local axis restores global order). The gather is a final
    # shard_map all_gather — NOT host device_get, which requires all shards
    # to be process-addressable and would fail on a real multi-host pod
    # (ADVICE r4).
    gg, hh, a, b = _gather_tail_jit(mesh, axis, gg, hh, a, b)
    gg = tuple(t[:, 0] for t in gg)
    hh = tuple(t[:, 0] for t in hh)
    a = a[:, 0]
    b = b[:, 0]
    while n > 1:
        x = chal.pop(0) % N_ORDER
        xi = pow(x, -1, N_ORDER)
        gg, hh, a, b, Pt = BD._ipa_round(
            gg, hh, a, b, Pt, u, BD._fr([x])[0], BD._fr([xi])[0]
        )
        n //= 2
    return bool(np.asarray(jax.device_get(BD._ipa_final(gg, hh, a, b, Pt, u))))
