"""Explicit-SPMD Groth16 prove over a device mesh (shard_map + collectives).

Round 2's sharded prove placed auto-SPMD-sharded inputs under the production
prover's many small executables; nothing guaranteed every executable issued
the same collectives on every device, and the run died in an all-gather
rendezvous (8 participants expected, 6 arrived). This module is the redesign:
the WHOLE sharded prove is ONE `jax.shard_map` region inside ONE `jax.jit`
module, so every device executes the identical program with an identical,
explicit collective schedule:

  1. `all_gather` of the locally-computed SpMV evaluations,
  2. `all_gather` of the per-device G1 MSM partial points,
  3. `all_gather` of the per-device G2 MSM partial point.

Three collectives per prove, all unconditional, all shape-static. Everything
else is local or replicated compute.

Compile-cost design (the other half of the round-1/2 failures — XLA-CPU
needs minutes per big scan body, and the dryrun gate compiles cold):

  - ONE G1 double-and-add scan and ONE G2 scan total. All five G1 MSMs ride
    one scan by concatenating their (points, scalars) streams locally.
  - The prover randomizer terms never touch the device: by the identity
        sA + rB1 - rs*delta = s*alpha + r*beta + rs*delta + s*U + r*V
    (U = sum a_i u_i, V = sum a_i v_i in G1), the C element needs only two
    extra MSM segments with host-scaled scalars (s*a_i, r*a_i) plus ONE
    host-precomputed point K = s*alpha + r*beta + rs*delta; A needs r*delta
    and B2 needs s*delta_2, both host-precomputed (utils/host_curve.py raw
    int Jacobian math, ~1 ms per multiple). B1 itself is never materialized.
  - Jacobian -> affine conversion happens outside the shard_map module on
    the replicated outputs (small separate executables, no collectives).

Data placement (the ZK analogs of dp/sp axes — SURVEY.md §5 long-context
note: the scaling axes here are the constraint and point-stream axes):
  - constraint rows (SpMV inputs): sharded over `axis`
  - CRS point streams (g1_u, g1_v, g1_uvw_wit, g1_xt, g2_v) and all scalar
    streams: sharded over `axis`
  - witness vector, single points, NTT quotient, proof assembly: replicated

The cross-device MSM reduction gathers the per-device partial Jacobian
points and folds them with log2(D) batched adds on every device (replicated
result; point addition is not an elementwise sum, so no point-typed psum).

Behavioral spec: the prove dataflow of the reference's Groth16 prover
(reference zk/w_trusted_setup/groth16/zktoolkit_based/prover.rs:96-147);
proofs are bit-identical to the single-device prove_core for the same (r, s)
(asserted in tests/test_parallel.py::test_sharded_groth16_prove).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import ntt as NTT
from zk_toolkit_tpu.ops import pairing_ops as PO
from zk_toolkit_tpu.ops.field_ops import FqOps
from zk_toolkit_tpu.utils import host_curve as HC

FR_BITS = 256
R = params.R


def _fq():
    return FqOps(L.field_spec(params.Q))


def _fr_spec():
    return L.field_spec(params.R)


def _pad_stream(ops, pts, scalars, d: int):
    """Pad a (points, scalars) stream to a multiple of d with infinity points
    and zero scalars (contribute nothing to the MSM)."""
    n = pts[0].shape[0]
    m = -(-n // d) * d
    if m == n:
        return pts, scalars
    pad = m - n
    inf = C.infinity_like(ops, tuple(a[:1] for a in pts))
    pts = tuple(
        jnp.concatenate([a, jnp.broadcast_to(i, (pad,) + i.shape[1:])], axis=0)
        for a, i in zip(pts, inf)
    )
    z = jnp.zeros((pad,) + scalars.shape[1:], dtype=scalars.dtype)
    return pts, jnp.concatenate([scalars, z], axis=0)


def _tree_fold(ops, pts):
    """Fold the leading axis (power of two) with log2 batched adds down to
    leading axis 1."""
    n = pts[0].shape[0]
    while n > 1:
        half = n // 2
        pts = C.point_add(
            ops, tuple(a[:half] for a in pts), tuple(a[half:] for a in pts)
        )
        n = half
    return pts


def _fold_segment(ops, pts):
    """Sum a small Jacobian batch to one point (pad to pow2 + tree)."""
    return _tree_fold(ops, C.pad_to_pow2(ops, pts))


def _fold_gathered(ops, pts, d: int):
    """[D * B, ...] gathered partials -> [B, ...] summed over the D axis."""
    b = pts[0].shape[0] // d
    pts = tuple(a.reshape((d, b) + a.shape[1:]) for a in pts)
    pts = _tree_fold(ops, pts)
    return tuple(a[0] for a in pts)


def _unpack_g1_host(pt, spec):
    """Device G1 Jacobian (batch 1) -> host affine (x, y) ints or None."""
    x = L.unpack(pt[0], spec)[0]
    y = L.unpack(pt[1], spec)[0]
    z = L.unpack(pt[2], spec)[0]
    return HC.jac_to_affine(HC.FpHost(spec.p), (x, y, z))


def _unpack_g2_host(pt, spec):
    x = L.unpack(pt[0], spec)
    y = L.unpack(pt[1], spec)
    z = L.unpack(pt[2], spec)
    F = HC.Fp2Host(spec.p)
    return HC.jac_to_affine(
        F, ((x[0], x[1]), (y[0], y[1]), (z[0], z[1]))
    )


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_pad", "segs"))
def _sharded_prove_jit(
    mesh, axis, n_pad, segs,
    a_idx, a_val, b_idx, b_val, c_idx, c_val,
    w_mont, u_scal, wit_scal, su_scal, rv_scal,
    g1_u, g1_v, g1_wit, g1_xt, g2_v,
    g1_alpha, g1_rd, g1_k, g2_beta, g2_sd,
):
    fq = _fq()
    po = PO.bls_pairing_ops()
    fr = _fr_spec()
    e2 = po.e2
    d = mesh.shape[axis]
    dom = NTT.fr_domain(n_pad)

    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    rep = lambda a: P(*([None] * a.ndim))
    tshp = lambda t: tuple(shp(x) for x in t)
    trep = lambda t: tuple(rep(x) for x in t)

    in_specs = (
        shp(a_idx), shp(a_val), shp(b_idx), shp(b_val),
        shp(c_idx), shp(c_val),
        rep(w_mont), shp(u_scal), shp(wit_scal), shp(su_scal), shp(rv_scal),
        tshp(g1_u), tshp(g1_v), tshp(g1_wit), tshp(g1_xt), tshp(g2_v),
        trep(g1_alpha), trep(g1_rd), trep(g1_k), trep(g2_beta), trep(g2_sd),
    )
    jac1 = (P(None, None), P(None, None), P(None, None))
    jac2 = (P(None, None, None), P(None, None, None), P(None, None, None))
    out_specs = (jac1, jac2, jac1)

    def prove(a_idx, a_val, b_idx, b_val, c_idx, c_val,
              w_mont, u_scal, wit_scal, su_scal, rv_scal,
              g1_u, g1_v, g1_wit, g1_xt, g2_v,
              g1_alpha, g1_rd, g1_k, g2_beta, g2_sd):
        # -- 1. local SpMV over the local constraint rows ------------------
        from zk_toolkit_tpu.protocols.groth16_device import _spmv

        a_ev = _spmv(a_idx, a_val, w_mont, None, fr)
        b_ev = _spmv(b_idx, b_val, w_mont, None, fr)
        c_ev = _spmv(c_idx, c_val, w_mont, None, fr)
        evs = jnp.stack([a_ev, b_ev, c_ev], axis=0)      # [3, local, K]
        # collective 1: assemble the full evaluation vectors everywhere
        evs = jax.lax.all_gather(evs, axis, axis=1, tiled=True)

        # -- 2. replicated NTT quotient (n_pad is small next to the MSMs) --
        h_mont = NTT.h_coset_then_coeffs(dom, evs[0], evs[1], evs[2])
        h_plain = L.from_mont(h_mont, fr)
        # h has n_pad-1 coefficients; the extra INTT output row pairs with a
        # padded infinity point, so its value is irrelevant.
        chunk = n_pad // d
        rank = jax.lax.axis_index(axis)
        h_loc = jax.lax.dynamic_slice_in_dim(
            h_plain, rank * chunk, chunk, axis=0
        )

        # -- 3. ONE local G1 scan over the concatenated MSM segments -------
        #    [U | wit | xt | s*U-part | r*V-part]
        pts_loc = tuple(
            jnp.concatenate([u, w_, xt, u, v], axis=0)
            for u, w_, xt, v in zip(g1_u, g1_wit, g1_xt, g1_v)
        )
        scal_loc = jnp.concatenate(
            [u_scal, wit_scal, h_loc, su_scal, rv_scal], axis=0
        )
        muls = C.scalar_mul(fq, pts_loc, scal_loc, FR_BITS)
        parts = []
        off = 0
        for ln in segs:
            parts.append(
                _fold_segment(fq, tuple(a[off : off + ln] for a in muls))
            )
            off += ln
        g1_part = tuple(
            jnp.concatenate([p[i] for p in parts], axis=0) for i in range(3)
        )                                                # [5, ...]
        # ONE local G2 scan
        muls2 = C.scalar_mul(e2, g2_v, u_scal, FR_BITS)
        pb2 = _fold_segment(e2, muls2)                   # [1, ...]

        # collectives 2+3: exchange the partial points
        n_seg = len(segs)
        g1_all = tuple(
            jax.lax.all_gather(x, axis, axis=0, tiled=True) for x in g1_part
        )                                                # [5D, ...]
        g2_all = tuple(
            jax.lax.all_gather(x, axis, axis=0, tiled=True) for x in pb2
        )                                                # [D, ...]
        g1_sums = _fold_gathered(fq, g1_all, d)          # [5, ...]
        sum_b2 = _fold_gathered(e2, g2_all, d)           # [1, ...]

        s_u = tuple(x[0:1] for x in g1_sums)
        s_wit = tuple(x[1:2] for x in g1_sums)
        s_xt = tuple(x[2:3] for x in g1_sums)
        s_su = tuple(x[3:4] for x in g1_sums)
        s_rv = tuple(x[4:5] for x in g1_sums)

        # -- 4. replicated proof assembly -----------------------------------
        # A  = alpha + U + r*delta
        # B2 = beta_2 + V_2 + s*delta_2
        # C  = wit + ht + s*U + r*V + (s*alpha + r*beta + rs*delta)
        A = C.point_add(fq, C.point_add(fq, g1_alpha, s_u), g1_rd)
        B2 = C.point_add(e2, C.point_add(e2, g2_beta, sum_b2), g2_sd)
        Cp = C.point_add(fq, s_wit, s_xt)
        Cp = C.point_add(fq, Cp, s_su)
        Cp = C.point_add(fq, Cp, s_rv)
        Cp = C.point_add(fq, Cp, g1_k)
        return A, B2, Cp

    fn = jax.shard_map(
        prove, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return fn(
        a_idx, a_val, b_idx, b_val, c_idx, c_val,
        w_mont, u_scal, wit_scal, su_scal, rv_scal,
        g1_u, g1_v, g1_wit, g1_xt, g2_v,
        g1_alpha, g1_rd, g1_k, g2_beta, g2_sd,
    )


def sharded_prove(mesh, mat, crs, wires, r: int, s: int, axis: str = "shard"):
    """Groth16 prove with the constraint/point axes sharded over `mesh`.

    mat: protocols.groth16_device.CircuitMatrices (n_pad and the wire count
    must be divisible by the mesh size — synthetic_r1cs(pad_wires_to=D)).
    wires: full witness as host ints (DeviceGroth16Prover.wires).
    Returns a protocols.groth16_device.DeviceProof (affine elements).
    """
    from zk_toolkit_tpu.protocols.groth16_device import (
        DeviceProof, _pack_fr_plain,
    )

    fq = _fq()
    po = PO.bls_pairing_ops()
    fqs = fq.spec
    fr = _fr_spec()
    d = mesh.shape[axis]
    assert mat.n_pad % d == 0, "constraint rows must shard evenly"
    assert (mat.m + 1) % d == 0, "wire count must shard evenly"
    r, s = int(r) % R, int(s) % R

    # host-precomputed randomizer points (raw-int Jacobian, ~ms)
    F1, F2 = HC.FpHost(fqs.p), HC.Fp2Host(fqs.p)
    alpha_a = _unpack_g1_host(crs.g1_alpha, fqs)
    beta_a = _unpack_g1_host(crs.g1_beta, fqs)
    delta_a = _unpack_g1_host(crs.g1_delta, fqs)
    delta2_a = _unpack_g2_host(crs.g2_delta, fqs)
    rd = HC.jac_to_affine(F1, HC.jac_mul(F1, HC.from_affine(F1, delta_a), r))
    sd2 = HC.jac_to_affine(F2, HC.jac_mul(F2, HC.from_affine(F2, delta2_a), s))
    k_jac = HC.jac_add(
        F1,
        HC.jac_add(
            F1,
            HC.jac_mul(F1, HC.from_affine(F1, alpha_a), s),
            HC.jac_mul(F1, HC.from_affine(F1, beta_a), r),
        ),
        HC.jac_mul(F1, HC.from_affine(F1, delta_a), r * s % R),
    )
    g1_rd = HC.pack_g1_jac([rd], fqs)
    g1_k = HC.pack_g1_jac([HC.jac_to_affine(F1, k_jac)], fqs)
    g2_sd = HC.pack_g2_jac([sd2], fqs)

    # scalar streams (host ints -> plain limbs)
    u_scal = _pack_fr_plain(wires)
    wit_w = wires[mat.l + 1 :]
    su_scal = _pack_fr_plain([s * w % R for w in wires])
    rv_scal = _pack_fr_plain([r * w % R for w in wires])
    w_mont = L.pack(wires, fr, mont=True)

    g1_wit, wit_scal = _pad_stream(fq, crs.g1_uvw_wit, _pack_fr_plain(wit_w), d)
    # xt stream: n_pad-1 points; pad to n_pad so each device owns n_pad/D
    # rows aligned with its h-coefficient slice.
    n_xt = crs.g1_xt[0].shape[0]
    inf = C.infinity_like(fq, tuple(a[:1] for a in crs.g1_xt))
    g1_xt = tuple(
        jnp.concatenate(
            [a, jnp.broadcast_to(i, (mat.n_pad - n_xt,) + i.shape[1:])],
            axis=0,
        )
        for a, i in zip(crs.g1_xt, inf)
    )
    cw = (mat.m + 1) // d
    segs = (cw, g1_wit[0].shape[0] // d, mat.n_pad // d, cw, cw)

    A, B2, Cp = _sharded_prove_jit(
        mesh, axis, mat.n_pad, segs,
        jnp.asarray(mat.a_idx), jnp.asarray(mat.a_val),
        jnp.asarray(mat.b_idx), jnp.asarray(mat.b_val),
        jnp.asarray(mat.c_idx), jnp.asarray(mat.c_val),
        w_mont, u_scal, wit_scal, su_scal, rv_scal,
        crs.g1_u, crs.g1_v, g1_wit, g1_xt, crs.g2_v,
        crs.g1_alpha, g1_rd, g1_k, crs.g2_beta, g2_sd,
    )
    a_aff = C.to_affine(fq, A)
    b_aff = C.to_affine(po.e2, B2)
    c_aff = C.to_affine(fq, Cp)
    return DeviceProof(a=a_aff, b=b_aff, c=c_aff)
