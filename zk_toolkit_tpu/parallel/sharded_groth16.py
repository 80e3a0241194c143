"""Explicit-SPMD Groth16 prove over a device mesh (shard_map + collectives).

History of this path (the driver's multichip acceptance gate):
- Round 2 placed auto-SPMD-sharded inputs under the production prover's many
  small executables; nothing guaranteed every executable issued the same
  collectives on every device and the run died in an all-gather rendezvous.
- Round 3 fused the WHOLE prove into one jit+shard_map module; the collective
  schedule became trivially uniform, but XLA-CPU needed >6 minutes to compile
  the one giant module and the gate timed out (MULTICHIP_r03, ADVICE.md r3).

This round (5) keeps the explicit-collective, small-module design and
upgrades the heavy modules to production kernels:

  1. `_spmv_gather_jit`   shard_map — local SpMV; evals stay SHARDED when
     the four-step NTT runs (n_pad >= D^2), else 1 all_gather (toy fallback)
  2. quotient: `sharded_ntt.sharded_h_from_evs` — four-step sharded
     intt/coset_ntt/coset_intt chain, all_to_all transposes only, every
     intermediate sharded (replaces round 4's fully REPLICATED NTT — every
     device redundantly computed the full transform, the 2^20 scaling wall
     VERDICT r4 named); `_h_from_evs_jit` remains as the small-n fallback
  3. `_local_msm_g1_jit`  shard_map, NO collectives — the five local MSM
     segments stacked as a batch axis through ONE traced Pippenger pass
     (replaces the 256-step double-and-add scan, ~16x the point work).
     shard_map (manual SPMD) is load-bearing here: the placement-sharded
     variant left the partitioner to propagate shardings through the eager
     sort/gather stages and it chose replication — module 3 ran for >25
     minutes at n=1024 on the virtual mesh. Compile cost is bounded by the
     rank-2 flattening in ops/msm.py (_flat_add): ~8 s per group-law
     instance instead of ~150 s on rank-3 operands.
  4. `_local_msm_g2_jit`  shard_map, NO collectives — G2 Pippenger
  5. `_combine_jit`       shard_map, 2 all_gathers — gather per-device
     partials, fold over the device axis with a scanned add (works for ANY
     device count, not just powers of two — ADVICE.md r3 #3), assemble proof

Collective schedule per prove: shape-static, unconditional, identical on
every device — the all_to_all transposes of the NTT chain plus 2 all_gathers
of per-device partial points (and the eval all_gather only on the toy
fallback). The heavy MSM modules contain no collectives at all, so there is
no rendezvous to deadlock: a straggler can only be late, not inconsistent.

Data placement (the ZK analogs of dp/sp axes — SURVEY.md §5 long-context
note: the scaling axes here are the constraint and point-stream axes):
  - constraint rows (SpMV inputs): sharded over `axis`
  - CRS point streams (g1_u, g1_v, g1_uvw_wit, g1_xt, g2_v) and all scalar
    streams: sharded over `axis`
  - witness vector, single points, NTT quotient, proof assembly: replicated

The prover randomizer terms never touch the device: by the identity
    sA + rB1 - rs*delta = s*alpha + r*beta + rs*delta + s*U + r*V
(U = sum a_i u_i, V = sum a_i v_i in G1), the C element needs only two extra
MSM segments with host-scaled scalars (s*a_i, r*a_i) plus ONE
host-precomputed point K = s*alpha + r*beta + rs*delta; A needs r*delta and
B2 needs s*delta_2, both host-precomputed (utils/host_curve.py raw-int
Jacobian math, ~1 ms per multiple). B1 itself is never materialized.

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


# Scan-based point folds (ops/curve_ops.py scan_fold / segmented_sum): ONE
# lax.scan whose body inlines a single point_add — compile cost is one
# group-law instance regardless of stream length, segment count, or device
# count. The unrolled pad-to-pow2 trees they replace inlined one instance per
# level per segment and pushed the fused prove module past XLA-CPU's
# 6-minute compile alarm (MULTICHIP_r03).
_scan_fold = C.scan_fold


# -- module 1: sharded SpMV (+ optional eval gather) -------------------------

@functools.partial(jax.jit, static_argnames=("mesh", "axis", "gather"))
def _spmv_gather_jit(mesh, axis, gather, a_idx, a_val, b_idx, b_val, c_idx,
                     c_val, w_mont):
    fr = _fr_spec()
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    rep = lambda a: P(*([None] * a.ndim))

    def local(a_idx, a_val, b_idx, b_val, c_idx, c_val, w_mont):
        from zk_toolkit_tpu.protocols.groth16_device import _spmv

        a_ev = _spmv(a_idx, a_val, w_mont, None, fr)
        b_ev = _spmv(b_idx, b_val, w_mont, None, fr)
        c_ev = _spmv(c_idx, c_val, w_mont, None, fr)
        evs = jnp.stack([a_ev, b_ev, c_ev], axis=0)     # [3, local, K]
        if not gather:
            # four-step sharded NTT downstream: evals STAY sharded
            return evs
        # small-n fallback (replicated NTT): assemble full vectors everywhere
        return jax.lax.all_gather(evs, axis, axis=1, tiled=True)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(shp(a_idx), shp(a_val), shp(b_idx), shp(b_val),
                  shp(c_idx), shp(c_val), rep(w_mont)),
        out_specs=P(None, None, None) if gather else P(None, axis, None),
        check_vma=False,
    )
    return fn(a_idx, a_val, b_idx, b_val, c_idx, c_val, w_mont)


# -- module 2: replicated NTT quotient ---------------------------------------

@functools.partial(jax.jit, static_argnames=("n_pad",))
def _h_from_evs_jit(n_pad, evs):
    dom = NTT.fr_domain(n_pad)
    h_mont = NTT.h_coset_then_coeffs(dom, evs[0], evs[1], evs[2])
    # h has n_pad-1 coefficients; the extra INTT output row pairs with a
    # padded infinity point, so its value is irrelevant.
    return L.from_mont(h_mont, _fr_spec())


# -- module 3: local G1 Pippenger MSMs (no collectives) ----------------------

@functools.partial(jax.jit,
                   static_argnames=("mesh", "axis", "segs", "c", "wc"))
def _local_msm_g1_jit(mesh, axis, segs, c, wc, g1_u, g1_wit, g1_xt, g1_v,
                      u_scal, wit_scal, h_plain, su_scal, rv_scal):
    """The five local MSM segments [U | wit | xt | s*U | r*V] stacked as a
    batch axis and run through ONE traced Pippenger pass (the same
    collective-free local phase as sharded_msm_explicit; HLO-asserted in
    tests/test_parallel.py). Replaces the round-4 256-step double-and-add
    scan + sequential segmented accumulator, which did ~16x the point work
    and was the reason the sharded prove had no at-scale evidence
    (VERDICT r4 missing item 3)."""
    from zk_toolkit_tpu.ops import msm as M

    fq = _fq()
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    tshp = lambda t: tuple(shp(x) for x in t)
    n_max = max(segs)

    def local(g1_u, g1_wit, g1_xt, g1_v, u_scal, wit_scal, h_loc, su_scal,
              rv_scal):
        seg_pts = (g1_u, g1_wit, g1_xt, g1_u, g1_v)
        seg_scal = (u_scal, wit_scal, h_loc, su_scal, rv_scal)
        inf = C.infinity_like(fq, tuple(a[:1] for a in g1_u))
        pts5 = []
        for i in range(3):
            rows = []
            for t, ln in zip(seg_pts, segs):
                a = t[i]
                if ln < n_max:
                    a = jnp.concatenate(
                        [a, jnp.broadcast_to(inf[i],
                                             (n_max - ln,) + a.shape[1:])],
                        axis=0)
                rows.append(a)
            pts5.append(jnp.stack(rows, axis=0))         # [5, n_max, ...]
        scal_rows = []
        for s_, ln in zip(seg_scal, segs):
            if ln < n_max:
                s_ = jnp.concatenate(
                    [s_, jnp.zeros((n_max - ln,) + s_.shape[1:], s_.dtype)],
                    axis=0)
            scal_rows.append(s_)
        scal5 = jnp.stack(scal_rows, axis=0)             # [5, n_max, S]
        return M.msm_pippenger_many_traced(
            fq, tuple(pts5), scal5, FR_BITS, c, window_chunk=wc
        )                                                # [5, ...]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tshp(g1_u), tshp(g1_wit), tshp(g1_xt), tshp(g1_v),
                  shp(u_scal), shp(wit_scal), shp(h_plain), shp(su_scal),
                  shp(rv_scal)),
        out_specs=tuple(P(axis, None) for _ in range(3)),
        check_vma=False,
    )
    return fn(g1_u, g1_wit, g1_xt, g1_v, u_scal, wit_scal, h_plain, su_scal,
              rv_scal)


# -- module 4: local G2 Pippenger MSM (no collectives) -----------------------

@functools.partial(jax.jit, static_argnames=("mesh", "axis", "c", "wc"))
def _local_msm_g2_jit(mesh, axis, c, wc, g2_v, u_scal):
    from zk_toolkit_tpu.ops import msm as M

    po = PO.bls_pairing_ops()
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    tshp = lambda t: tuple(shp(x) for x in t)

    def local(g2_v, u_scal):
        part = M.msm_pippenger_traced(po.e2, g2_v, u_scal, FR_BITS, c,
                                      window_chunk=wc)
        return tuple(a[None] for a in part)              # [1, ...]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tshp(g2_v), shp(u_scal)),
        out_specs=tuple(P(axis, None, None) for _ in range(3)),
        check_vma=False,
    )
    return fn(g2_v, u_scal)


# -- module 5: gather partials, fold, assemble -------------------------------

@functools.partial(jax.jit, static_argnames=("mesh", "axis", "d", "n_seg"))
def _combine_jit(mesh, axis, d, n_seg, g1_parts, g2_parts,
                 g1_alpha, g1_rd, g1_k, g2_beta, g2_sd):
    fq = _fq()
    po = PO.bls_pairing_ops()
    e2 = po.e2
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    rep = lambda a: P(*([None] * a.ndim))
    tshp = lambda t: tuple(shp(x) for x in t)
    trep = lambda t: tuple(rep(x) for x in t)

    def local(g1_parts, g2_parts, g1_alpha, g1_rd, g1_k, g2_beta, g2_sd):
        # collectives 2+3 of 3: exchange the per-device partial points
        g1_all = tuple(
            jax.lax.all_gather(x, axis, axis=0, tiled=True) for x in g1_parts
        )                                                # [D * n_seg, ...]
        g2_all = tuple(
            jax.lax.all_gather(x, axis, axis=0, tiled=True) for x in g2_parts
        )                                                # [D, ...]
        g1_dev = tuple(
            a.reshape((d, n_seg) + a.shape[1:]) for a in g1_all
        )
        g1_sums = _scan_fold(fq, g1_dev)                 # [n_seg, ...]
        sum_b2 = _scan_fold(e2, g2_all)                  # [1?, ...] -> row
        s_u = tuple(x[0] for x in g1_sums)
        s_wit = tuple(x[1] for x in g1_sums)
        s_xt = tuple(x[2] for x in g1_sums)
        s_su = tuple(x[3] for x in g1_sums)
        s_rv = tuple(x[4] for x in g1_sums)

        # A  = alpha + U + r*delta
        # B2 = beta_2 + V_2 + s*delta_2
        # C  = wit + ht + s*U + r*V + (s*alpha + r*beta + rs*delta)
        def stack1(rows):
            return tuple(
                jnp.stack([r[i] for r in rows], axis=0) for i in range(3)
            )

        a1 = tuple(x[0] for x in g1_alpha)
        rd1 = tuple(x[0] for x in g1_rd)
        k1 = tuple(x[0] for x in g1_k)
        A = _scan_fold(fq, stack1([a1, s_u, rd1]))
        Cp = _scan_fold(fq, stack1([s_wit, s_xt, s_su, s_rv, k1]))
        b21 = tuple(x[0] for x in g2_beta)
        sd1 = tuple(x[0] for x in g2_sd)
        B2 = _scan_fold(e2, stack1([b21, sum_b2, sd1]))

        one = lambda t: tuple(a[None] for a in t)
        return one(A), one(B2), one(Cp)

    jac1 = tuple(P(None, None) for _ in range(3))
    jac2 = tuple(P(None, None, None) for _ in range(3))
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tshp(g1_parts), tshp(g2_parts),
                  trep(g1_alpha), trep(g1_rd), trep(g1_k), trep(g2_beta),
                  trep(g2_sd)),
        out_specs=(jac1, jac2, jac1),
        check_vma=False,
    )
    return fn(g1_parts, g2_parts, g1_alpha, g1_rd, g1_k, g2_beta, g2_sd)


# -- host helpers -------------------------------------------------------------

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


# -- public entry -------------------------------------------------------------

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

    # modules 1+2: sharded SpMV -> quotient coefficients. At n_pad >= d^2
    # the quotient runs as the four-step sharded NTT chain (explicit
    # all_to_all transposes, everything stays sharded — SURVEY §7 step 8);
    # below that the replicated ops/ntt.py path is cheaper than a d-way
    # four-step on toy domains.
    use_sharded_ntt = mat.n_pad >= d * d
    import logging as _lg
    import time as _time

    _log = _lg.getLogger("zkt.sharded_prove")
    _t0 = _time.time()

    def _stage(msg):
        _log.info("sharded_prove +%.1fs %s", _time.time() - _t0, msg)

    evs = _spmv_gather_jit(
        mesh, axis, not use_sharded_ntt,
        jnp.asarray(mat.a_idx), jnp.asarray(mat.a_val),
        jnp.asarray(mat.b_idx), jnp.asarray(mat.b_val),
        jnp.asarray(mat.c_idx), jnp.asarray(mat.c_val),
        w_mont,
    )
    jax.block_until_ready(evs)
    _stage("module 1 (SpMV) done")
    if use_sharded_ntt:
        from zk_toolkit_tpu.parallel.sharded_ntt import sharded_h_from_evs

        h_mont = sharded_h_from_evs(evs[0], evs[1], evs[2], mesh, axis)
        h_plain = L.from_mont(h_mont, fr)
    else:
        h_plain = _h_from_evs_jit(mat.n_pad, evs)
    jax.block_until_ready(h_plain)
    _stage("module 2 (quotient NTT) done")

    # modules 3+4: local Pippenger MSMs (collective-free)
    from zk_toolkit_tpu.ops import msm as M

    c_g1 = M.default_window_bits(max(segs))
    c_g2 = M.default_window_bits(segs[0])
    g1_parts = _local_msm_g1_jit(
        mesh, axis, segs, c_g1, None, crs.g1_u, g1_wit, g1_xt, crs.g1_v,
        u_scal, wit_scal, h_plain, su_scal, rv_scal,
    )
    jax.block_until_ready(g1_parts)
    _stage("module 3 (G1 local MSMs) done")
    g2_parts = _local_msm_g2_jit(mesh, axis, c_g2, None, crs.g2_v,
                                 u_scal)
    # Barrier before the collective module: bounds per-device queue skew so
    # no device reaches module 5's all_gather rendezvous >40 s before a
    # straggler (XLA-CPU aborts past that window — see sharded_msm.py).
    jax.block_until_ready((g1_parts, g2_parts))
    _stage("module 4 (G2 local MSM) done")

    # module 5: gather + fold + assemble
    A, B2, Cp = _combine_jit(
        mesh, axis, d, len(segs), g1_parts, g2_parts,
        crs.g1_alpha, g1_rd, g1_k, crs.g2_beta, g2_sd,
    )
    _stage("module 5 (combine) dispatched")
    a_aff = C.to_affine(fq, A)
    b_aff = C.to_affine(po.e2, B2)
    c_aff = C.to_affine(fq, Cp)
    return DeviceProof(a=a_aff, b=b_aff, c=c_aff)
