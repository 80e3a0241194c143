"""Mesh-sharded multi-scalar multiplication.

Design (SURVEY.md §2 distributed plan, item c): the point/scalar stream is
placed with its leading axis sharded over the mesh (`NamedSharding`), and the
regular MSM executables run unchanged — XLA SPMD partitions every
batched stage and inserts the ICI collectives where stages cross shards:

- `sharded_msm` (batched-naive local math): the per-point double-and-add scan
  is embarrassingly parallel; only the top log2(D) levels of the final tree
  reduction move points (D-1 point transfers per MSM). Weak-scaling is
  compute-bound by construction.
- `sharded_msm_pippenger`: same placement through the Pippenger path; the
  digit sort and bucket scatter exchange stream elements across shards
  (the all-to-all phase), the merge tree is local until its top levels.

This is deliberately NOT `shard_map` and NOT per-device orchestration:
manual-SPMD tracing of the scan graphs takes XLA-CPU tens of minutes, and
per-device dispatch recompiles one executable per device (jit caches are
keyed by placement). Sharded-input auto-SPMD compiles once, in the same time
as the single-device module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import msm as M


def _pad_to_multiple(ops, pts, scalars, d: int):
    n = pts[0].shape[0]
    m = -(-n // d) * d
    if m == n:
        return pts, scalars
    pad = m - n
    inf = C.infinity_like(ops, tuple(a[:1] for a in pts))
    pts = tuple(
        jnp.concatenate([a, jnp.repeat(i, pad, axis=0)], axis=0)
        for a, i in zip(pts, inf)
    )
    z = jnp.zeros((pad,) + scalars.shape[1:], dtype=scalars.dtype)
    return pts, jnp.concatenate([scalars, z], axis=0)


def _place(mesh: Mesh, axis: str, pts, scalars):
    def sh(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        )

    return tuple(sh(a) for a in pts), sh(scalars)


def sharded_msm(ops, pts, scalars, nbits: int, mesh: Mesh, axis: str = "shard"):
    """sum_i k_i P_i via the batched-naive path with the stream sharded over
    `axis`. Returns a single Jacobian point tuple."""
    d = mesh.shape[axis]
    pts, scalars = _pad_to_multiple(ops, pts, scalars, d)
    pts, scalars = _place(mesh, axis, pts, scalars)
    return C.msm_naive(ops, pts, scalars, nbits)


def sharded_msm_pippenger(ops, pts, scalars, nbits: int, mesh: Mesh,
                          axis: str = "shard", c: int | None = None):
    """Pippenger with the stream sharded over the mesh (sort/scatter phases
    exchange elements across shards; compute phases stay local)."""
    d = mesh.shape[axis]
    pts, scalars = _pad_to_multiple(ops, pts, scalars, d)
    pts, scalars = _place(mesh, axis, pts, scalars)
    return M.msm_pippenger(ops, pts, scalars, nbits, c=c)


# -- explicit two-phase sharded MSM ------------------------------------------
#
# The BASELINE.json north star spelled out: "MSM points and bucket sums
# partitioned over chips with all-reduce". Phase 1 reshapes the stream to
# [D, n/D] with the device axis sharded and runs ONE batched Pippenger
# (ops/msm.py msm_pippenger_many) — every stage is elementwise along the
# device axis, so XLA partitions every executable with ZERO collectives
# (asserted over the compiled HLO in tests/test_parallel.py). Phase 2 is a
# thin shard_map that all_gathers the D partial points and folds them with a
# scanned add — the ONLY cross-chip traffic is D-1 Jacobian points per MSM,
# independent of stream length.

@functools.partial(jax.jit, static_argnames=("mesh", "axis", "ops"))
def _gather_fold_jit(mesh, axis, ops, parts):
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))
    rep = lambda a: P(*([None] * (a.ndim - 1)))

    def local(parts):
        full = tuple(
            jax.lax.all_gather(x, axis, axis=0, tiled=True) for x in parts
        )                                                # [D, ...]
        return C.scan_fold(ops, full)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(shp(a) for a in parts),),
        out_specs=tuple(rep(a) for a in parts),
        check_vma=False,
    )
    return fn(parts)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "ops", "nbits",
                                             "c"))
def _local_phase_jit(mesh, axis, ops, nbits, c, pts_r, scal_r):
    """Phase 1 as ONE shard_map module (manual SPMD): each device runs the
    compact traced Pippenger over its [1, n/D] slice — zero collectives by
    construction (asserted over the compiled HLO in tests/test_parallel.py).
    Manual SPMD is load-bearing: leaving the eager per-stage executables to
    auto-SPMD propagation let the partitioner replicate the sort/gather
    stages, which ran for tens of minutes at a few thousand points on the
    virtual CPU mesh (round-5 dryrun finding)."""
    shp = lambda a: P(axis, *([None] * (a.ndim - 1)))

    def local(pts_r, scal_r):
        return M.msm_pippenger_many_traced(ops, pts_r, scal_r, nbits, c)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(shp(a) for a in pts_r), shp(scal_r)),
        out_specs=tuple(
            P(axis, *([None] * (a.ndim - 2))) for a in pts_r
        ),
        check_vma=False,
    )
    return fn(pts_r, scal_r)


def sharded_msm_explicit(ops, pts, scalars, nbits: int, mesh: Mesh,
                         axis: str = "shard", c: int | None = None):
    """Two-phase sharded Pippenger: collective-free per-device local MSMs
    (shard_map compact pass) + one D-point all_gather/fold. Returns a single
    Jacobian point tuple (no batch axis)."""
    d = mesh.shape[axis]
    pts, scalars = _pad_to_multiple(ops, pts, scalars, d)
    n = pts[0].shape[0]
    pts_r = tuple(a.reshape((d, n // d) + a.shape[1:]) for a in pts)
    scal_r = scalars.reshape((d, n // d) + scalars.shape[1:])
    pts_r, scal_r = _place(mesh, axis, pts_r, scal_r)
    c = c or M.default_window_bits(n // d)
    parts = _local_phase_jit(mesh, axis, ops, nbits, c, pts_r, scal_r)
    # Barrier before the collective module: bounds per-device queue skew so
    # no device reaches the all_gather rendezvous >40 s before a straggler
    # (XLA-CPU aborts past that window — rendezvous.cc termination, the
    # true mechanism behind round 2's "6 of 8 arrived" deadlock).
    jax.block_until_ready(parts)
    return _gather_fold_jit(mesh, axis, ops, parts)
