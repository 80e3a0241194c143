"""Mesh-sharded multi-scalar multiplication.

Design (SURVEY.md §2 distributed plan, item c): points and scalars are
partitioned over the mesh's "shard" axis; every device runs the SAME local
MSM on its slice (embarrassingly parallel — zero communication during the
stream phase); the per-device partial results (one Jacobian point each) are
combined with a log2(D) tree of point adds. Total cross-device traffic is
D-1 points per MSM, so weak-scaling efficiency is compute-bound by
construction (>> the 80% BASELINE.md target).

Two paths:
- `sharded_msm` — shard_map + the batched-naive local MSM (compact scan
  graph, safe to trace as one SPMD program). Used by the multi-chip dry run
  and small/medium N.
- `sharded_msm_pippenger` — host-orchestrated: each device's slice runs the
  per-level Pippenger executables (ops/msm.py) with its own arrays; JAX's
  async dispatch pipelines the devices. Used for large N where Pippenger's
  work advantage dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

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


def sharded_msm(ops, pts, scalars, nbits: int, mesh: Mesh, axis: str = "shard",
                use_shard_map: bool | None = None):
    """sum_i k_i P_i with the point stream sharded over `axis`. Returns a
    single Jacobian point tuple.

    Two execution modes with identical semantics:
    - shard_map SPMD (default on accelerator meshes): one traced program,
      XLA partitions it; right when compile cost is amortized (TPU).
    - explicit per-device orchestration (default on CPU meshes): each device
      gets its slice and runs the SAME small jitted executables; JAX's async
      dispatch overlaps the devices. XLA-CPU takes tens of minutes to compile
      the SPMD scan program, so this is the only practical CPU-mesh path.
    Cross-device traffic is D-1 points either way."""
    d = mesh.shape[axis]
    pts, scalars = _pad_to_multiple(ops, pts, scalars, d)
    if use_shard_map is None:
        use_shard_map = all(
            dev.platform != "cpu" for dev in mesh.devices.flat
        )

    if use_shard_map:
        spec_pt = P(axis)

        def local(lpts, lscalars):
            part = C.msm_naive(ops, lpts, lscalars, nbits)
            return tuple(a[None] for a in part)

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_pt, spec_pt),
            out_specs=spec_pt,
            # the scan carry mixes replicated constants (infinity init,
            # curve consts) with shard-varying data; skip the varying-axis
            # type check
            check_vma=False,
        )
        partials = jax.jit(fn)(pts, scalars)  # [D, ...] one per device
    else:
        devs = list(mesh.devices.flat)
        n = pts[0].shape[0]
        step = n // d
        parts = []
        for i, dev in enumerate(devs):
            lo, hi = i * step, (i + 1) * step
            lp = tuple(jax.device_put(a[lo:hi], dev) for a in pts)
            ls = jax.device_put(scalars[lo:hi], dev)
            parts.append(C.msm_naive(ops, lp, ls, nbits))
        partials = tuple(
            jnp.stack([jax.device_put(p[i], devs[0]) for p in parts], axis=0)
            for i in range(3)
        )
    partials = C.pad_to_pow2(ops, partials)
    return C.tree_sum(ops, partials)


def sharded_msm_pippenger(ops, pts, scalars, nbits: int, mesh: Mesh,
                          axis: str = "shard", c: int | None = None):
    """Host-orchestrated per-device Pippenger: split the stream, run the
    shared per-level executables on each device's slice (async dispatch
    overlaps devices), tree-combine the D partials."""
    devs = list(mesh.devices.flat)
    d = len(devs)
    pts, scalars = _pad_to_multiple(ops, pts, scalars, d)
    n = pts[0].shape[0]
    step = n // d
    partials = []
    for i, dev in enumerate(devs):
        lo, hi = i * step, (i + 1) * step
        lp = tuple(jax.device_put(a[lo:hi], dev) for a in pts)
        ls = jax.device_put(scalars[lo:hi], dev)
        partials.append(M.msm_pippenger(ops, lp, ls, nbits, c=c))
    stacked = tuple(
        jnp.stack([jax.device_put(p[i], devs[0]) for p in partials], axis=0)
        for i in range(3)
    )
    stacked = C.pad_to_pow2(ops, stacked)
    return C.tree_sum(ops, stacked)
