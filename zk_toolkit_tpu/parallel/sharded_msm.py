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
