"""Device-mesh construction and sharding helpers — the framework's
communication backend.

The reference is a single-threaded, single-process library with NO
distributed layer (SURVEY.md §2: no threads, no rayon, no NCCL/MPI); this
package is greenfield TPU design. The mesh abstraction follows the standard
JAX recipe: pick a `Mesh` over the slice, annotate array shardings with
`NamedSharding`/`PartitionSpec`, and let XLA SPMD insert the ICI collectives
(psum/all_gather/all_to_all); explicit per-device orchestration is reserved
for the Pippenger MSM whose window loop is host-driven (sharded_msm.py).

Axis conventions used across the package:
- "shard": the long data axis — MSM points, R1CS constraint rows, NTT
  butterfly lanes, signature/pairing batch elements. Within one slice this
  axis rides ICI; across slices it is the DCN axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "shard",
              platform: str | None = None) -> Mesh:
    """1-D mesh over the first n_devices devices of `platform` (default: the
    default platform; falls back to the virtual CPU devices when the default
    platform has too few chips — the single-real-chip dev box case)."""
    devs = jax.devices(platform) if platform else jax.devices()
    n = n_devices or len(devs)
    if n > len(devs) and platform is None:
        devs = jax.devices("cpu")
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_leading(mesh: Mesh, x, axis: str = "shard"):
    """Place an array (or tuple of arrays) with its leading axis sharded."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    if isinstance(x, tuple):
        return tuple(put(a) for a in x)
    return put(x)


def replicate(mesh: Mesh, x):
    """Fully replicate an array (or tuple) over the mesh."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    if isinstance(x, tuple):
        return tuple(put(a) for a in x)
    return put(x)
