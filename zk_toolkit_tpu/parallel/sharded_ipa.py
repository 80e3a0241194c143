"""Mesh-sharded Bulletproofs vector folds (SURVEY.md §2 distributed plan,
item e).

The device IPA (protocols/bulletproofs_device.py) is built from batched
leading-axis primitives — scalar folds (Montgomery mul/add), basis folds
(batched scalar-mul + point add) and half-vector MSMs. Sharding is therefore
placement, not new math: put the vectors on the mesh with their leading axis
partitioned and every fold round runs SPMD with zero cross-device traffic;
only the per-round L/R MSM reductions move points (log D tree, D-1 points).
"""

from __future__ import annotations

from jax.sharding import Mesh

from zk_toolkit_tpu.parallel.mesh import shard_leading


def shard_ipa_inputs(mesh: Mesh, gg, hh, a, b, axis: str = "shard"):
    """Place IPA inputs with the vector axis sharded over the mesh; the
    returned arrays drop into DeviceBulletproofs.inner_product_argument
    unchanged (u/P stay replicated singletons)."""
    return (
        shard_leading(mesh, gg, axis),
        shard_leading(mesh, hh, axis),
        shard_leading(mesh, a, axis),
        shard_leading(mesh, b, axis),
    )
