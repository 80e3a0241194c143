"""Pluggable batched field-operation namespaces for the device tier.

Curve/pairing kernels (ops/curve_ops.py, ops/tower_ops.py) are written once
against this small protocol — `mul/sq/add/sub/neg/dbl/inv/is_zero/select/...`
over limb arrays — and instantiated for the base prime field here and for the
Fq2/Fq6/Fq12 tower in ops/tower_ops.py. This mirrors how the reference shares
one macro-generated group law across coordinate fields
(reference: curves/macros.rs:1-300 used by secp256k1, curve25519, and every
BLS12-381 tower level) but as composition instead of macros.

All values are Montgomery-form 16-bit limbs in uint32 lanes (ops/limbs.py);
an FqOps value has shape uint32[..., K]. Tower elements add leading structure
axes (see ops/tower_ops.py). `batch_shape(a)` strips the structure axes so
masks broadcast correctly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.ops import limbs as L


@dataclasses.dataclass(frozen=True)
class FqOps:
    """Base-prime-field ops bound to a FieldSpec. Hashable → usable as a jit
    static argument."""

    spec: L.FieldSpec

    # number of trailing structure axes (limb axis only)
    ndim_struct: int = 1

    def mul(self, a, b):
        return L.mont_mul(a, b, self.spec)

    def sq(self, a):
        return L.mont_sq(a, self.spec)

    def add(self, a, b):
        return L.add_mod(a, b, self.spec)

    def sub(self, a, b):
        return L.sub_mod(a, b, self.spec)

    def neg(self, a):
        return L.neg_mod(a, self.spec)

    def dbl(self, a):
        return L.add_mod(a, a, self.spec)

    def inv(self, a):
        return L.mont_inv(a, self.spec)

    def is_zero(self, a):
        """bool[...batch] — true where the element is 0."""
        return jnp.all(a == 0, axis=-1)

    def equal(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        """Elementwise: a where mask (bool[...batch]) else b."""
        m = mask
        for _ in range(self.ndim_struct):
            m = m[..., None]
        return jnp.where(m, a, b)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        """Montgomery 1 broadcast to a's shape."""
        return jnp.broadcast_to(jnp.asarray(self.spec.one_mont), a.shape)

    def const(self, value: int, shape_like):
        """Embed a host integer constant (Montgomery form), broadcast to the
        batch shape of `shape_like`."""
        v = (value % self.spec.p) * self.spec.r_mod_p % self.spec.p
        arr = np.asarray(L.int_to_limbs(v, self.spec.K), dtype=np.uint32)
        return jnp.broadcast_to(jnp.asarray(arr), shape_like.shape)
