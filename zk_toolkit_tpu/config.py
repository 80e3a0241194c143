"""Curve/field registry and runtime configuration.

The reference hardcodes every parameter in lazy statics scattered across
files (SURVEY.md §5 'Config / flag system: none' — secp256k1/affine_point.rs
:30-47, bls12_381/params.rs:8-17, curve25519/affine_point.rs:41-53); this is
the central registry the TPU framework uses to bind host curves to device
field specs and mesh settings.

Environment knobs:
- ZKT_PLATFORM: override jax platform for library entry points ("cpu"/"axon")
- ZKT_MSM_WINDOW: force the Pippenger window size (must divide 16)
- ZKT_PROFILE_DIR: when set, profiling.trace() writes jax profiler traces here
"""

from __future__ import annotations

import dataclasses
import functools
import os


@dataclasses.dataclass(frozen=True)
class CurveInfo:
    """Static description of one curve family."""

    name: str
    base_modulus: int          # coordinate field p
    group_order: int           # scalar field / subgroup order r
    generator: tuple           # affine generator coords (ints; Fq2 as pairs)
    kind: str                  # "weierstrass-b" | "edwards" | "bls12-pairing"
    b: int | tuple | None = None

    @property
    def limbs(self) -> int:
        from zk_toolkit_tpu.utils.bigint import num_limbs

        return num_limbs(self.base_modulus.bit_length())

    def field_spec(self):
        """Device-tier Montgomery spec for the coordinate field."""
        from zk_toolkit_tpu.ops import limbs as L

        return L.field_spec(self.base_modulus)

    def scalar_spec(self):
        from zk_toolkit_tpu.ops import limbs as L

        return L.field_spec(self.group_order)


@functools.lru_cache(maxsize=1)
def registry() -> dict:
    from zk_toolkit_tpu.curves import secp256k1, curve25519
    from zk_toolkit_tpu.curves.bls12_381 import params as bls

    sec = CurveInfo(
        name="secp256k1",
        base_modulus=secp256k1.P,
        group_order=secp256k1.N,
        generator=(secp256k1.GX, secp256k1.GY),
        kind="weierstrass-b",
        b=7,
    )
    ed = CurveInfo(
        name="curve25519",
        base_modulus=curve25519.Q,
        group_order=curve25519.L,
        generator=(),  # derived: x recovered from y = 4/5 (RFC 8032)
        kind="edwards",
    )
    from zk_toolkit_tpu.curves.bls12_381 import g1 as bg1

    bls_g1 = CurveInfo(
        name="bls12_381_g1",
        base_modulus=bls.Q,
        group_order=bls.R,
        generator=(bg1.GX, bg1.GY),
        kind="bls12-pairing",
        b=4,
    )
    return {c.name: c for c in (sec, ed, bls_g1)}


def curve(name: str) -> CurveInfo:
    reg = registry()
    if name not in reg:
        raise KeyError(f"unknown curve {name!r}; have {sorted(reg)}")
    return reg[name]


def msm_window_override() -> int | None:
    v = os.environ.get("ZKT_MSM_WINDOW")
    return int(v) if v else None


def profile_dir() -> str | None:
    return os.environ.get("ZKT_PROFILE_DIR") or None
