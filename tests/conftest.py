"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/ tests) is validated on
`--xla_force_host_platform_device_count=8` CPU devices, per the reference's
absence of any distributed tests (SURVEY.md §4) — all sharded paths must be
validated without physical TPU pods. These env vars must be set before jax
is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
