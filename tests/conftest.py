"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

Multi-chip sharding (parallel/ tests) is validated on
`--xla_force_host_platform_device_count=8` CPU devices, per the reference's
absence of any distributed tests (SURVEY.md §4) — all sharded paths must be
validated without physical TPU pods. These env vars must be set before jax
is imported anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The machine's sitecustomize registers the remote-TPU PJRT plugin in every
# python process when this var is set; tests must never touch the TPU tunnel.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: the limb-arithmetic scan bodies are large XLA
# graphs (a 256-bit scalar-mul step is ~10k ops) and cost minutes to compile
# on CPU; caching makes every run after the first near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
