"""Test configuration.

- Multi-chip sharding tests (tests/test_parallel.py) ALWAYS run on a virtual
  8-device CPU mesh (`--xla_force_host_platform_device_count=8`), per the
  reference's absence of any distributed tests (SURVEY.md §4) — sharded paths
  must be validated without a physical pod. They request the CPU platform
  explicitly via make_mesh(platform="cpu").
- Everything else runs on the default platform: the real TPU when the axon
  tunnel is up (the target hardware, and XLA-TPU compiles these limb-heavy
  graphs ~50x faster than XLA-CPU's LLVM path), CPU otherwise.

XLA_FLAGS must be set before jax initializes any backend. The machine's
sitecustomize imports jax at interpreter startup, so env vars alone are too
late for jax's import-time config reads — but backends initialize lazily, so
setting XLA_FLAGS here still works, and platform fallback goes through
jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "cpu" in os.environ.get("JAX_PLATFORMS", "") and \
        "xla_backend_optimization_level" not in flags:
    # CPU-only runs are correctness gates, not perf gates: XLA-CPU's LLVM
    # pipeline takes minutes per limb-heavy scan body at full optimization
    # and ~40x less at O0 (measured on scalar_mul: 580s+ -> 16s).
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache: scan bodies (Miller loop, scalar mul) are
# large XLA graphs; caching makes every run after the first near-instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# sitecustomize imports jax at interpreter startup, freezing env-var config
# reads — the cache dir must go through the config API to take effect.
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

try:
    jax.devices()
except Exception:
    # No TPU tunnel (or misconfigured accelerator): fall back to CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.devices()
