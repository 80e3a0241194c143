"""Tracing / profiling hooks.

The reference's only observability is println! narration in hot paths
(SURVEY.md §5 — pairing.rs:76-93, pinocchio/prover.rs:97); here the
structured replacements are:
- `trace(name)` — jax.profiler trace context (XLA op-level timeline) when
  ZKT_PROFILE_DIR is set, else a cheap wall-clock span logged at DEBUG;
- `timed(name)` — wall-clock span accumulating into a module-level table
  (`report()` dumps it), used by bench.py and the protocol drivers.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

log = logging.getLogger("zk_toolkit_tpu.profiling")

_SPANS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _SPANS[name].append(dt)
        log.debug("span %s: %.4fs", name, dt)


@contextlib.contextmanager
def trace(name: str):
    """XLA profiler trace when ZKT_PROFILE_DIR is set (view with
    tensorboard / xprof), else a timed() span."""
    from zk_toolkit_tpu.config import profile_dir

    d = profile_dir()
    if d:
        import jax

        with jax.profiler.trace(d), timed(name):
            yield
    else:
        with timed(name):
            yield


def report() -> dict:
    """{span: {count, total_s, mean_s}} for all spans so far."""
    return {
        k: {
            "count": len(v),
            "total_s": sum(v),
            "mean_s": sum(v) / len(v),
        }
        for k, v in _SPANS.items()
    }


def reset() -> None:
    _SPANS.clear()
