"""ctypes bindings for the C++ host engine (native/zkt_host.cpp) — the
framework's analog of the reference's mcl C++ FFI backend (mcl_rust,
SURVEY.md §2 L3'). Builds the shared library on first use with g++ (cached
next to the source); every entry point degrades gracefully to the pure-
Python host tier when no compiler is available."""

from zk_toolkit_tpu.native.host import FrEngine, available, engine

__all__ = ["FrEngine", "available", "engine"]
