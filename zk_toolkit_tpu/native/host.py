"""Python bindings for the native host Montgomery engine.

Usage:
    eng = engine(modulus)            # None if the library can't be built
    c = eng.mul(a, b)                # numpy uint64[n, 4] LE-limb arrays
    inv = eng.inv(a)                 # Montgomery-trick batch inversion
    t = eng.pow_table(w, n)          # [1, w, w^2, ...] for NTT domains
    ints = eng.to_ints(a)            # back to Python ints

All values are in Montgomery form unless converted with to_mont/from_mont.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "zkt_host.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libzkthost.so")


@functools.lru_cache(maxsize=1)
def _load():
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", lib, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        dll = ctypes.CDLL(lib)
    except OSError:
        return None
    dll.zkt_mont_init.restype = ctypes.c_int
    dll.zkt_mont_struct_size.restype = ctypes.c_int
    return dll


def available() -> bool:
    return _load() is not None


def _as_u64(a) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint64)
    assert a.ndim == 2 and a.shape[1] == 4
    return a


class FrEngine:
    """Batched Montgomery arithmetic mod an odd <= 256-bit prime."""

    def __init__(self, p: int):
        dll = _load()
        if dll is None:
            raise RuntimeError("native host engine unavailable (no g++?)")
        if p.bit_length() > 256:
            raise ValueError("FrEngine supports moduli up to 256 bits")
        self.dll = dll
        self.p = p
        self._m = ctypes.create_string_buffer(dll.zkt_mont_struct_size())
        p_le = np.frombuffer(p.to_bytes(32, "little"), dtype=np.uint64).copy()
        rc = dll.zkt_mont_init(
            p_le.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), self._m
        )
        if rc != 0:
            raise ValueError("modulus must be odd")

    # -- conversions --
    def from_ints(self, xs, to_mont: bool = True) -> np.ndarray:
        n = len(xs)
        out = np.zeros((n, 4), dtype=np.uint64)
        for i, x in enumerate(xs):
            out[i] = np.frombuffer((x % self.p).to_bytes(32, "little"), dtype=np.uint64)
        return self.to_mont(out) if to_mont else out

    def to_ints(self, a, from_mont: bool = True) -> list[int]:
        a = _as_u64(a)
        if from_mont:
            a = self.from_mont(a)
        return [int.from_bytes(row.tobytes(), "little") for row in a]

    def _binary(self, name, a, b):
        a, b = _as_u64(a), _as_u64(b)
        assert a.shape == b.shape
        out = np.empty_like(a)
        getattr(self.dll, name)(
            self._m,
            a.ctypes.data_as(ctypes.c_void_p),
            b.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_size_t(a.shape[0]),
        )
        return out

    def mul(self, a, b) -> np.ndarray:
        return self._binary("zkt_mul_batch", a, b)

    def add(self, a, b) -> np.ndarray:
        return self._binary("zkt_add_batch", a, b)

    def sub(self, a, b) -> np.ndarray:
        return self._binary("zkt_sub_batch", a, b)

    def mul_scalar(self, a, s) -> np.ndarray:
        a, s = _as_u64(a), _as_u64(s)
        out = np.empty_like(a)
        self.dll.zkt_mul_scalar_batch(
            self._m, a.ctypes.data_as(ctypes.c_void_p),
            s.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(a.shape[0]),
        )
        return out

    def _unary(self, name, a):
        a = _as_u64(a)
        out = np.empty_like(a)
        getattr(self.dll, name)(
            self._m, a.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(a.shape[0]),
        )
        return out

    def to_mont(self, a) -> np.ndarray:
        return self._unary("zkt_to_mont_batch", a)

    def from_mont(self, a) -> np.ndarray:
        return self._unary("zkt_from_mont_batch", a)

    def inv(self, a) -> np.ndarray:
        return self._unary("zkt_inv_batch", a)

    def pow_table(self, base: int, n: int) -> np.ndarray:
        """[base^0 .. base^(n-1)] in Montgomery form."""
        b = self.from_ints([base])
        out = np.empty((n, 4), dtype=np.uint64)
        self.dll.zkt_pow_table(
            self._m, b.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_size_t(n),
        )
        return out

    def repack16(self, a, k: int) -> np.ndarray:
        """Montgomery/plain 4x64 values -> device uint32 16-bit limb arrays."""
        a = _as_u64(a)
        out = np.empty((a.shape[0], k), dtype=np.uint32)
        self.dll.zkt_repack16(
            a.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_size_t(a.shape[0]), ctypes.c_int(k),
        )
        return out

    def unpack16(self, limbs: np.ndarray) -> np.ndarray:
        limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
        out = np.empty((limbs.shape[0], 4), dtype=np.uint64)
        self.dll.zkt_unpack16(
            limbs.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_size_t(limbs.shape[0]), ctypes.c_int(limbs.shape[1]),
        )
        return out


@functools.lru_cache(maxsize=None)
def engine(p: int) -> FrEngine | None:
    """Cached engine per modulus; None when the native library is missing."""
    if not available():
        return None
    try:
        return FrEngine(p)
    except Exception:
        return None
