"""Device SHA-256/512 + HMAC batch kernels vs hashlib/hmac (the NIST-vector
anchors live in tests/test_hashers.py for the host tier; reference vectors
sha256.rs:93-141, hmac.rs:54-85)."""

import hashlib
import hmac as hmac_mod

import numpy as np
import pytest

from zk_toolkit_tpu.ops import sha_ops as S


def _b(x: bytes) -> np.ndarray:
    return np.frombuffer(x, dtype=np.uint8)[None]


@pytest.mark.parametrize("msg", [b"", b"abc", b"a" * 55, b"a" * 56, b"a" * 200])
def test_sha256_vs_hashlib(msg):
    d = S.sha256_batch(_b(msg))
    assert bytes(d[0]).hex() == hashlib.sha256(msg).hexdigest()


@pytest.mark.parametrize("msg", [b"", b"abc", b"x" * 111, b"x" * 112, b"z" * 300])
def test_sha512_vs_hashlib(msg):
    d = S.sha512_batch(_b(msg))
    assert bytes(d[0]).hex() == hashlib.sha512(msg).hexdigest()


def test_sha256_batch_many():
    msgs = np.stack([
        np.frombuffer(bytes([i]) * 64, dtype=np.uint8) for i in range(8)
    ])
    d = S.sha256_batch(msgs)
    for i in range(8):
        assert bytes(d[i]).hex() == hashlib.sha256(bytes([i]) * 64).hexdigest()


@pytest.mark.parametrize("key", [b"key", bytes(range(100))])
def test_hmac_sha256(key):
    msg = b"The quick brown fox jumps over the lazy dog"
    d = S.hmac_sha256_batch(key, _b(msg))
    assert bytes(d[0]).hex() == hmac_mod.new(key, msg, hashlib.sha256).hexdigest()
