"""SHA-256/512 + HMAC known-answer tests.

Vector corpus mirrors the reference's NIST anchors
(reference: sha256.rs:93-205 — empty msg, "abc", long messages, padding
boundaries at 0/1/55/56 bytes; hmac.rs:54-85) and additionally cross-checks
every case against Python's hashlib.
"""

import hashlib
import hmac as py_hmac

import pytest

from zk_toolkit_tpu.hashers import Sha256, Sha512, HmacSha256, HmacSha512

pytestmark = pytest.mark.quick

NIST_SHA256 = {
    b"": "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
    b"abc": "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
    b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq":
        "248d6a61d20638b8e5c026930c3e6039a33ce45964ff2167f6ecedd419db06c1",
}

NIST_SHA512 = {
    b"": ("cf83e1357eefb8bdf1542850d66d8007d620e4050b5715dc83f4a921d36ce9ce"
          "47d0d13c5d85f2b0ff8318d2877eec2f63b931bd47417a81a538327af927da3e"),
    b"abc": ("ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a"
             "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"),
}


@pytest.mark.parametrize("msg,want", list(NIST_SHA256.items()))
def test_sha256_nist_vectors(msg, want):
    assert Sha256.get_digest(msg).hex() == want


@pytest.mark.parametrize("msg,want", list(NIST_SHA512.items()))
def test_sha512_nist_vectors(msg, want):
    assert Sha512.get_digest(msg).hex() == want


def test_sha256_million_a():
    # NIST long vector: 1,000,000 x 'a' (reference sha256.rs long-message test)
    assert Sha256.get_digest(b"a" * 1_000_000).hex() == \
        "cdc76e5c9914fb9281a1c7e284d73e67f1809a48a497200e046d39ccc7112cd0"


@pytest.mark.parametrize("n", [0, 1, 54, 55, 56, 57, 63, 64, 65, 111, 112, 113, 127, 128, 129, 1000])
def test_padding_boundaries_vs_hashlib(n):
    msg = bytes(range(256)) * 4
    msg = msg[:n]
    assert Sha256.get_digest(msg) == hashlib.sha256(msg).digest()
    assert Sha512.get_digest(msg) == hashlib.sha512(msg).digest()


@pytest.mark.parametrize(
    "key,text",
    [
        (b"", b""),
        (b"key", b"The quick brown fox jumps over the lazy dog"),
        (b"k" * 100, b"long key forces key hashing"),  # key > block size
        (b"k" * 64, b"exact block size key"),
        (b"\x0b" * 20, b"Hi There"),  # RFC 4231 case 1
    ],
)
def test_hmac_vs_hashlib(key, text):
    assert HmacSha256().get_digest(key, text) == py_hmac.new(key, text, hashlib.sha256).digest()
    assert HmacSha512().get_digest(key, text) == py_hmac.new(key, text, hashlib.sha512).digest()


def test_hmac_rfc4231_case1():
    # RFC 4231 test case 1 known answer
    d = HmacSha256().get_digest(b"\x0b" * 20, b"Hi There")
    assert d.hex() == "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7"
