"""Batched SHA-256 / SHA-512 / HMAC on device.

Device-tier counterpart of the host FIPS-180-4 engine (hashers/sha_common.py,
bit-parity with reference hasher/sha_common.rs:9-186): one dispatch hashes a
batch of equal-length messages, vectorized over the batch in uint32 lanes.
The block loop and the 64/80-round compression both run as `lax.scan`, so the
XLA graph is O(1) in message length.

SHA-512 needs 64-bit words; TPU vector lanes are 32-bit, so u64 values are
(hi, lo) uint32 pairs with explicit carry/rotate composition — the same
two-lane trick the field kernels use for wide limbs (ops/limbs.py).

Used by the batched device signature paths (ops/signature_ops.py): ECDSA's
message digest (reference ecdsa.rs:56) and Ed25519's r/k digests
(ed25519_sha512.rs:140-148).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.hashers import sha256 as h256
from zk_toolkit_tpu.hashers import sha512 as h512

_K256 = np.asarray(h256.K256, dtype=np.uint32)
_IV256 = np.asarray(h256.IV256, dtype=np.uint32)
_K512 = np.asarray(h512.K512, dtype=np.uint64)
_IV512 = np.asarray(h512.IV512, dtype=np.uint64)


def _rotr32(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


@functools.partial(jax.jit)
def _sha256_blocks(blocks):
    """blocks: uint32[B, NB, 16] big-endian words. Returns uint32[B, 8]."""
    k = jnp.asarray(_K256)

    def compress(h, block):
        def schedule_step(w, t):
            # w: [B, 16] sliding window; emit W[t] then roll
            s0 = _rotr32(w[:, 1], 7) ^ _rotr32(w[:, 1], 18) ^ (w[:, 1] >> jnp.uint32(3))
            s1 = _rotr32(w[:, 14], 17) ^ _rotr32(w[:, 14], 19) ^ (w[:, 14] >> jnp.uint32(10))
            nxt = w[:, 0] + s0 + w[:, 9] + s1
            out = w[:, 0]
            w = jnp.concatenate([w[:, 1:], nxt[:, None]], axis=1)
            return w, out

        _, ws = jax.lax.scan(schedule_step, block, jnp.arange(64))
        # ws: [64, B]

        def round_step(state, inp):
            a, b, c, d, e, f, g, hh = state
            kt, wt = inp
            s1 = _rotr32(e, 6) ^ _rotr32(e, 11) ^ _rotr32(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = hh + s1 + ch + kt + wt
            s0 = _rotr32(a, 2) ^ _rotr32(a, 13) ^ _rotr32(a, 22)
            maj = (a & b) ^ (a & c) ^ (b & c)
            t2 = s0 + maj
            return (t1 + t2, a, b, c, d + t1, e, f, g), None

        init = tuple(h[:, i] for i in range(8))
        out, _ = jax.lax.scan(round_step, init, (k, ws))
        return h + jnp.stack(out, axis=1), None

    b = blocks.shape[0]
    h0 = jnp.broadcast_to(jnp.asarray(_IV256), (b, 8))
    h, _ = jax.lax.scan(compress, h0, jnp.moveaxis(blocks, 1, 0))
    return h


# -- u64 as (hi, lo) uint32 pairs ----------------------------------------------

def _add64(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(jnp.uint32)
    return (a[0] + b[0] + carry, lo)


def _rotr64(a, n: int):
    hi, lo = a
    if n == 32:
        return (lo, hi)
    if n < 32:
        nh = jnp.uint32(n)
        inv = jnp.uint32(32 - n)
        return ((hi >> nh) | (lo << inv), (lo >> nh) | (hi << inv))
    m = n - 32
    nh = jnp.uint32(m)
    inv = jnp.uint32(32 - m)
    return ((lo >> nh) | (hi << inv), (hi >> nh) | (lo << inv))


def _shr64(a, n: int):
    hi, lo = a
    if n < 32:
        nh = jnp.uint32(n)
        inv = jnp.uint32(32 - n)
        return (hi >> nh, (lo >> nh) | (hi << inv))
    return (jnp.zeros_like(hi), hi >> jnp.uint32(n - 32))


def _xor64(*xs):
    hi = functools.reduce(jnp.bitwise_xor, [x[0] for x in xs])
    lo = functools.reduce(jnp.bitwise_xor, [x[1] for x in xs])
    return (hi, lo)


@functools.partial(jax.jit)
def _sha512_blocks(blocks_hi, blocks_lo):
    """blocks_{hi,lo}: uint32[B, NB, 16]. Returns (hi, lo) uint32[B, 8]."""
    k_hi = jnp.asarray((_K512 >> np.uint64(32)).astype(np.uint32))
    k_lo = jnp.asarray((_K512 & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    def compress(h, block):
        h_hi, h_lo = h
        bh, bl = block

        def schedule_step(w, t):
            wh, wl = w
            x1 = (wh[:, 1], wl[:, 1])
            x14 = (wh[:, 14], wl[:, 14])
            s0 = _xor64(_rotr64(x1, 1), _rotr64(x1, 8), _shr64(x1, 7))
            s1 = _xor64(_rotr64(x14, 19), _rotr64(x14, 61), _shr64(x14, 6))
            nxt = _add64(_add64((wh[:, 0], wl[:, 0]), s0), _add64((wh[:, 9], wl[:, 9]), s1))
            out = (wh[:, 0], wl[:, 0])
            wh = jnp.concatenate([wh[:, 1:], nxt[0][:, None]], axis=1)
            wl = jnp.concatenate([wl[:, 1:], nxt[1][:, None]], axis=1)
            return (wh, wl), out

        _, ws = jax.lax.scan(schedule_step, (bh, bl), jnp.arange(80))

        def round_step(state, inp):
            a, b, c, d, e, f, g, hh = state
            kt_hi, kt_lo, wt_hi, wt_lo = inp
            kt = (jnp.broadcast_to(kt_hi, a[0].shape), jnp.broadcast_to(kt_lo, a[0].shape))
            wt = (wt_hi, wt_lo)
            s1 = _xor64(_rotr64(e, 14), _rotr64(e, 18), _rotr64(e, 41))
            ch = ((e[0] & f[0]) ^ (~e[0] & g[0]), (e[1] & f[1]) ^ (~e[1] & g[1]))
            t1 = _add64(_add64(_add64(hh, s1), _add64(ch, kt)), wt)
            s0 = _xor64(_rotr64(a, 28), _rotr64(a, 34), _rotr64(a, 39))
            maj = (
                (a[0] & b[0]) ^ (a[0] & c[0]) ^ (b[0] & c[0]),
                (a[1] & b[1]) ^ (a[1] & c[1]) ^ (b[1] & c[1]),
            )
            t2 = _add64(s0, maj)
            return (_add64(t1, t2), a, b, c, _add64(d, t1), e, f, g), None

        init = tuple((h_hi[:, i], h_lo[:, i]) for i in range(8))
        out, _ = jax.lax.scan(round_step, init, (k_hi, k_lo, ws[0], ws[1]))
        nh = jnp.stack([_add64(x, y)[0] for x, y in zip(init, out)], axis=1)
        nl = jnp.stack([_add64(x, y)[1] for x, y in zip(init, out)], axis=1)
        return (nh, nl), None

    b = blocks_hi.shape[0]
    iv_hi = jnp.broadcast_to(jnp.asarray((_IV512 >> np.uint64(32)).astype(np.uint32)), (b, 8))
    iv_lo = jnp.broadcast_to(jnp.asarray((_IV512 & np.uint64(0xFFFFFFFF)).astype(np.uint32)), (b, 8))
    (h_hi, h_lo), _ = jax.lax.scan(
        compress, (iv_hi, iv_lo),
        (jnp.moveaxis(blocks_hi, 1, 0), jnp.moveaxis(blocks_lo, 1, 0)),
    )
    return h_hi, h_lo


# -- host-side padding + public batch API ---------------------------------------

def _pad_batch(msgs: np.ndarray, block_bytes: int, len_bytes: int) -> np.ndarray:
    """FIPS-180-4 padding of a batch of equal-length messages
    (host sha_common.pad_msg parity, reference sha_common.rs:158-186)."""
    b, length = msgs.shape
    total = length + 1 + len_bytes
    nblocks = -(-total // block_bytes)
    padded = np.zeros((b, nblocks * block_bytes), dtype=np.uint8)
    padded[:, :length] = msgs
    padded[:, length] = 0x80
    bitlen = length * 8
    padded[:, -len_bytes:] = np.frombuffer(
        bitlen.to_bytes(len_bytes, "big"), dtype=np.uint8
    )
    return padded


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """msgs: uint8[B, L] equal-length messages -> uint8[B, 32] digests."""
    msgs = np.atleast_2d(np.asarray(msgs, dtype=np.uint8))
    padded = _pad_batch(msgs, 64, 8)
    words = padded.reshape(msgs.shape[0], -1, 4)
    w32 = (
        words[..., 0].astype(np.uint32) << 24
    ) | (words[..., 1].astype(np.uint32) << 16) | (
        words[..., 2].astype(np.uint32) << 8
    ) | words[..., 3].astype(np.uint32)
    w32 = w32.reshape(msgs.shape[0], -1, 16)
    h = np.asarray(jax.device_get(_sha256_blocks(jnp.asarray(w32))))
    out = np.zeros((msgs.shape[0], 32), dtype=np.uint8)
    for i in range(8):
        out[:, 4 * i] = h[:, i] >> 24
        out[:, 4 * i + 1] = (h[:, i] >> 16) & 0xFF
        out[:, 4 * i + 2] = (h[:, i] >> 8) & 0xFF
        out[:, 4 * i + 3] = h[:, i] & 0xFF
    return out


def sha512_batch(msgs: np.ndarray) -> np.ndarray:
    """msgs: uint8[B, L] -> uint8[B, 64] digests."""
    msgs = np.atleast_2d(np.asarray(msgs, dtype=np.uint8))
    padded = _pad_batch(msgs, 128, 16)
    words = padded.reshape(msgs.shape[0], -1, 8)
    hi = np.zeros(words.shape[:2], dtype=np.uint32)
    lo = np.zeros(words.shape[:2], dtype=np.uint32)
    for i in range(4):
        hi = (hi << 8) | words[..., i]
        lo = (lo << 8) | words[..., 4 + i]
    hi = hi.reshape(msgs.shape[0], -1, 16)
    lo = lo.reshape(msgs.shape[0], -1, 16)
    hh, hl = _sha512_blocks(jnp.asarray(hi), jnp.asarray(lo))
    hh = np.asarray(jax.device_get(hh))
    hl = np.asarray(jax.device_get(hl))
    out = np.zeros((msgs.shape[0], 64), dtype=np.uint8)
    for i in range(8):
        for j in range(4):
            out[:, 8 * i + j] = (hh[:, i] >> (24 - 8 * j)) & 0xFF
            out[:, 8 * i + 4 + j] = (hl[:, i] >> (24 - 8 * j)) & 0xFF
    return out


def _hmac_batch(key: bytes, msgs: np.ndarray, hash_batch, block: int) -> np.ndarray:
    """RFC 2104 over a device hash (host hmac.py parity, reference
    hmac.rs:5-46): one shared key, a batch of messages."""
    if len(key) > block:
        key = bytes(hash_batch(np.frombuffer(key, dtype=np.uint8)[None])[0])
    key = key.ljust(block, b"\x00")
    k = np.frombuffer(key, dtype=np.uint8)
    msgs = np.atleast_2d(np.asarray(msgs, dtype=np.uint8))
    b = msgs.shape[0]
    ipad = np.broadcast_to(k ^ np.uint8(0x36), (b, block))
    opad = np.broadcast_to(k ^ np.uint8(0x5C), (b, block))
    inner = hash_batch(np.concatenate([ipad, msgs], axis=1))
    return hash_batch(np.concatenate([opad, inner], axis=1))


def hmac_sha256_batch(key: bytes, msgs: np.ndarray) -> np.ndarray:
    return _hmac_batch(key, msgs, sha256_batch, 64)


def hmac_sha512_batch(key: bytes, msgs: np.ndarray) -> np.ndarray:
    return _hmac_batch(key, msgs, sha512_batch, 128)
