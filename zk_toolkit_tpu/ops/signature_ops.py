"""Batched signature operations on device — config 2 of BASELINE.json
("ECDSA + Ed25519 keygen/sign/verify, batched over the mesh") plus batched
BLS verification.

Each routine is the reference algorithm (behavioral spec cited per function)
restructured so that every group/field operation runs as ONE batched device
dispatch over all signatures; host code only packs bytes and does per-byte
encode/decode glue. Randomness (ECDSA k) is an injectable argument for
reproducible differential tests, per SURVEY.md §7 hard-part 5.

Batch sharding: every input is batched on its leading axis, so placing the
arrays with parallel.mesh.shard_leading runs these embarrassingly parallel
over a mesh (validated in tests/test_parallel.py for the pairing check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves import curve25519 as ed25519_curve
from zk_toolkit_tpu.curves import secp256k1
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import edwards_ops as E
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import sha_ops as S
from zk_toolkit_tpu.ops.field_ops import FqOps

# -- secp256k1 ECDSA -------------------------------------------------------------

_P_OPS = FqOps(L.field_spec(secp256k1.P))
_N_SPEC = L.field_spec(secp256k1.N)


@functools.lru_cache(maxsize=1)
def _secp_gen():
    return C.pack_points([secp256k1.g()], _P_OPS.spec)


def _tile(pt, n):
    return tuple(jnp.broadcast_to(a, (n,) + a.shape[1:]) for a in pt)


def _x_mod_n(pt_jac):
    """Affine x coordinate reduced mod the group order n (plain limbs).
    Valid because p < 2n for secp256k1 (one conditional subtract)."""
    ax, _, inf = C.to_affine(_P_OPS, pt_jac)
    x_plain = L.from_mont(ax, _P_OPS.spec)
    n_limbs = jnp.broadcast_to(jnp.asarray(_N_SPEC.p_limbs), x_plain.shape)
    diff, borrow = L._sub_limbs(x_plain, n_limbs)
    return jnp.where((borrow == 0)[..., None], diff, x_plain), inf


def _digest_to_z_plain(digests: np.ndarray) -> jnp.ndarray:
    """SHA-256 digests (uint8[B, 32], big-endian) -> z mod n as plain limbs
    (reference ecdsa.rs:56-60: digest interpreted as 256-bit BE integer,
    reduced mod n)."""
    b = digests.shape[0]
    z = np.zeros((b, _N_SPEC.K), dtype=np.uint32)
    le = digests[:, ::-1].astype(np.uint32)  # little-endian bytes
    for i in range(_N_SPEC.K):
        z[:, i] = le[:, 2 * i] | (le[:, 2 * i + 1] << 8)
    zj = jnp.asarray(z)
    # reduce mod n: digest < 2^256 < 2n -> one conditional subtract
    n_l = jnp.broadcast_to(jnp.asarray(_N_SPEC.p_limbs), zj.shape)
    diff, borrow = L._sub_limbs(zj, n_l)
    return jnp.where((borrow == 0)[..., None], diff, zj)


def ecdsa_keygen_batch(priv_plain):
    """Batched public-key derivation Q = d * G (reference ecdsa.rs:33-35).
    priv_plain: uint32[B, 16] plain limbs. Returns a Jacobian point tuple."""
    n = priv_plain.shape[0]
    return C.scalar_mul(_P_OPS, _tile(_secp_gen(), n), priv_plain, 256)


def ecdsa_sign_batch(priv_plain, k_plain, digests: np.ndarray):
    """Batched ECDSA signing (reference ecdsa.rs:37-85 with the fresh-k loop
    hoisted to the caller): r = (kG).x mod n, s = k^-1 (z + r d) mod n.
    priv_plain/k_plain: uint32[B, 16] plain limb scalars. Returns
    (r, s) plain limbs + ok mask (False where r or s is 0 — caller retries
    with new k, as the reference's loop does)."""
    n = k_plain.shape[0]
    kg = C.scalar_mul(_P_OPS, _tile(_secp_gen(), n), k_plain, 256)
    r_plain, inf = _x_mod_n(kg)
    z = _digest_to_z_plain(digests)
    spec = _N_SPEC
    r_m, z_m, d_m, k_m = (
        L.to_mont(r_plain, spec), L.to_mont(z, spec),
        L.to_mont(priv_plain, spec), L.to_mont(k_plain, spec),
    )
    s_m = L.mont_mul(
        L.mont_inv(k_m, spec),
        L.add_mod(z_m, L.mont_mul(r_m, d_m, spec), spec),
        spec,
    )
    s_plain = L.from_mont(s_m, spec)
    ok = (~inf) & jnp.any(r_plain != 0, axis=-1) & jnp.any(s_plain != 0, axis=-1)
    return r_plain, s_plain, ok


def ecdsa_verify_batch(r_plain, s_plain, pub_jac, digests: np.ndarray,
                       check_subgroup: bool = True):
    """Batched ECDSA verification with the reference's rejection checks
    (ecdsa.rs:88-135): pubkey on curve / not infinity / in subgroup, r and s
    in [1, n-1], then x(u1 G + u2 Q) mod n == r."""
    spec = _N_SPEC
    n = r_plain.shape[0]

    def in_range(v):
        nonzero = jnp.any(v != 0, axis=-1)
        _, borrow = L._sub_limbs(v, jnp.broadcast_to(jnp.asarray(spec.p_limbs), v.shape))
        return nonzero & (borrow == 1)  # v < n

    ok = in_range(r_plain) & in_range(s_plain)

    # pubkey checks (reference ecdsa.rs:96-110)
    px, py, pinf = C.to_affine(_P_OPS, pub_jac)
    x3b = _P_OPS.add(
        _P_OPS.mul(_P_OPS.sq(px), px), _P_OPS.const(7, px)
    )
    on_curve = jnp.all(_P_OPS.sq(py) == x3b, axis=-1)
    ok = ok & (~pinf) & on_curve
    if check_subgroup:
        n_scalar = C.pack_scalars([secp256k1.N] * n, 256)
        subgroup = C.is_infinity(_P_OPS, C.scalar_mul(_P_OPS, pub_jac, n_scalar, 256))
        ok = ok & subgroup

    z = _digest_to_z_plain(digests)
    s_inv = L.mont_inv(L.to_mont(s_plain, spec), spec)
    u1 = L.from_mont(L.mont_mul(L.to_mont(z, spec), s_inv, spec), spec)
    u2 = L.from_mont(L.mont_mul(L.to_mont(r_plain, spec), s_inv, spec), spec)
    p1 = C.scalar_mul(_P_OPS, _tile(_secp_gen(), n), u1, 256)
    p2 = C.scalar_mul(_P_OPS, pub_jac, u2, 256)
    total = C.point_add(_P_OPS, p1, p2)
    x_mod_n, inf = _x_mod_n(total)
    return ok & (~inf) & jnp.all(x_mod_n == r_plain, axis=-1)


# -- Ed25519 ----------------------------------------------------------------------

_ED = ed25519_curve
_ELL = _ED.L


def _le_bytes_to_int(rows: np.ndarray) -> list[int]:
    return [int.from_bytes(bytes(row.tobytes()), "little") for row in rows]


def ed25519_verify_batch(sigs: np.ndarray, pub_keys: np.ndarray, msgs: np.ndarray):
    """Batched RFC 8032 verify: 8S B == 8R + 8k A (reference
    ed25519_sha512.rs:160-186, incl. the cofactor-8 form). sigs uint8[B, 64],
    pub_keys uint8[B, 32], msgs uint8[B, L] equal length. Point decoding
    (batched sqrt x-recovery), the three scalar muls, and the k digest all
    run on device; host work is byte packing only."""
    b = sigs.shape[0]

    # R and A decode on DEVICE: batched sqrt x-recovery + parity select
    # (ops/edwards_ops.decode_points) — no per-element host crypto.
    dev_r, r_ok = E.decode_points(sigs[:, :32])
    dev_a, a_ok = E.decode_points(pub_keys)
    decode_ok = np.asarray(jax.device_get(r_ok & a_ok))

    # k = SHA512(R || A || msg) mod l, batched on device
    kin = np.concatenate([sigs[:, :32], pub_keys, msgs], axis=1)
    k_digest = S.sha512_batch(kin)
    ks = [(v % _ELL) for v in _le_bytes_to_int(k_digest)]
    ss = [v % (1 << 256) for v in _le_bytes_to_int(sigs[:, 32:])]
    s_in_range = [v < _ELL for v in ss]

    dev_b = _tile(E.pack_points([_ED.B()] * 1), b)
    s8 = C.pack_scalars([v * 8 for v in ss], 260)
    k8 = C.pack_scalars([k * 8 % (_ELL * 8) for k in ks], 260)
    eight = C.pack_scalars([8] * b, 260)

    lhs = E.scalar_mul(dev_b, s8, 260)
    r8 = E.scalar_mul(dev_r, eight, 260)
    ka8 = E.scalar_mul(dev_a, k8, 260)
    rhs = E.point_add(r8, ka8)
    lx, ly = E.to_affine(lhs)
    rx, ry = E.to_affine(rhs)
    eq = jnp.all(lx == rx, axis=-1) & jnp.all(ly == ry, axis=-1)
    ok = np.asarray(jax.device_get(eq))
    return decode_ok & ok & np.asarray(s_in_range)


def ed25519_sign_batch(prv_keys: np.ndarray, msgs: np.ndarray) -> np.ndarray:
    """Batched RFC 8032 signing (reference ed25519_sha512.rs:127-158):
    per-key pruning/prefix on host, r/k digests and the two scalar muls
    batched on device. Returns uint8[B, 64] signatures."""
    b = prv_keys.shape[0]
    host = __import__("zk_toolkit_tpu.signatures.ed25519", fromlist=["Ed25519Sha512"])
    eng = host.Ed25519Sha512()

    h = S.sha512_batch(prv_keys)
    s_scalars, prefixes = [], []
    for i in range(b):
        lower = bytearray(h[i, :32].tobytes())
        host.Ed25519Sha512._prune(lower)
        s_scalars.append(int.from_bytes(bytes(lower), "little"))
        prefixes.append(h[i, 32:])

    a_pts_dev = E.scalar_mul(
        _tile(E.pack_points([_ED.B()]), b), C.pack_scalars(s_scalars, 256), 256
    )
    a_enc = _encode_points_batch(a_pts_dev)

    r_in = np.concatenate([np.stack(prefixes), msgs], axis=1)
    rs = [v % _ELL for v in _le_bytes_to_int(S.sha512_batch(r_in))]
    r_pts_dev = E.scalar_mul(
        _tile(E.pack_points([_ED.B()]), b), C.pack_scalars(rs, 256), 256
    )
    r_enc = _encode_points_batch(r_pts_dev)

    k_in = np.concatenate([r_enc, a_enc, msgs], axis=1)
    ks = [v % _ELL for v in _le_bytes_to_int(S.sha512_batch(k_in))]
    out = np.zeros((b, 64), dtype=np.uint8)
    for i in range(b):
        s_val = (rs[i] + ks[i] * s_scalars[i]) % _ELL
        out[i, :32] = r_enc[i]
        out[i, 32:] = np.frombuffer(s_val.to_bytes(32, "little"), dtype=np.uint8)
    return out


def _encode_points_batch(p_ext) -> np.ndarray:
    """Batched point encoding — device byte assembly (edwards_ops
    encode_points); kept as an alias for callers/tests."""
    return E.encode_points(p_ext)


# -- BLS ----------------------------------------------------------------------------

def bls_verify_batch(msgs: list[bytes], sigs: list, pks: list,
                     hash_fn=None) -> np.ndarray:
    """Batched BLS verification e(g1, sig) == e(pk, H(m)) (reference
    bls12_381/signature.rs:29-44) as one pairing-product batch
    e(-g1, sig) * e(pk, H(m)) == 1 with a single shared final
    exponentiation."""
    from zk_toolkit_tpu.curves.bls12_381 import g1, g2
    from zk_toolkit_tpu.ops import pairing_ops as PO

    hash_fn = hash_fn or g2.hash_to_g2point
    po = PO.bls_pairing_ops()
    spec = po.f.spec
    b = len(msgs)
    neg_g1 = -g1.g()
    p_rows = [[neg_g1, pk] for pk in pks]
    q_rows = [[sig, hash_fn(m)] for sig, m in zip(sigs, msgs)]
    pa = [PO.pack_g1_affine(r, spec) for r in p_rows]
    qa = [PO.pack_g2_affine(r, spec) for r in q_rows]
    p_b = tuple(jnp.stack([r[i] for r in pa]) for i in range(3))
    q_b = tuple(jnp.stack([r[i] for r in qa]) for i in range(3))
    ok = PO.pairing_product_is_one(po, p_b, q_b)
    return np.asarray(jax.device_get(ok))
