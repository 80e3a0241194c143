"""Groth16 on the device tier: SpMV + NTT quotient + Pippenger MSMs + batched
pairing product — the TPU-native counterpart of the reference's mcl-backed
Groth16 (reference groth16/mcl_based/{prover,crs,verifier}.rs), scaled past
its O(n^2) QAP (qap.rs:33-97) via the roots-of-unity evaluation domain.

Pipeline differences vs the host tier (protocols/groth16.py, which is
bit-parity with the reference's zktoolkit_based variant):
- The QAP interpolation domain is H = <w_n> (n = constraints padded to a
  power of two) instead of x = 1..n, so witness-column interpolation is an
  INTT and division by the vanishing polynomial is a constant multiply on a
  coset (ops/ntt.py). Proofs are therefore not byte-identical to the host
  tier's, but are verified by the same Groth16 equation; bit-exactness of the
  device pipeline is asserted against trapdoor-side scalar recomputation in
  tests (the prover itself never sees the trapdoor).
- All proof-element group sums run as Pippenger MSMs (ops/msm.py); the
  verifier folds its four pairings into one Miller-loop batch with a shared
  final exponentiation (ops/pairing_ops.py `pairing_product_is_one`).

Trapdoor (tau, alpha, beta, gamma, delta) and prover randomness (r, s) are
injectable for reproducible differential tests — the reference samples these
from OS entropy (crs.rs:49-64, prover.rs:100-101), which SURVEY.md §7 flags
as the thing to make pluggable.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves.bls12_381 import g1, g2, params
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import fixed_base as FB
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import msm as MSM
from zk_toolkit_tpu.ops import ntt as NTT
from zk_toolkit_tpu.ops import pairing_ops as PO
from zk_toolkit_tpu.ops.field_ops import FqOps
from zk_toolkit_tpu.snark import gate as gate_mod
from zk_toolkit_tpu.snark import term as T
from zk_toolkit_tpu.snark.equation_parser import EquationParser
from zk_toolkit_tpu.snark.r1cs import R1CS, R1CSTmpl
from zk_toolkit_tpu.utils.bigint import int_to_limbs
from zk_toolkit_tpu.utils.rng import Rng

R = params.R
FR_BITS = 256  # scalar limb width for MSM digit extraction (16 limbs)


def _fq_ops() -> FqOps:
    return FqOps(L.field_spec(params.Q))


def _fr_spec():
    return L.field_spec(R)


# -- circuit matrices ----------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class CircuitMatrices:
    """Host-frontend R1CS lowered to padded-row device arrays.

    a_idx/b_idx/c_idx: int32[n_pad, kmax] wire indices (0 for padding),
    a_val/...: uint32[n_pad, kmax, K] Montgomery coefficients (0 for padding).
    Padded constraint rows are all-zero: 0 * 0 = 0 holds for any witness.
    """

    n: int          # real constraint count
    n_pad: int      # power-of-two NTT domain size
    m: int          # last wire index (witness length - 1)
    l: int          # last statement index
    kmax: int
    a_idx: np.ndarray
    b_idx: np.ndarray
    c_idx: np.ndarray
    a_val: np.ndarray
    b_val: np.ndarray
    c_val: np.ndarray
    tmpl: object    # host R1CSTmpl (kept for witness binding / oracle tests)

    @staticmethod
    def from_expr(expr: str) -> "CircuitMatrices":
        f = params.SUBGROUP
        eq = EquationParser.parse(f, expr)
        gates = gate_mod.build(f, eq)
        tmpl = R1CSTmpl(f, gates)
        return CircuitMatrices.from_tmpl(tmpl)

    @staticmethod
    def from_tmpl(tmpl) -> "CircuitMatrices":
        spec = _fr_spec()
        n = len(tmpl.constraints)
        n_pad = max(2, 1 << (n - 1).bit_length())
        rows = [
            [list(cons.a), list(cons.b), list(cons.c)]
            for cons in tmpl.constraints
        ]
        kmax = max(
            (len(side) for row in rows for side in row), default=1
        ) or 1
        shape_i = (n_pad, kmax)
        mats_idx = [np.zeros(shape_i, dtype=np.int32) for _ in range(3)]
        mats_val = [
            np.zeros(shape_i + (spec.K,), dtype=np.uint32) for _ in range(3)
        ]
        for j, row in enumerate(rows):
            for s, side in enumerate(row):
                for k, (idx, coeff) in enumerate(side):
                    mats_idx[s][j, k] = idx
                    mats_val[s][j, k] = int_to_limbs(
                        coeff.e * spec.r_mod_p % R, spec.K
                    )
        return CircuitMatrices(
            n=n,
            n_pad=n_pad,
            m=len(tmpl.witness) - 1,
            l=tmpl.mid_beg - 1,
            kmax=kmax,
            a_idx=mats_idx[0], b_idx=mats_idx[1], c_idx=mats_idx[2],
            a_val=mats_val[0], b_val=mats_val[1], c_val=mats_val[2],
            tmpl=tmpl,
        )


jax.tree_util.register_dataclass(
    CircuitMatrices,
    data_fields=["a_idx", "b_idx", "c_idx", "a_val", "b_val", "c_val"],
    meta_fields=["n", "n_pad", "m", "l", "kmax", "tmpl"],
)


@functools.partial(jax.jit, static_argnums=(4,))
def _spmv(idx, val, w_mont, _unused, spec):
    """Padded-row sparse matrix * witness over Fr:
    out[j] = sum_k val[j, k] * w[idx[j, k]]. One gather + one stacked
    Montgomery multiply + a log-depth pairwise fold over the nnz axis."""
    gathered = jnp.take(w_mont, idx, axis=0)          # [n, kmax, K]
    prods = L.mont_mul(val, gathered, spec)
    kmax = prods.shape[1]
    while kmax > 1:
        half = kmax // 2
        lo = prods[:, :half]
        hi = prods[:, half : 2 * half]
        rest = prods[:, 2 * half :]
        prods = jnp.concatenate([L.add_mod(lo, hi, spec), rest], axis=1)
        kmax = prods.shape[1]
    return prods[:, 0]


def spmv(idx, val, w_mont, spec):
    return _spmv(jnp.asarray(idx), jnp.asarray(val), w_mont, None, spec)


# -- device point helpers -------------------------------------------------------

def _tile_point(pt, n):
    return tuple(jnp.broadcast_to(a, (n,) + a.shape[-1:]) for a in pt)


FB_WINDOW = 8  # fixed-base window bits (table = 32 windows x 256 entries)


@functools.lru_cache(maxsize=1)
def _g1_base():
    spec = _fq_ops().spec
    return C.pack_points([g1.g()], spec)


@functools.lru_cache(maxsize=1)
def _g1_table():
    return FB.build_table_cached(
        _fq_ops(), _g1_base(), FR_BITS, FB_WINDOW, key="bls12_381_g1"
    )


def fixed_base_g1(scalars_plain):
    """[k_i * G1] batched: windowed table gathers + a log-depth add tree
    (replaces round 1's 256-step double-and-add scan, which kept the whole
    scalar batch's Jacobian triples live and OOM'd at CRS scale)."""
    return FB.scalar_mul_fixed(
        _fq_ops(), _g1_table(), scalars_plain, FB_WINDOW
    )


@functools.lru_cache(maxsize=1)
def _g2_base():
    spec = _fq_ops().spec
    po = PO.bls_pairing_ops()
    xq, yq, _ = PO.pack_g2_affine([g2.g()], spec)
    one = po.e2.one_like(xq)
    return (xq, yq, one)


@functools.lru_cache(maxsize=1)
def _g2_table():
    po = PO.bls_pairing_ops()
    return FB.build_table_cached(
        po.e2, _g2_base(), FR_BITS, FB_WINDOW, key="bls12_381_g2"
    )


def fixed_base_g2(scalars_plain):
    po = PO.bls_pairing_ops()
    return FB.scalar_mul_fixed(
        po.e2, _g2_table(), scalars_plain, FB_WINDOW
    )


def _pack_fr_plain(xs) -> jnp.ndarray:
    from zk_toolkit_tpu.native import engine

    eng = engine(R)
    if eng is not None and len(xs) > 64:
        vals = eng.from_ints([int(x) for x in xs], to_mont=False)
        return jnp.asarray(eng.repack16(vals, 16))
    return C.pack_scalars([int(x) % R for x in xs], FR_BITS)


def _mont_to_plain_scalars(mont, spec):
    return L.from_mont(mont, spec)


# -- CRS -------------------------------------------------------------------------

@dataclasses.dataclass(eq=False)
class DeviceCRS:
    """Groth16 CRS over the NTT domain, all group elements resident on
    device. Field names follow the reference CRS (zktoolkit_based/crs.rs
    :49-146): uvw_stmt = (beta*u_i + alpha*v_i + w_i)/gamma for statement
    wires, uvw_wit = .../delta for witness wires, xt = tau^k t(tau)/delta."""

    mat: CircuitMatrices
    g1_alpha: tuple
    g1_beta: tuple
    g1_delta: tuple
    g2_beta: tuple
    g2_gamma: tuple
    g2_delta: tuple
    g1_u: tuple        # [m+1] u_i(tau) in G1
    g1_v: tuple        # [m+1] v_i(tau) in G1
    g2_v: tuple        # [m+1] v_i(tau) in G2
    g1_uvw_stmt: tuple  # [l+1]
    g1_uvw_wit: tuple   # [m-l]
    g1_xt: tuple        # [n_pad-1] tau^k t(tau)/delta
    # Note: e(alpha_1, beta_2) is deliberately NOT stored here (the reference
    # CRS precomputes it, crs.rs:140-146): the device verifier folds
    # alpha/beta into its one pairing product, and the host oracle verifier
    # recomputes it — a cached GT leaf would force a Miller-loop compile into
    # CRS construction for nothing.

    @staticmethod
    def generate(mat: CircuitMatrices, rng: Rng | None = None) -> "DeviceCRS":
        rng = rng or Rng()
        f = params.SUBGROUP
        tau = f.rand_elem(True, rng).e
        alpha = f.rand_elem(True, rng).e
        beta = f.rand_elem(True, rng).e
        gamma = f.rand_elem(True, rng).e
        delta = f.rand_elem(True, rng).e
        return DeviceCRS.from_trapdoor(mat, tau, alpha, beta, gamma, delta)

    @staticmethod
    def from_trapdoor(mat, tau, alpha, beta, gamma, delta,
                      host_points: bool = False,
                      point_mode: str | None = None) -> "DeviceCRS":
        """point_mode selects how the CRS group elements are produced:
        - "table" (default): windowed fixed-base device tables — fastest at
          CRS scale, but the table build itself is the heaviest compile in
          the repo (256-entry scans over both groups).
        - "scan": ONE batched double-and-add scan per group on device —
          minutes cheaper to compile, used by the CPU-mesh multichip dryrun
          and small tests (replaces round 2's host-bigint path, which burned
          ~280 s of pure host Python before any compile started).
        - "host": host-tier bigint scalar mults (the slow oracle path).
        host_points=True is back-compat for "host"."""
        n_pad, m, l = mat.n_pad, mat.m, mat.l
        dom = NTT.fr_domain(n_pad)
        # Lagrange-basis values over H at tau (host bigints; O(n) work):
        # L_j(tau) = (tau^n - 1) * w^j / (n * (tau - w^j)).
        t_tau = (pow(tau, n_pad, R) - 1) % R
        n_inv = pow(n_pad, -1, R)
        from zk_toolkit_tpu.native import engine

        eng = engine(R)
        if eng is not None:
            # native batch path (the mcl-analog host engine): one power
            # table, one batched inversion, two batched multiplies
            wj_t = eng.pow_table(dom.w, n_pad)
            tau_arr = np.repeat(eng.from_ints([tau]), n_pad, axis=0)
            den_inv = eng.inv(eng.sub(tau_arr, wj_t))
            coef = eng.from_ints([t_tau * n_inv % R])
            lag = eng.to_ints(eng.mul(eng.mul_scalar(wj_t, coef), den_inv))
        else:
            lag = []
            wj = 1
            for j in range(n_pad):
                lag.append(
                    t_tau * wj % R * pow((tau - wj) % R, -1, R) % R * n_inv % R
                )
                wj = wj * dom.w % R
        # u_i(tau), v_i(tau), w_i(tau) per wire column (host sparse sums).
        u = [0] * (m + 1)
        v = [0] * (m + 1)
        w = [0] * (m + 1)
        for j, cons in enumerate(mat.tmpl.constraints):
            for acc, side in ((u, cons.a), (v, cons.b), (w, cons.c)):
                for idx, coeff in side:
                    acc[idx] = (acc[idx] + coeff.e * lag[j]) % R
        gamma_inv = pow(gamma, -1, R)
        delta_inv = pow(delta, -1, R)
        uvw = [
            (beta * u[i] + alpha * v[i] + w[i]) % R for i in range(m + 1)
        ]
        uvw_stmt = [x * gamma_inv % R for x in uvw[: l + 1]]
        uvw_wit = [x * delta_inv % R for x in uvw[l + 1 :]]
        xt = []
        cur = t_tau * delta_inv % R
        for _ in range(n_pad - 1):
            xt.append(cur)
            cur = cur * tau % R

        # one batched fixed-base scan per group
        g1_scalars = (
            [alpha, beta, delta] + u + v + uvw_stmt + uvw_wit + xt
        )
        g2_scalars = [beta, gamma, delta] + v
        mode = point_mode or ("host" if host_points else "table")
        if mode == "host":
            # raw-int host Jacobian (utils/host_curve.py): ~1 ms per
            # generator multiple, no device compile at all — the multichip
            # dryrun path (round 2's object-tier version of this branch
            # burned ~280 s of host Python here).
            from zk_toolkit_tpu.utils import host_curve as HC

            spec = _fq_ops().spec
            f1 = HC.FpHost(params.Q)
            f2 = HC.Fp2Host(params.Q)
            gp = g1.g()
            qp = g2.g()
            g1_pts = HC.pack_g1_jac(
                HC.multi_mul(f1, (gp.x.e, gp.y.e),
                             [int(s) % R for s in g1_scalars]),
                spec,
            )
            g2_pts = HC.pack_g2_jac(
                HC.multi_mul(
                    f2,
                    ((qp.x.u0.e, qp.x.u1.e), (qp.y.u0.e, qp.y.u1.e)),
                    [int(s) % R for s in g2_scalars],
                ),
                spec,
            )
        elif mode == "scan":
            fq_ = _fq_ops()
            po_ = PO.bls_pairing_ops()
            b1_ = tuple(
                jnp.broadcast_to(a, (len(g1_scalars),) + a.shape[1:])
                for a in _g1_base()
            )
            b2_ = tuple(
                jnp.broadcast_to(a, (len(g2_scalars),) + a.shape[1:])
                for a in _g2_base()
            )
            g1_pts = C.scalar_mul(fq_, b1_, _pack_fr_plain(g1_scalars), FR_BITS)
            g2_pts = C.scalar_mul(po_.e2, b2_, _pack_fr_plain(g2_scalars), FR_BITS)
        else:
            g1_pts = fixed_base_g1(_pack_fr_plain(g1_scalars))
            g2_pts = fixed_base_g2(_pack_fr_plain(g2_scalars))

        def sl(pts, a, b):
            return tuple(x[a:b] for x in pts)

        o = 3
        g1_alpha = sl(g1_pts, 0, 1)
        g1_beta = sl(g1_pts, 1, 2)
        g1_delta = sl(g1_pts, 2, 3)
        g1_u = sl(g1_pts, o, o + m + 1)
        g1_v = sl(g1_pts, o + m + 1, o + 2 * (m + 1))
        s0 = o + 2 * (m + 1)
        g1_uvw_stmt = sl(g1_pts, s0, s0 + l + 1)
        g1_uvw_wit = sl(g1_pts, s0 + l + 1, s0 + m + 1)
        g1_xt = sl(g1_pts, s0 + m + 1, s0 + m + 1 + len(xt))
        g2_beta = sl(g2_pts, 0, 1)
        g2_gamma = sl(g2_pts, 1, 2)
        g2_delta = sl(g2_pts, 2, 3)
        g2_v = sl(g2_pts, 3, 3 + m + 1)

        return DeviceCRS(
            mat=mat,
            g1_alpha=g1_alpha, g1_beta=g1_beta, g1_delta=g1_delta,
            g2_beta=g2_beta, g2_gamma=g2_gamma, g2_delta=g2_delta,
            g1_u=g1_u, g1_v=g1_v, g2_v=g2_v,
            g1_uvw_stmt=g1_uvw_stmt, g1_uvw_wit=g1_uvw_wit, g1_xt=g1_xt,
        )


jax.tree_util.register_dataclass(
    DeviceCRS,
    data_fields=[
        "g1_alpha", "g1_beta", "g1_delta", "g2_beta", "g2_gamma", "g2_delta",
        "g1_u", "g1_v", "g2_v", "g1_uvw_stmt", "g1_uvw_wit", "g1_xt",
    ],
    meta_fields=["mat"],
)


def _g2_to_affine(p_jac):
    po = PO.bls_pairing_ops()
    return C.to_affine(po.e2, p_jac)


# -- prover ----------------------------------------------------------------------

@dataclasses.dataclass
class DeviceProof:
    a: tuple   # G1 affine (x, y, inf) device arrays, batch 1
    b: tuple   # G2 affine
    c: tuple   # G1 affine


def h_coeffs_core(mat: CircuitMatrices, w_mont):
    """Quotient polynomial h over the NTT domain (Montgomery limbs)."""
    spec = _fr_spec()
    dom = NTT.fr_domain(mat.n_pad)
    a_ev = spmv(mat.a_idx, mat.a_val, w_mont, spec)
    b_ev = spmv(mat.b_idx, mat.b_val, w_mont, spec)
    c_ev = spmv(mat.c_idx, mat.c_val, w_mont, spec)
    return NTT.h_coset_then_coeffs(dom, a_ev, b_ev, c_ev)


def prove_core(mat: CircuitMatrices, crs: DeviceCRS, w_mont, w_plain,
               r: int, s: int):
    """Traceable prove body: pure function of the device arrays in
    `mat`/`crs`/witness (r, s are static ints). Returns the affine
    (A, B, C) tuples. Callers may wrap this whole function in jax.jit
    (mat/crs fields passed as pytree leaves) to collapse the prove into a
    single dispatched module — the multichip dryrun does."""
    fq = _fq_ops()
    po = PO.bls_pairing_ops()
    fr = _fr_spec()

    h_mont = h_coeffs_core(mat, w_mont)
    h_plain = _mont_to_plain_scalars(h_mont, fr)[: mat.n_pad - 1]

    sum_a = MSM.msm_pippenger(fq, crs.g1_u, w_plain, FR_BITS)
    sum_b2 = MSM.msm_pippenger(po.e2, crs.g2_v, w_plain, FR_BITS)
    sum_b1 = MSM.msm_pippenger(fq, crs.g1_v, w_plain, FR_BITS)
    wit_plain = w_plain[mat.l + 1 :]
    c_sum = MSM.msm_pippenger(fq, crs.g1_uvw_wit, wit_plain, FR_BITS)
    ht = MSM.msm_pippenger(fq, crs.g1_xt, h_plain, FR_BITS)

    # single-point randomizer multiplies, batched into one scan
    rs = r * s % R
    d1 = _tile_point(crs.g1_delta, 3)
    d1_muls = C.scalar_mul(fq, d1, _pack_fr_plain([r, s, rs]), FR_BITS)
    d1_r = tuple(x[0:1] for x in d1_muls)
    d1_s = tuple(x[1:2] for x in d1_muls)
    d1_rs = tuple(x[2:3] for x in d1_muls)
    d2_s = C.scalar_mul(po.e2, crs.g2_delta, _pack_fr_plain([s]), FR_BITS)

    def b1(p):
        return tuple(x[None] for x in p)

    A = C.point_add(fq, C.point_add(fq, crs.g1_alpha, b1(sum_a)), d1_r)
    B2 = C.point_add(
        po.e2, C.point_add(po.e2, crs.g2_beta, b1(sum_b2)), d2_s
    )
    B1 = C.point_add(fq, C.point_add(fq, crs.g1_beta, b1(sum_b1)), d1_s)

    a_s = C.scalar_mul(fq, A, _pack_fr_plain([s]), FR_BITS)
    b1_r = C.scalar_mul(fq, B1, _pack_fr_plain([r]), FR_BITS)
    Cpt = C.point_add(fq, b1(c_sum), b1(ht))
    Cpt = C.point_add(fq, Cpt, a_s)
    Cpt = C.point_add(fq, Cpt, b1_r)
    Cpt = C.point_add(fq, Cpt, C.point_neg(fq, d1_rs))

    return C.to_affine(fq, A), _g2_to_affine(B2), C.to_affine(fq, Cpt)


class DeviceGroth16Prover:
    """prove() mirrors the reference prover's structure
    (zktoolkit_based/prover.rs:96-147): A = alpha + sum a_i u_i(tau) + r*delta,
    B = beta + sum a_i v_i(tau) + s*delta (G2, plus a G1 copy),
    C = sum_wit a_i uvw_i + h(tau)t(tau)/delta + sA + rB_1 - rs*delta."""

    def __init__(self, mat: CircuitMatrices, witness_map: dict):
        f = params.SUBGROUP
        r1cs = R1CS.from_tmpl(f, mat.tmpl, witness_map)
        r1cs.validate()
        self.mat = mat
        self.wires = [r1cs.witness.get(i).e for i in range(mat.m + 1)]
        spec = _fr_spec()
        self.w_mont = L.pack(self.wires, spec, mont=True)
        self.w_plain = _pack_fr_plain(self.wires)

    def statement(self) -> list[int]:
        return self.wires[: self.mat.l + 1]

    def prove(self, crs: DeviceCRS, rng: Rng | None = None) -> DeviceProof:
        rng = rng or Rng()
        f = params.SUBGROUP
        r = f.rand_elem(True, rng).e
        s = f.rand_elem(True, rng).e
        return self.prove_with_rs(crs, r, s)

    def h_coeffs_mont(self):
        return h_coeffs_core(self.mat, self.w_mont)

    def prove_with_rs(self, crs: DeviceCRS, r: int, s: int) -> DeviceProof:
        a, b, c = prove_core(self.mat, crs, self.w_mont, self.w_plain, r, s)
        return DeviceProof(a=a, b=b, c=c)


# -- verifier --------------------------------------------------------------------

def verify_core(crs: DeviceCRS, proof_a, proof_b, proof_c, stmt_plain):
    """Traceable verify body: device arrays in, boolean array out."""
    fq = _fq_ops()
    po = PO.bls_pairing_ops()
    L_pt = MSM.msm_pippenger(fq, crs.g1_uvw_stmt, stmt_plain, FR_BITS)

    ax, ay, ainf = proof_a
    neg_a = (ax, fq.neg(ay), ainf)
    alpha_aff = C.to_affine(fq, crs.g1_alpha)
    l_aff = C.to_affine(fq, tuple(x[None] for x in L_pt))
    beta_aff = _g2_to_affine(crs.g2_beta)
    gamma_aff = _g2_to_affine(crs.g2_gamma)
    delta_aff = _g2_to_affine(crs.g2_delta)

    def cat(parts):
        return tuple(
            jnp.concatenate([p[i] for p in parts], axis=0)[None]
            for i in range(3)
        )

    p_b = cat([neg_a, alpha_aff, l_aff, proof_c])
    q_b = cat([proof_b, beta_aff, gamma_aff, delta_aff])
    return PO.pairing_product_is_one(po, p_b, q_b)


def host_oracle_verify(crs: DeviceCRS, proof: DeviceProof,
                       statement) -> bool:
    """Compile-free host-tier verification oracle for device/sharded proofs.

    Checks e(A, B) == e(alpha, beta) * e(L_stmt, gamma) * e(C, delta)
    (reference zktoolkit_based/verifier.rs:31-56) using the object-tier Tate
    pairing (curves/bls12_381/pairing.py) and raw-int host Jacobian math
    (utils/host_curve.py) — zero device compiles, and an implementation
    independent of every device kernel. The multichip dryrun verifies with
    this oracle: compiling the device Miller loop costs ~2 minutes on
    XLA-CPU at O0, most of the gate's time budget.
    """
    from zk_toolkit_tpu.curves.bls12_381 import tower
    from zk_toolkit_tpu.curves.bls12_381.pairing import Pairing
    from zk_toolkit_tpu.utils import host_curve as HC

    spec = _fq_ops().spec
    F1, F2 = HC.FpHost(params.Q), HC.Fp2Host(params.Q)

    def g1_obj_affine(aff):
        if bool(np.asarray(jax.device_get(aff[2])).reshape(-1)[0]):
            return g1.infinity()
        x = L.unpack(aff[0], spec)[0]
        y = L.unpack(aff[1], spec)[0]
        return g1.point(x, y)

    def fq2(pair):
        return tower.Fq2(tower.fq1(pair[1]), tower.fq1(pair[0]))

    def g2_obj_affine(aff):
        if bool(np.asarray(jax.device_get(aff[2])).reshape(-1)[0]):
            return g2.infinity()
        xs = L.unpack(aff[0], spec)
        ys = L.unpack(aff[1], spec)
        return g2.point(fq2(xs), fq2(ys))

    def g1_obj_jac(pt):
        aff = HC.jac_to_affine(
            F1, tuple(L.unpack(a, spec)[0] for a in pt)
        )
        return g1.infinity() if aff is None else g1.point(*aff)

    def g2_obj_jac(pt):
        x = L.unpack(pt[0], spec)
        y = L.unpack(pt[1], spec)
        z = L.unpack(pt[2], spec)
        aff = HC.jac_to_affine(
            F2, ((x[0], x[1]), (y[0], y[1]), (z[0], z[1]))
        )
        if aff is None:
            return g2.infinity()
        return g2.point(fq2(aff[0]), fq2(aff[1]))

    # L_stmt = sum stmt_i * uvw_stmt_i (host Jacobian MSM; statement is the
    # short public-input prefix, wires 0..l)
    sx = L.unpack(crs.g1_uvw_stmt[0], spec)
    sy = L.unpack(crs.g1_uvw_stmt[1], spec)
    sz = L.unpack(crs.g1_uvw_stmt[2], spec)
    acc = (1, 1, 0)
    for xi, yi, zi, si in zip(sx, sy, sz, statement):
        k = int(si) % R
        if k:
            acc = HC.jac_add(F1, acc, HC.jac_mul(F1, (xi, yi, zi), k))
    l_aff = HC.jac_to_affine(F1, acc)
    l_obj = g1.infinity() if l_aff is None else g1.point(*l_aff)

    pr = Pairing()
    lhs = pr.tate(g1_obj_affine(proof.a), g2_obj_affine(proof.b))
    rhs = (
        pr.tate(g1_obj_jac(crs.g1_alpha), g2_obj_jac(crs.g2_beta))
        * pr.tate(l_obj, g2_obj_jac(crs.g2_gamma))
        * pr.tate(g1_obj_affine(proof.c), g2_obj_jac(crs.g2_delta))
    )
    return lhs == rhs


class DeviceGroth16Verifier:
    """e(A, B) == e(alpha, beta) * e(L_stmt, gamma) * e(C, delta)
    (reference zktoolkit_based/verifier.rs:31-56), checked as one batched
    Miller product e(-A,B) e(alpha,beta) e(L,gamma) e(C,delta) == 1 with a
    single shared final exponentiation."""

    def verify(self, proof: DeviceProof, crs: DeviceCRS, statement: list[int]) -> bool:
        stmt_plain = _pack_fr_plain(statement)
        ok = verify_core(crs, proof.a, proof.b, proof.c, stmt_plain)
        return bool(np.asarray(jax.device_get(ok))[0])
