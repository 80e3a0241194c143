"""Pinocchio on the device tier (GGPR'13 protocol 2) — the 9-element proof,
8 MSMs over the mid witness, NTT-based h(s), and all seven verifier pairings
folded into ONE batched Miller-loop product with a shared final
exponentiation.

Mirrors the host tier (protocols/pinocchio.py; reference parity with
w_trusted_setup/pinocchio/{prover,crs,verifier}.rs) with the same structural
changes as the device Groth16 (protocols/groth16_device.py): the QAP lives on
the power-of-two root-of-unity domain, trapdoor and prover randomness are
injectable, every group aggregation is a Pippenger MSM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import msm as MSM
from zk_toolkit_tpu.ops import ntt as NTT
from zk_toolkit_tpu.ops import pairing_ops as PO
from zk_toolkit_tpu.protocols.groth16_device import (
    CircuitMatrices, FR_BITS, _fq_ops, _fr_spec, _g2_to_affine,
    _pack_fr_plain, _tile_point, fixed_base_g1, fixed_base_g2, spmv,
)
from zk_toolkit_tpu.snark.r1cs import R1CS
from zk_toolkit_tpu.utils.rng import Rng

R = params.R


@dataclasses.dataclass(eq=False)
class DevicePinocchioCRS:
    """EK/VK of pinocchio/crs.rs:46-159 over the NTT domain, device-resident.
    Point-list fields follow the reference names."""

    mat: CircuitMatrices
    ek: dict
    vk: dict

    @staticmethod
    def generate(mat: CircuitMatrices, rng: Rng | None = None):
        rng = rng or Rng()
        f = params.SUBGROUP
        names = ("r_v", "r_w", "alpha_v", "alpha_w", "alpha_y", "beta", "gamma", "s")
        td = {k: f.rand_elem(True, rng).e for k in names}
        return DevicePinocchioCRS.from_trapdoor(mat, **td)

    @staticmethod
    def from_trapdoor(mat, r_v, r_w, alpha_v, alpha_w, alpha_y, beta, gamma, s):
        n_pad, m = mat.n_pad, mat.m
        mid_beg = mat.l + 1
        r_y = r_v * r_w % R
        dom = NTT.fr_domain(n_pad)

        # v_i(s), w_i(s), y_i(s) over the root-of-unity domain (Lagrange)
        t_s = (pow(s, n_pad, R) - 1) % R
        n_inv = pow(n_pad, -1, R)
        from zk_toolkit_tpu.native import engine

        eng = engine(R)
        if eng is not None:
            wj_t = eng.pow_table(dom.w, n_pad)
            s_arr = np.repeat(eng.from_ints([s]), n_pad, axis=0)
            den_inv = eng.inv(eng.sub(s_arr, wj_t))
            coef = eng.from_ints([t_s * n_inv % R])
            lag = eng.to_ints(eng.mul(eng.mul_scalar(wj_t, coef), den_inv))
        else:
            lag, wj = [], 1
            for _ in range(n_pad):
                lag.append(t_s * wj % R * pow((s - wj) % R, -1, R) % R * n_inv % R)
                wj = wj * dom.w % R
        vs = [0] * (m + 1)
        ws = [0] * (m + 1)
        ys = [0] * (m + 1)
        for j, cons in enumerate(mat.tmpl.constraints):
            for acc, side in ((vs, cons.a), (ws, cons.b), (ys, cons.c)):
                for idx, coeff in side:
                    acc[idx] = (acc[idx] + coeff.e * lag[j]) % R

        mid = range(mid_beg, m + 1)
        io = range(mid_beg)
        deg = n_pad  # s^0 .. s^(n_pad-1) covers h (degree <= n_pad - 2)

        g1_scalars = []
        layout = []

        def add(name, vals):
            layout.append((name, len(g1_scalars), len(vals)))
            g1_scalars.extend(vals)

        add("vk_mid", [r_v * vs[i] % R for i in mid])
        add("g1_wk_mid", [r_w * ws[i] % R for i in mid])
        add("yk_mid", [r_y * ys[i] % R for i in mid])
        add("alpha_vk_mid", [alpha_v * r_v % R * vs[i] % R for i in mid])
        add("alpha_wk_mid", [alpha_w * r_w % R * ws[i] % R for i in mid])
        add("alpha_yk_mid", [alpha_y * r_y % R * ys[i] % R for i in mid])
        add("beta_vwy_k_mid", [
            (r_v * vs[i] + r_w * ws[i] + r_y * ys[i]) * beta % R for i in mid
        ])
        add("vk_io", [r_v * vs[i] % R for i in io])
        add("yk_io", [r_y * ys[i] % R for i in io])
        t_sc = r_y * t_s % R
        add("singles", [
            1, alpha_w, t_sc, alpha_v * t_sc % R, alpha_y * t_sc % R,
            beta * t_sc % R,
        ])
        g1_pts = fixed_base_g1(_pack_fr_plain(g1_scalars))

        g2_scalars = []
        g2_layout = []

        def add2(name, vals):
            g2_layout.append((name, len(g2_scalars), len(vals)))
            g2_scalars.extend(vals)

        add2("g2_wk_mid", [r_w * ws[i] % R for i in mid])
        add2("wk_io", [r_w * ws[i] % R for i in io])
        si = []
        cur = 1
        for _ in range(deg):
            si.append(cur)
            cur = cur * s % R
        add2("si", si)
        add2("singles2", [1, alpha_v, alpha_y, gamma, gamma * beta % R])
        g2_pts = fixed_base_g2(_pack_fr_plain(g2_scalars))

        def sl(pts, layout_list, name):
            for nm, off, ln in layout_list:
                if nm == name:
                    return tuple(x[off : off + ln] for x in pts)
            raise KeyError(name)

        ek = {
            name: sl(g1_pts, layout, name)
            for name in ("vk_mid", "g1_wk_mid", "yk_mid", "alpha_vk_mid",
                         "alpha_wk_mid", "alpha_yk_mid", "beta_vwy_k_mid")
        }
        ek["g2_wk_mid"] = sl(g2_pts, g2_layout, "g2_wk_mid")
        ek["si"] = sl(g2_pts, g2_layout, "si")

        singles = sl(g1_pts, layout, "singles")
        singles2 = sl(g2_pts, g2_layout, "singles2")

        def one1(i):
            return tuple(x[i : i + 1] for x in singles)

        def one2(i):
            return tuple(x[i : i + 1] for x in singles2)

        vk = {
            "one_g1": one1(0),
            "alpha_w": one1(1),
            "t": one1(2),
            "alpha_v_t": one1(3),
            "alpha_y_t": one1(4),
            "beta_t": one1(5),
            "vk_io": sl(g1_pts, layout, "vk_io"),
            "yk_io": sl(g1_pts, layout, "yk_io"),
            "wk_io": sl(g2_pts, g2_layout, "wk_io"),
            "one_g2": one2(0),
            "alpha_v": one2(1),
            "alpha_y": one2(2),
            "gamma": one2(3),
            "beta_gamma": one2(4),
        }
        return DevicePinocchioCRS(mat=mat, ek=ek, vk=vk)


@dataclasses.dataclass
class DeviceProof:
    """proof.rs:8-19 layout; each entry a device Jacobian point (batch 1)."""

    v_mid_s: tuple
    g1_w_mid_s: tuple
    g2_w_mid_s: tuple
    y_mid_s: tuple
    h_s: tuple
    alpha_v_mid_s: tuple
    alpha_w_mid_s: tuple
    alpha_y_mid_s: tuple
    beta_vwy_mid_s: tuple


class DevicePinocchioProver:
    def __init__(self, mat: CircuitMatrices, witness_map: dict):
        f = params.SUBGROUP
        r1cs = R1CS.from_tmpl(f, mat.tmpl, witness_map)
        r1cs.validate()
        self.mat = mat
        self.wires = [r1cs.witness.get(i).e for i in range(mat.m + 1)]
        spec = _fr_spec()
        self.w_mont = L.pack(self.wires, spec, mont=True)

    def statement(self) -> list[int]:
        return self.wires[: self.mat.l + 1]

    def prove(self, crs: DevicePinocchioCRS, rng: Rng | None = None) -> DeviceProof:
        rng = rng or Rng()
        f = params.SUBGROUP
        dv = f.rand_elem(True, rng).e
        dy = f.rand_elem(True, rng).e
        return self.prove_with_deltas(crs, dv, dy)

    def prove_with_deltas(self, crs, delta_v: int, delta_y: int) -> DeviceProof:
        fq = _fq_ops()
        po = PO.bls_pairing_ops()
        fr = _fr_spec()
        mat = self.mat
        mid_beg = mat.l + 1

        mid_plain = _pack_fr_plain(self.wires[mid_beg:])
        io_plain = _pack_fr_plain(self.wires[:mid_beg])

        def msm1(pts, sc=mid_plain):
            return tuple(x[None] for x in MSM.msm_pippenger(fq, pts, sc, FR_BITS))

        def msm2(pts, sc=mid_plain):
            return tuple(
                x[None] for x in MSM.msm_pippenger(po.e2, pts, sc, FR_BITS)
            )

        # randomizer multiples of t(s) (prover.rs:100-123)
        t4 = _tile_point(crs.vk["t"], 4)
        t_m = C.scalar_mul(
            fq, t4, _pack_fr_plain([delta_v, delta_y, 0, 0]), FR_BITS
        )
        avt = C.scalar_mul(fq, crs.vk["alpha_v_t"], _pack_fr_plain([delta_v]), FR_BITS)
        ayt = C.scalar_mul(fq, crs.vk["alpha_y_t"], _pack_fr_plain([delta_y]), FR_BITS)
        bt = C.scalar_mul(
            fq, crs.vk["beta_t"], _pack_fr_plain([(delta_v + delta_y) % R]), FR_BITS
        )

        v_mid = C.point_add(fq, tuple(x[0:1] for x in t_m), msm1(crs.ek["vk_mid"]))
        g1_w_mid = msm1(crs.ek["g1_wk_mid"])
        g2_w_mid = msm2(crs.ek["g2_wk_mid"])
        y_mid = C.point_add(fq, tuple(x[1:2] for x in t_m), msm1(crs.ek["yk_mid"]))
        a_v_mid = C.point_add(fq, avt, msm1(crs.ek["alpha_vk_mid"]))
        a_w_mid = msm1(crs.ek["alpha_wk_mid"])
        a_y_mid = C.point_add(fq, ayt, msm1(crs.ek["alpha_yk_mid"]))
        b_vwy_mid = C.point_add(fq, bt, msm1(crs.ek["beta_vwy_k_mid"]))

        # h = (V*W - Y)/t over the domain; h_s in G2 over s^i, adjusted by
        # + delta_v * w(s) - delta_y (prover.rs:112-120)
        a_ev = spmv(mat.a_idx, mat.a_val, self.w_mont, fr)
        b_ev = spmv(mat.b_idx, mat.b_val, self.w_mont, fr)
        c_ev = spmv(mat.c_idx, mat.c_val, self.w_mont, fr)
        h = NTT.h_coset_then_coeffs(NTT.fr_domain(mat.n_pad), a_ev, b_ev, c_ev)
        h_plain = L.from_mont(h, fr)
        h_s = msm2(crs.ek["si"], h_plain)

        w_s = C.point_add(po.e2, g2_w_mid, msm2(crs.vk["wk_io"], io_plain))
        w_dv = C.scalar_mul(po.e2, w_s, _pack_fr_plain([delta_v]), FR_BITS)
        one_dy = C.scalar_mul(po.e2, crs.vk["one_g2"], _pack_fr_plain([delta_y]), FR_BITS)
        adj_h = C.point_add(
            po.e2, C.point_add(po.e2, h_s, w_dv), C.point_neg(po.e2, one_dy)
        )

        return DeviceProof(
            v_mid_s=v_mid, g1_w_mid_s=g1_w_mid, g2_w_mid_s=g2_w_mid,
            y_mid_s=y_mid, h_s=adj_h, alpha_v_mid_s=a_v_mid,
            alpha_w_mid_s=a_w_mid, alpha_y_mid_s=a_y_mid,
            beta_vwy_mid_s=b_vwy_mid,
        )


class DevicePinocchioVerifier:
    """verifier.rs:31-86's three equation groups as ONE batched pairing
    product: five rows of up to three (G1, G2) pairs, padded with infinity
    pairs (e(inf, .) = 1), one shared final exponentiation."""

    def verify(self, proof: DeviceProof, crs: DevicePinocchioCRS,
               statement: list[int]) -> bool:
        fq = _fq_ops()
        po = PO.bls_pairing_ops()
        vk = crs.vk
        io_plain = _pack_fr_plain(statement)

        def neg1(p):
            return C.point_neg(fq, p)

        vwy_mid = C.point_add(
            fq, C.point_add(fq, proof.v_mid_s, proof.g1_w_mid_s), proof.y_mid_s
        )
        # io re-aggregation
        v_s = C.point_add(
            fq, proof.v_mid_s,
            tuple(x[None] for x in MSM.msm_pippenger(fq, vk["vk_io"], io_plain, FR_BITS)),
        )
        y_s = C.point_add(
            fq, proof.y_mid_s,
            tuple(x[None] for x in MSM.msm_pippenger(fq, vk["yk_io"], io_plain, FR_BITS)),
        )
        w_s = C.point_add(
            po.e2, proof.g2_w_mid_s,
            tuple(x[None] for x in MSM.msm_pippenger(po.e2, vk["wk_io"], io_plain, FR_BITS)),
        )

        inf1 = tuple(jnp.zeros_like(x) for x in C.to_affine(fq, vk["one_g1"])[:2]) + (
            jnp.ones((1,), dtype=bool),
        )
        inf2 = tuple(
            jnp.zeros_like(x) for x in _g2_to_affine(vk["one_g2"])[:2]
        ) + (jnp.ones((1,), dtype=bool),)

        def aff1(p):
            return C.to_affine(fq, p)

        def aff2(p):
            return _g2_to_affine(p)

        rows = [
            # e(beta_vwy, gamma) == e(vwy, beta_gamma)
            ([aff1(neg1(proof.beta_vwy_mid_s)), aff1(vwy_mid), inf1],
             [aff2(vk["gamma"]), aff2(vk["beta_gamma"]), inf2]),
            # e(alpha_v_mid, 1) == e(v_mid, alpha_v)
            ([aff1(neg1(proof.alpha_v_mid_s)), aff1(proof.v_mid_s), inf1],
             [aff2(vk["one_g2"]), aff2(vk["alpha_v"]), inf2]),
            # e(alpha_w_mid, 1) == e(alpha_w, w_mid)
            ([aff1(neg1(proof.alpha_w_mid_s)), aff1(vk["alpha_w"]), inf1],
             [aff2(vk["one_g2"]), aff2(proof.g2_w_mid_s), inf2]),
            # e(alpha_y_mid, 1) == e(y_mid, alpha_y)
            ([aff1(neg1(proof.alpha_y_mid_s)), aff1(proof.y_mid_s), inf1],
             [aff2(vk["one_g2"]), aff2(vk["alpha_y"]), inf2]),
            # e(v_s, w_s) == e(t, h) e(y_s, 1)
            ([aff1(neg1(v_s)), aff1(vk["t"]), aff1(y_s)],
             [aff2(w_s), aff2(proof.h_s), aff2(vk["one_g2"])]),
        ]
        p_b = tuple(
            jnp.stack([jnp.concatenate([pair[i] for pair in row_p], axis=0)
                       for row_p, _ in rows])
            for i in range(3)
        )
        q_b = tuple(
            jnp.stack([jnp.concatenate([pair[i] for pair in row_q], axis=0)
                       for _, row_q in rows])
            for i in range(3)
        )
        ok = PO.pairing_product_is_one(po, p_b, q_b)
        return bool(np.asarray(jax.device_get(ok)).all())
