"""Mesh-sharded radix-2 NTT over BLS12-381 Fr — four-step with explicit
all_to_all transposes (SURVEY.md §2 distributed item (d), §7 step 8).

Replaces the reference's O(n^2) single-thread Lagrange interpolation
(reference qap/qap.rs:33-97) at scale, and upgrades this repo's previous
"sharded NTT" — which was placement-only auto-SPMD — to a designed
collective schedule in `shard_map`.

Design (the TPU-native way to distribute an NTT): rather than exchanging
shards at every butterfly stage (log2(n) fine-grained exchanges), factor the
size-n transform as an (n1 x n2) four-step decomposition, which consolidates
ALL cross-device data movement into matrix transposes:

    X[k2*n1 + k1] = NTT_n2 over j2 { w^(j2*k1) * NTT_n1 over j1 { x[j1*n2+j2] } }

With the coefficient vector viewed as an [n1, n2] matrix row-sharded over the
mesh, the schedule per transform is:

    transpose (all_to_all)  -> local row-NTTs of size n1 (ops/ntt.py dit_rows)
    mid twiddle w^(j2*k1)   -> transpose (all_to_all) -> local row-NTTs of n2
    transpose (all_to_all)  -> natural-order output, row-sharded

Three all_to_alls of n/D elements each; every butterfly is device-local VPU
work. The inverse transform is the SAME dataflow with inverse twiddle tables
(and 1/n folded into the mid twiddle); coset shifts are elementwise pre/post
scales in the sharded layout. Arithmetic is exact (mod-p, canonical limbs),
so results are bit-identical to the single-device ops/ntt.py transforms —
asserted at 2^16/2^18 rows in tests/test_parallel.py.

`sharded_h_from_evs` chains intt -> coset_ntt -> quotient -> coset_intt (the
Groth16 module-2 pipeline, reference qap.rs:99-112 + polynomial.rs:204-238
semantics) in three shard_map modules with a [3, n] batch axis, keeping every
intermediate sharded — no replicated n-sized NTT anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zk_toolkit_tpu.curves.bls12_381 import params
from zk_toolkit_tpu.ops import limbs as L
from zk_toolkit_tpu.ops import ntt as NTT
from zk_toolkit_tpu.utils.bigint import int_to_limbs

R = params.R


def _spec():
    return L.field_spec(R)


def _split(n: int, d: int) -> tuple[int, int]:
    """Factor n = n1 * n2 (both powers of two, both divisible by d) with
    n1 as close to sqrt(n) as possible."""
    assert n & (n - 1) == 0, "four-step NTT needs a power-of-two size"
    log_n = n.bit_length() - 1
    n1 = 1 << ((log_n + 1) // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, (
        f"four-step shards need d | n1 and d | n2 (n={n}, d={d}); "
        f"use the replicated ops/ntt.py path for n < d^2"
    )
    return n1, n2


def _mont_np(v: int, spec) -> np.ndarray:
    return np.asarray(int_to_limbs(v * spec.r_mod_p % spec.p, spec.K),
                      dtype=np.uint32)


@functools.lru_cache(maxsize=8)
def _mid_table(n: int, n1: int, inverse: bool, fold_ninv: bool) -> np.ndarray:
    """[n2, n1, K] Montgomery table T[j2, k1] = w^(±j2*k1) (times 1/n when
    fold_ninv — every output term passes through exactly one mid twiddle, so
    the fold is exact)."""
    spec = _spec()
    n2 = n // n1
    w = pow(NTT.FR_GENERATOR, (R - 1) // n, R)
    if inverse:
        w = pow(w, -1, R)
    scale = pow(n, -1, R) if fold_ninv else 1
    t = np.zeros((n2, n1, spec.K), dtype=np.uint32)
    row_base = 1
    for j2 in range(n2):
        cur = scale
        for k1 in range(n1):
            t[j2, k1] = _mont_np(cur, spec)
            cur = cur * row_base % R
        row_base = row_base * w % R
    return t


@functools.lru_cache(maxsize=8)
def _coset_table(n: int, rows: int, inverse: bool) -> np.ndarray:
    """[rows, n//rows, K] Montgomery table of g^(±(r*cols + c)) — the coset
    pre-scale (forward, input [n1, n2] layout) or post-scale (inverse,
    output [n2, n1] layout)."""
    spec = _spec()
    cols = n // rows
    g = NTT.FR_GENERATOR
    if inverse:
        g = pow(g, -1, R)
    t = np.zeros((rows, cols, spec.K), dtype=np.uint32)
    cur = 1
    for r in range(rows):
        for c in range(cols):
            t[r, c] = _mont_np(cur, spec)
            cur = cur * g % R
    return t


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "n1", "inverse", "pre", "post")
)
def _four_step_jit(mesh, axis, n1, inverse, pre, post, x, mid, pre_t, post_t):
    """One size-(n1*n2) transform over a [B, n1, n2, K] batch, row-sharded.
    Output: [B, n2, n1, K] row-sharded, natural order when flattened."""
    spec = _spec()
    dom1 = NTT.fr_domain(n1)
    n2 = x.shape[2]
    dom2 = NTT.fr_domain(n2)

    def transpose(t):
        # [B, r/D, c, K] -> (all_to_all over cols) [B, r, c/D, K] -> swap
        t = jax.lax.all_to_all(t, axis, split_axis=2, concat_axis=1,
                               tiled=True)
        return jnp.swapaxes(t, 1, 2)

    def local(x, mid, pre_t, post_t):
        if pre:
            x = L.mont_mul(x, pre_t, spec)
        xt = transpose(x)                          # [B, n2/D, n1, K] rows j2
        xt = NTT.dit_rows(dom1, xt, inverse)       # j1 -> k1
        xt = L.mont_mul(xt, mid, spec)             # w^(±j2*k1) [, * 1/n]
        y = transpose(xt)                          # [B, n1/D, n2, K] rows k1
        y = NTT.dit_rows(dom2, y, inverse)         # j2 -> k2
        out = transpose(y)                         # [B, n2/D, n1, K] rows k2
        if post:
            out = L.mont_mul(out, post_t, spec)
        return out

    sh = P(None, axis, None, None)
    sh3 = P(axis, None, None)
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(sh, sh3, sh3, sh3),
        out_specs=sh,
        check_vma=False,
    )
    return fn(x, mid, pre_t, post_t)


def _place(mesh, axis, a):
    spec = P(axis, *([None] * (a.ndim - 1)))
    return jax.device_put(a, NamedSharding(mesh, spec))


def _run(x, mesh: Mesh, axis: str, inverse: bool, fold_ninv: bool,
         pre: bool, post: bool):
    """x: [n, K] or [B, n, K] -> same shape, natural order, row-sharded."""
    spec = _spec()
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, n, k = x.shape
    d = mesh.shape[axis]
    n1, n2 = _split(n, d)
    xm = jnp.reshape(x, (b, n1, n2, k))
    xm = jax.device_put(xm, NamedSharding(mesh, P(None, axis, None, None)))
    mid = _place(mesh, axis, jnp.asarray(_mid_table(n, n1, inverse, fold_ninv)))
    # dummy 1-entry tables keep the jit signature stable when unused
    pre_t = (jnp.asarray(_coset_table(n, n1, False)) if pre
             else jnp.asarray(np.zeros((d, 1, k), np.uint32)))
    post_t = (jnp.asarray(_coset_table(n, n2, True)) if post
              else jnp.asarray(np.zeros((d, 1, k), np.uint32)))
    pre_t = _place(mesh, axis, pre_t)
    post_t = _place(mesh, axis, post_t)
    out = _four_step_jit(mesh, axis, n1, inverse, pre, post,
                         xm, mid, pre_t, post_t)
    out = jnp.reshape(out, (b, n, k))
    return out[0] if squeeze else out


def sharded_ntt(x, mesh: Mesh, axis: str = "shard"):
    """Coefficients -> evaluations (== ops/ntt.py ntt, bit-exact)."""
    return _run(x, mesh, axis, inverse=False, fold_ninv=False,
                pre=False, post=False)


def sharded_intt(x, mesh: Mesh, axis: str = "shard"):
    """Evaluations -> coefficients (== intt, bit-exact)."""
    return _run(x, mesh, axis, inverse=True, fold_ninv=True,
                pre=False, post=False)


def sharded_coset_ntt(x, mesh: Mesh, axis: str = "shard"):
    """Coefficients -> evaluations on the coset gH (== coset_ntt)."""
    return _run(x, mesh, axis, inverse=False, fold_ninv=False,
                pre=True, post=False)


def sharded_coset_intt(x, mesh: Mesh, axis: str = "shard"):
    """Coset evaluations -> coefficients (== coset_intt)."""
    return _run(x, mesh, axis, inverse=True, fold_ninv=True,
                pre=False, post=True)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _quotient_jit(mesh, axis, abc_cs, t_inv):
    """(A*B - C) * t_coset^-1 elementwise on the sharded coset evals."""
    spec = _spec()
    sh = P(None, axis, None)

    def local(abc, t_inv):
        ab = L.mont_mul(abc[0], abc[1], spec)
        num = L.sub_mod(ab, abc[2], spec)
        return L.mont_mul(num, t_inv, spec)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(sh, P(None, None)),
        out_specs=P(axis, None), check_vma=False,
    )
    return fn(abc_cs, t_inv)


def sharded_h_from_evs(a_ev, b_ev, c_ev, mesh: Mesh, axis: str = "shard"):
    """h coefficients from A/B/C evaluations over H, fully sharded:
    bit-identical to ops/ntt.py h_coset_then_coeffs. Inputs/outputs [n, K]
    Montgomery, natural order, row-sharded over `axis`."""
    dom = NTT.fr_domain(a_ev.shape[0])
    abc = jnp.stack([a_ev, b_ev, c_ev], axis=0)
    coeffs = _run(abc, mesh, axis, inverse=True, fold_ninv=True,
                  pre=False, post=False)
    cs = _run(coeffs, mesh, axis, inverse=False, fold_ninv=False,
              pre=True, post=False)
    h_cs = _quotient_jit(mesh, axis, cs,
                         jnp.asarray(dom.t_coset_inv_mont)[None])
    return sharded_coset_intt(h_cs, mesh, axis)
