"""Multi-scalar multiplication (Pippenger) on TPU.

Replaces the reference's sequential MSM `eval_with_g1_hidings` = sum c_i * P_i
(reference field/polynomial.rs:271-293 and mcl/polynomial.rs:261-282) — the
hot op of Groth16/Pinocchio proving (prover.rs:96-147) — with a bucketed
Pippenger whose every stage is a *batched* device op:

  1. digits:   c-bit windows of each scalar (c | 16 so digits are limb slices)
  2. sort:     per window, points sorted by digit (XLA sort on uint32 keys)
  3. buckets:  per-digit sums via a SEGMENTED PAIRWISE-MERGE TREE over the
               sorted stream: each level merges adjacent node pairs with one
               batched point-add; a segment that both merge sides seal is
               "emitted" — scattered into the dense 2^c bucket array. Work is
               exactly N-1 adds per window, in log2(N) batched rounds.
  4. window:   sum_b b * B_b via the suffix-sum identity sum_{k>=1} T_k,
               T_k = sum_{b>=k} B_b — a work-efficient two-sweep (Blelloch)
               suffix scan over the bucket axis + a pairwise tree-sum.
  5. combine:  Horner over windows, c doublings per step.

Compile-friendliness is load-bearing: every tree level is its own small
jitted executable (one batched point-add, static shape). A single fused graph
(or `lax.associative_scan`, which inlines its combiner 2*log2(N) times) takes
tens of minutes of XLA compile time for 381-bit limb arithmetic; per-level
executables compile in seconds, are shared across windows (same shapes), and
persist in the compilation cache.

Generic over the coordinate-field ops namespace, so the same code does
secp256k1, BLS12-381 G1 (FqOps) and G2 (Fq2Ops) MSMs. The sharded multi-chip
variant (points partitioned per device, partial results all-gathered) lives in
parallel/sharded_msm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.utils.bigint import LIMB_BITS


def default_window_bits(n: int) -> int:
    """Window size c (must divide 16): roughly log2(N) - 5 capped at 8.
    The classic balance is stream work (N per window) vs bucket work
    (~3 * 2^c per window); c = 16 wins a little more work reduction at large
    N but its 2^16-bucket suffix scan multiplies device live memory and HLO
    size — c = 8 keeps the bucket phase negligible (768 adds) with at most
    ~1.7x the stream work, and is the robust default on a single chip."""
    target = max(1, n.bit_length() - 5)
    for c in (8, 4, 2, 1):
        if c <= target:
            return c
    return 1


def _window_digits(scalars, c: int, w: int):
    """Digit of window w (bits [c*w, c*(w+1))) for every scalar.
    scalars: uint32[N, S] 16-bit limbs; returns uint32[N] in [0, 2^c)."""
    per = LIMB_BITS // c
    limb = scalars[:, w // per]
    shift = jnp.uint32((w % per) * c)
    return (limb >> shift) & jnp.uint32((1 << c) - 1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _window_digits_group(scalars, c: int, lo: int, hi: int):
    """Digits of windows [lo, hi) as one executable -> uint32[N, hi-lo].
    (One dispatch per group: issuing the per-window shift/mask ops eagerly
    costs a compile + an SPMD dispatch per window — hundreds per MSM.)"""
    return jnp.stack(
        [_window_digits(scalars, c, w) for w in range(lo, hi)], axis=1
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _window_digits_cols(scalars, c: int, lo: int, hi: int):
    """Column-batched variant: scalars uint32[N, B, S] (stream-major) ->
    digits uint32[N, B, hi-lo]."""
    per = LIMB_BITS // c
    cols = []
    for w in range(lo, hi):
        limb = scalars[:, :, w // per]
        shift = jnp.uint32((w % per) * c)
        cols.append((limb >> shift) & jnp.uint32((1 << c) - 1))
    return jnp.stack(cols, axis=2)


# -- segmented pairwise-merge tree -------------------------------------------
#
# Node invariant over a contiguous chunk of the sorted (id, point) stream:
# (l_id, l_pt) = id and running sum of the segment touching the chunk's left
# boundary, (r_id, r_pt) = same for the right boundary; equal ids mean the
# chunk is a single segment. Segments interior to a chunk were emitted when
# they were sealed. Sortedness guarantees an emitted id never reappears, so
# every bucket is written at most once across all levels.

@functools.partial(jax.jit, static_argnums=(0,))
def _merge_level(ops, lid, lpt, rid, rpt):
    """Merge adjacent node pairs (even = a/left, odd = b/right). Returns the
    halved node arrays plus two emission slots (id, point, valid) each."""
    a_lid, b_lid = lid[0::2], lid[1::2]
    a_rid, b_rid = rid[0::2], rid[1::2]
    a_lpt = tuple(x[0::2] for x in lpt)
    b_lpt = tuple(x[1::2] for x in lpt)
    a_rpt = tuple(x[0::2] for x in rpt)
    b_rpt = tuple(x[1::2] for x in rpt)

    match = a_rid == b_lid
    a_single = a_lid == a_rid
    b_single = b_lid == b_rid
    m = C.point_add(ops, a_rpt, b_lpt)

    new_lid, new_rid = a_lid, b_rid
    new_lpt = C.select_point(ops, match & a_single, m, a_lpt)
    new_rpt = C.select_point(ops, match & b_single, m, b_rpt)

    # a's right segment: sealed right by a non-matching b, or merged with
    # b's left into an interior (both-sealed) segment.
    emit1_valid = ~a_single & (~match | ~b_single)
    emit1_pt = C.select_point(ops, match, m, a_rpt)
    emit1_id = a_rid
    # b's left segment: interior to the merged node when nothing matches it.
    emit2_valid = ~match & ~b_single
    emit2_pt = b_lpt
    emit2_id = b_lid

    return (new_lid, new_lpt, new_rid, new_rpt,
            (emit1_id, emit1_pt, emit1_valid),
            (emit2_id, emit2_pt, emit2_valid))


def _bucket_set(buckets, ids, pts):
    """buckets[ids] = pts, window-aware: with a trailing window axis on ids
    ([N', W]) the write pairs each row with its window column. Implemented as
    a flat 1-D scatter (id * W + window) — multi-dimensional scatter indices
    are exotic enough to crash the TPU AOT compiler."""
    if ids.ndim == 1:
        return tuple(b.at[ids].set(p) for b, p in zip(buckets, pts))
    w = ids.shape[1]
    wi = jnp.broadcast_to(jnp.arange(w, dtype=jnp.uint32)[None], ids.shape)
    flat_ids = (ids * jnp.uint32(w) + wi).reshape(-1)
    out = []
    for b, p in zip(buckets, pts):
        m = b.shape[0]
        bf = b.reshape((m * w,) + b.shape[2:])
        pf = p.reshape((-1,) + p.shape[2:])
        out.append(bf.at[flat_ids].set(pf).reshape(b.shape))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(0,))
def _scatter_emit(ops, buckets, emit):
    """Write emitted segment sums into the bucket array. Invalid rows target
    bucket 0, which is reset afterwards (digit 0 contributes nothing)."""
    ids, pts, valid = emit
    ids = jnp.where(valid, ids, jnp.uint32(0))
    return _bucket_set(buckets, ids, pts)


def _segmented_bucket_sums(ops, pts, keys, c: int):
    """Sorted-stream bucket accumulation; pts is a Jacobian tuple sorted by
    keys (uint32[N(, W)] ascending along axis 0, N a power of two; the
    optional trailing W axis batches Pippenger windows). Returns the dense
    bucket array tuple (leading axis 2^c) with bucket 0 = infinity."""
    m = 1 << c
    buckets = C.infinity_like(
        ops, tuple(jnp.repeat(a[:1], m, axis=0) for a in pts)
    )
    lid = rid = keys
    lpt = rpt = pts
    while lid.shape[0] > 1:
        lid, lpt, rid, rpt, e1, e2 = _merge_level(ops, lid, lpt, rid, rpt)
        buckets = _scatter_emit(ops, buckets, e1)
        buckets = _scatter_emit(ops, buckets, e2)
    # Root: both boundary segments are final. If the root is a single
    # segment, both writes store the same value.
    buckets = _bucket_set(buckets, lid, lpt)
    buckets = _bucket_set(buckets, rid, rpt)
    inf = C.infinity_like(ops, tuple(b[:1] for b in buckets))
    buckets = tuple(b.at[0:1].set(i) for b, i in zip(buckets, inf))
    return buckets


# -- work-efficient suffix scan over the bucket axis ---------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _pairwise_sum(ops, pts):
    return C.point_add(
        ops, tuple(x[0::2] for x in pts), tuple(x[1::2] for x in pts)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _down_step(ops, pre, level):
    """One down-sweep step of an exclusive suffix scan (right-to-left).
    `pre` [H]: exclusive suffix of each parent; `level` [2H]: node values.
    Children: right child's exclusive suffix = pre, left child's =
    pre + right_child."""
    right = tuple(x[1::2] for x in level)
    pre_left = C.point_add(ops, pre, right)
    # interleave (pre_left, pre_right=pre) back to [2H]
    out = tuple(
        jnp.stack([a, b], axis=1).reshape((-1,) + a.shape[1:])
        for a, b in zip(pre_left, pre)
    )
    return out


def _suffix_inclusive_scan(ops, pts):
    """Inclusive suffix scan T_k = sum_{b >= k} x_b over leading axis
    (power-of-two length): Blelloch two-sweep, every level one batched add."""
    levels = []
    cur = pts
    while cur[0].shape[0] > 1:
        levels.append(cur)
        cur = _pairwise_sum(ops, cur)
    pre = C.infinity_like(ops, tuple(x[:1] for x in cur))
    for level in reversed(levels):
        pre = _down_step(ops, pre, level)
    return C.point_add(ops, pre, pts)


def _weighted_bucket_sum(ops, buckets):
    """sum_b b * B_b = sum_{k>=1} T_k (T = inclusive suffix sums)."""
    t = _suffix_inclusive_scan(ops, buckets)
    t = tuple(x[1:] for x in t)  # drop k = 0
    t = C.pad_to_pow2(ops, t)
    return C.tree_sum(ops, t)


# -- per-window + Horner combine ----------------------------------------------

@functools.partial(jax.jit, static_argnums=(0,))
def _sort_by_digit(ops, pts, digits):
    """Sort the point stream by digit along axis 0. digits: uint32[N(, W)];
    with the window axis present, each window column sorts independently and
    the (broadcast) point arrays are gathered per window."""
    order = jnp.argsort(digits, axis=0)
    keys = jnp.take_along_axis(digits, order, axis=0)
    spts = []
    for a in pts:
        idx = order.reshape(order.shape + (1,) * (a.ndim - order.ndim))
        spts.append(jnp.take_along_axis(a, idx, axis=0))
    return keys, tuple(spts)


def _msm_window(ops, pts, digits, c: int):
    """One Pippenger window group: sort by digit, bucket sums, weighted
    reduction. digits uint32[N] -> point with no batch axis;
    digits uint32[N, W] (pts broadcast to [N, W, ...]) -> points [W, ...]."""
    keys, spts = _sort_by_digit(ops, pts, digits)
    buckets = _segmented_bucket_sums(ops, spts, keys, c)
    return _weighted_bucket_sum(ops, buckets)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _horner_combine(ops, window_pts, c: int):
    """sum_w 2^(c*w) * S_w, MSB window first: acc = 2^c * acc + S_w.
    window_pts: Jacobian tuple with leading window axis W (ascending)."""
    w = window_pts[0].shape[0]

    def body(i, acc):
        for _ in range(c):
            acc = C.point_double(ops, acc)
        s = tuple(
            jax.lax.dynamic_index_in_dim(a, w - 1 - i, axis=0, keepdims=False)
            for a in window_pts
        )
        return C.point_add(ops, acc, s)

    init = C.infinity_like(ops, tuple(a[0] for a in window_pts))
    return jax.lax.fori_loop(0, w, body, init)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _horner_combine_many(ops, window_pts, c: int):
    """Batched Horner: window_pts Jacobian tuple [B, W, ...] (window axis 1,
    ascending) -> [B, ...]."""
    w = window_pts[0].shape[1]

    def body(i, acc):
        for _ in range(c):
            acc = C.point_double(ops, acc)
        s = tuple(
            jax.lax.dynamic_index_in_dim(a, w - 1 - i, axis=1, keepdims=False)
            for a in window_pts
        )
        return C.point_add(ops, acc, s)

    init = C.infinity_like(ops, tuple(a[:, 0] for a in window_pts))
    return jax.lax.fori_loop(0, w, body, init)


def _pad_stream_axis1(ops, pts, scalars):
    """Pad the stream axis (axis 1) of batched [B, n, ...] inputs to a power
    of two with infinity points / zero scalars."""
    n = pts[0].shape[1]
    m = 1 << max(0, (n - 1).bit_length())
    if m == n:
        return pts, scalars
    pad = m - n
    inf = C.infinity_like(ops, tuple(a[:, :1] for a in pts))
    pts = tuple(
        jnp.concatenate(
            [a, jnp.broadcast_to(i, (a.shape[0], pad) + a.shape[2:])], axis=1
        )
        for a, i in zip(pts, inf)
    )
    z = jnp.zeros(scalars.shape[:1] + (pad,) + scalars.shape[2:],
                  dtype=scalars.dtype)
    return pts, jnp.concatenate([scalars, z], axis=1)


def msm_pippenger_many(ops, pts, scalars, nbits: int, c: int | None = None,
                       window_chunk: int | None = None):
    """B independent MSMs in one batched pass: pts Jacobian tuple [B, n, ...]
    over DISTINCT point sets, scalars uint32[B, n, S] -> results [B, ...].

    The single-stream path's window machinery already treats trailing axes of
    the digit array as independent sort/merge/bucket columns, so a batch of B
    MSMs is the same program with B*W columns: transpose to stream-major
    [n, B, ...], give every (batch, window) pair its own column, and run ONE
    sort + merge tree + bucket reduction over the group. All stages are
    elementwise along B — this is the local phase of the explicit two-phase
    sharded MSM (parallel/sharded_msm.py): with B as the device axis sharded
    over the mesh, XLA partitions every executable collective-free, and only
    the B partial points ever cross chips."""
    b = pts[0].shape[0]
    pts, scalars = _pad_stream_axis1(ops, pts, scalars)
    n = pts[0].shape[1]
    c = c or default_window_bits(n)
    assert LIMB_BITS % c == 0, "window size must divide the limb width"
    n_windows = (nbits + c - 1) // c
    pts_t = tuple(a.swapaxes(0, 1) for a in pts)          # [n, B, ...]
    scal_t = scalars.swapaxes(0, 1)                        # [n, B, S]
    struct = sum(int(np.prod(a.shape[2:])) for a in pts)
    wc = window_chunk or _auto_window_chunk(n * b, n_windows, struct)
    partials = []  # per group: tuple of [B, W, ...]
    for lo in range(0, n_windows, wc):
        hi = min(lo + wc, n_windows)
        w = hi - lo
        digits = _window_digits_cols(scal_t, c, lo, hi)    # [n, B, W]
        dig_flat = digits.reshape(n, b * w)
        pts_b = tuple(
            jnp.broadcast_to(
                a[:, :, None], (n, b, w) + a.shape[2:]
            ).reshape((n, b * w) + a.shape[2:])
            for a in pts_t
        )
        grp = _msm_window(ops, pts_b, dig_flat, c)         # [B*W, ...]
        partials.append(
            tuple(x.reshape((b, w) + x.shape[1:]) for x in grp)
        )
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=1) for i in range(3)
    )                                                      # [B, n_windows, ...]
    return _horner_combine_many(ops, stacked, c)


def _auto_window_chunk(n: int, n_windows: int, struct_elems: int) -> int:
    """How many windows to batch per dispatch group: bounded by a device
    memory budget for the gathered per-window point copies."""
    import os

    cap = int(os.environ.get("ZKT_MSM_MEM_BYTES", 256 << 20))
    per_window = n * struct_elems * 4 * 2  # gathered copy + scratch
    return max(1, min(n_windows, cap // max(per_window, 1)))


def msm_pippenger(ops, pts, scalars, nbits: int, c: int | None = None,
                  window_chunk: int | None = None):
    """sum_i k_i * P_i. pts: batched Jacobian tuple (Montgomery limbs),
    scalars: uint32[N, S] plain 16-bit limbs. Returns one Jacobian point
    (tuple of uint32[K']-shaped arrays).

    Windows are processed in batched groups (an inner W axis on every stage)
    sized by a memory budget — one sort/merge-tree/bucket pass covers the
    whole group, so dispatch count is independent of the window count up to
    the memory cap. Per-level executables are shared across groups and calls."""
    n_raw = pts[0].shape[0]
    max_stream = int(np.log2(int(
        __import__("os").environ.get("ZKT_MSM_MAX_STREAM", 1 << 18)
    )))
    if n_raw > (1 << max_stream):
        # stream chunking: sub-MSMs over 2^max_stream-point slices combined
        # with single point adds — bounds device live memory at huge N
        step = 1 << max_stream
        acc = None
        for lo in range(0, n_raw, step):
            part = msm_pippenger(
                ops, tuple(a[lo : lo + step] for a in pts),
                scalars[lo : lo + step], nbits, c=c,
                window_chunk=window_chunk,
            )
            acc = part if acc is None else tuple(
                x[0] for x in C.point_add(
                    ops, tuple(x[None] for x in acc), tuple(x[None] for x in part)
                )
            )
        return acc
    pts, scalars = C.pad_to_pow2(ops, pts, scalars)
    n = pts[0].shape[0]
    c = c or default_window_bits(n)
    assert LIMB_BITS % c == 0, "window size must divide the limb width"
    n_windows = (nbits + c - 1) // c
    struct = sum(int(np.prod(a.shape[1:])) for a in pts)
    wc = window_chunk or _auto_window_chunk(n, n_windows, struct)
    partials = []  # per window, ascending
    for lo in range(0, n_windows, wc):
        ws = list(range(lo, min(lo + wc, n_windows)))
        if len(ws) == 1:
            digits = _window_digits(scalars, c, ws[0])
            partials.append(tuple(x[None] for x in _msm_window(ops, pts, digits, c)))
        else:
            digits = _window_digits_group(scalars, c, ws[0], ws[-1] + 1)  # [N, W]
            pts_b = tuple(
                jnp.broadcast_to(
                    a[:, None], (n, len(ws)) + a.shape[1:]
                )
                for a in pts
            )
            group = _msm_window(ops, pts_b, digits, c)  # tuple of [W, ...]
            partials.append(group)
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=0) for i in range(3)
    )
    return _horner_combine(ops, stacked, c)
