"""Multi-scalar multiplication (Pippenger) on TPU.

Replaces the reference's sequential MSM `eval_with_g1_hidings` = sum c_i * P_i
(reference field/polynomial.rs:271-293 and mcl/polynomial.rs:261-282) — the
hot op of Groth16/Pinocchio proving (prover.rs:96-147) — with a bucketed
Pippenger whose every stage is a *batched* device op:

  1. digits:   c-bit windows of each scalar (c | 16 so digits are limb slices)
  2. sort:     per window, points sorted by digit (XLA sort on uint32 keys;
               the point gather reads the unbroadcast source with one fused
               wide-row take — see _sorted_stream)
  3. up-sweep: a pairwise SUM TREE over the sorted stream — levels[l][i] =
               sum of block [i*2^l, (i+1)*2^l) — N-1 batched point-adds per
               window, each level one call of the fused Pallas group-law
               kernel (ops/curve_kernels.py)
  4. window:   sum_b b * B_b WITHOUT materializing buckets, via the suffix
               identity sum_b b*B_b = (2^c-1)*Total - sum_k S_ex[p_k]:
               boundary positions p_k by binary search on the sorted keys,
               exclusive prefix sums at the boundaries by Fenwick
               decomposition over the up-sweep levels (log2(N) gathered
               nodes each). No scatter anywhere — XLA serializes colliding
               scatter rows, which made the previous merge-tree + bucket-
               scatter design run at ~6x its arithmetic floor. (That engine
               is kept under ZKT_MSM_ENGINE=merge for A/B.)
  5. combine:  Horner over windows, c doublings per step.

Dispatch structure is platform-adaptive (_fused): on accelerators each whole
window pass is ONE jitted executable (per-executable launch through the
tunneled runtime costs ~1.3 ms even fully async — an eager per-level
structure wastes tens of seconds per 2^20 MSM); on CPU the per-level jitted
helpers stay separate executables that compile in seconds and are shared
across every shape and test.

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


def _sorted_stream(ops, pts, digits, src_cols: int):
    """Sorted (keys, points) WITHOUT materializing a [N, M, ...] broadcast of
    the input points: the per-column gather reads the source stream
    directly (jnp.take with a [N, M] index), so the only M-wide array ever
    written is the sorted copy itself. pts: [N, ...] when src_cols == 0
    (single source stream), else [N, B, ...] with B source columns (B may
    be 1); digits: [N(, M)] with M = B * (windows per source).

    The three coordinate arrays are fused into ONE gather over a
    limb-concatenated [..., 3*K'] view: TPU row-gathers are rate-limited by
    row count, so one 288-byte-row gather beats three 96-byte-row gathers
    ~3x (measured round 5)."""
    order = jnp.argsort(digits, axis=0)
    keys = jnp.take_along_axis(digits, order, axis=0)
    n = digits.shape[0]
    flat = [a.reshape(a.shape[: 2 if src_cols else 1] + (-1,))
            for a in pts]
    widths = [a.shape[-1] for a in flat]
    comb = jnp.concatenate(flat, axis=-1)         # [N(, B), sum(K')]
    if src_cols == 0:
        out = jnp.take(comb, order, axis=0)       # [N, M, sum(K')]
    else:
        m = digits.shape[1]
        w = m // src_cols
        ord3 = order.reshape(n, src_cols, w)
        out = jax.vmap(
            lambda ab, ob: jnp.take(ab, ob, axis=0),
            in_axes=(1, 1), out_axes=1,
        )(comb, ord3)                             # [N, B, W, sum(K')]
        out = out.reshape((n, m, out.shape[-1]))
    spts = []
    off = 0
    lead = out.shape[: digits.ndim]   # (N,) or (N, M)
    for a, wd in zip(pts, widths):
        trailing = a.shape[2:] if src_cols else a.shape[1:]
        spts.append(out[..., off : off + wd].reshape(lead + trailing))
        off += wd
    return keys, tuple(spts)


# -- sum-tree + Fenwick boundary-query window reduction -----------------------
#
# Round-5 replacement for the merge-tree + bucket-scatter pipeline. Profiling
# on the tunneled v5e showed the merge tree at ~6.5x the arithmetic floor:
# its two scatters per level collide every invalid row on bucket 0, which
# XLA must serialize, and the id/select bookkeeping adds several full-array
# traversals per level. This formulation needs NO scatter and NO ids:
#
#   1. up-sweep: levels[l][i] = sum of sorted-stream block [i*2^l,(i+1)*2^l)
#      — pure pairwise batched adds, N-1 total (work-identical to the tree).
#   2. boundaries: p_k = first index with digit >= k (binary search on the
#      sorted keys), for k = 1..2^c-1.
#   3. exclusive prefix sums AT the boundaries only, via the Fenwick
#      decomposition: S_ex[p] = sum over set bits l of p of
#      levels[l][(p >> l) - 1] — a (2^c-1) x log2(N) gather + small fold.
#   4. window sum via the suffix identity:
#      sum_b b*B_b = sum_k T_k,  T_k = Total - S_ex[p_k]
#                  = (2^c-1)*Total - sum_k S_ex[p_k].

def _flat_add(ops, a, b):
    """point_add with all leading batch axes flattened to ONE: XLA-CPU
    compile time of the limb graphs explodes on rank-3 [N, W, K] operands
    (measured 149 s per up-sweep level at dryrun shapes vs ~9 s rank-2),
    and the rank is irrelevant to the math."""
    nd = getattr(ops, "ndim_struct", 1)
    shape = a[0].shape
    batch_dims = a[0].ndim - nd
    if batch_dims <= 1:
        return C.point_add(ops, a, b)
    flat = lambda t: tuple(x.reshape((-1,) + x.shape[batch_dims:]) for x in t)
    out = C.point_add(ops, flat(a), flat(b))
    return tuple(
        x.reshape(shape[:batch_dims] + x.shape[1:]) for x in out
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _pair_halve(ops, cur):
    """One up-sweep level: add even/odd neighbours along axis 0."""
    return _flat_add(
        ops, tuple(a[0::2] for a in cur), tuple(a[1::2] for a in cur)
    )


@functools.partial(jax.jit, static_argnums=(0,))
def _half_fold(ops, cur):
    """One reduction level: add first half to second half along axis 0."""
    n = cur[0].shape[0]
    return _flat_add(
        ops, tuple(a[: n // 2] for a in cur), tuple(a[n // 2 :] for a in cur)
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _boundary_positions(keys, m: int):
    """p[k-1] = number of entries < k == first index with key >= k, for
    k = 1..m-1. keys uint32[N(,W)] sorted ascending along axis 0; returns
    uint32[m-1(,W)] with values in [0, N]. Vectorized binary search:
    log2(N) static rounds of one tiny gather each — no [m, N] compare
    matrix, no scatter."""
    n = keys.shape[0]
    ks = jnp.arange(1, m, dtype=jnp.uint32)
    ks = ks.reshape((m - 1,) + (1,) * (keys.ndim - 1))
    lo = jnp.zeros((m - 1,) + keys.shape[1:], dtype=jnp.uint32)
    step = n  # n is a power of two (streams are pow2-padded)
    while step >= 1:
        cand = lo + jnp.uint32(step)
        idx = jnp.minimum(cand, jnp.uint32(n)) - jnp.uint32(1)
        # per-column gather: [M-1(,W)] indices into keys' axis 0
        val = jnp.take_along_axis(keys, idx.astype(jnp.int32), axis=0)
        take = (cand <= jnp.uint32(n)) & (val < ks)
        lo = jnp.where(take, cand, lo)
        step //= 2
    return lo


@functools.partial(jax.jit, static_argnums=(0, 3))
def _fenwick_gather_level(ops, lev, p, l: int):
    """Level-l contribution to S_ex[p]: levels[l][(p >> l) - 1] where bit l
    of p is set, infinity elsewhere."""
    bit = (p >> jnp.uint32(l)) & jnp.uint32(1)
    idx = jnp.maximum(p >> jnp.uint32(l), jnp.uint32(1)) - jnp.uint32(1)
    g = []
    for a in lev:
        ix = idx.reshape(idx.shape + (1,) * (a.ndim - idx.ndim))
        g.append(jnp.take_along_axis(a, ix.astype(jnp.int32), axis=0))
    g = tuple(g)
    inf = C.infinity_like(ops, g)
    return C.select_point(ops, bit == 1, g, inf)


@functools.partial(jax.jit, static_argnums=(0,))
def _point_add_jit(ops, p, q):
    return _flat_add(ops, p, q)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _small_scalar_mul(ops, p, k: int):
    """k * P for a small static integer k: unrolled double-and-add
    (bit-length(k) steps on a tiny batch)."""
    acc = None
    for bit in bin(k)[2:]:
        if acc is not None:
            acc = C.point_double(ops, acc)
        if bit == "1":
            acc = p if acc is None else C.point_add(ops, acc, p)
    return acc


def _compact_window(ops, spts, keys, c: int):
    """Compile-minimal window reduction for traced (shard_map) contexts:
    the same sort/up-sweep/Fenwick math as _msm_window but with O(1)
    group-law INSTANCES instead of O(log N + 2^c):

    - the up-sweep runs as a lax.scan over levels with a FIXED [N/2, ...]
      state (garbage tail rows beyond each level's valid prefix) — one
      point-add instance for all levels;
    - every Fenwick contribution (levels x boundaries) is gathered into one
      stacked array and folded by ONE scanned point-add.

    Arithmetic is ~log2(N)/2 x the tree formulation (each scan step
    processes the full fixed-width state), which is irrelevant on the
    XLA-CPU multichip gate where COMPILE time is the budget: the unrolled
    formulation cost ~27 min of XLA-CPU compile for one prove module at
    n=1024; this one compiles in ~1-2 min. The TPU single-chip path keeps
    the work-optimal unrolled trees."""
    n = keys.shape[0]
    log_n = max(0, n.bit_length() - 1)
    p = _boundary_positions(keys, 1 << c)             # [m(,W)]
    sex0 = _fenwick_gather_level(ops, spts, p, 0)     # [m(,W), ...]
    if log_n == 0:
        total = tuple(a[0] for a in spts)
        contribs = tuple(a for a in sex0)
    else:
        lvl1 = _pair_halve(ops, spts)                 # [n/2, ...]
        half = n // 2
        if log_n >= 2:
            i2 = jnp.minimum(
                jnp.arange(half, dtype=jnp.int32) * 2,
                max(half - 2, 0),
            )

            def step(s, _):
                a = tuple(jnp.take(x, i2, axis=0) for x in s)
                b = tuple(jnp.take(x, i2 + 1, axis=0) for x in s)
                return _flat_add(ops, a, b), s

            final, ys = jax.lax.scan(step, lvl1, None, length=log_n - 1)
            stacked = tuple(
                jnp.concatenate([y, f[None]], axis=0)
                for y, f in zip(ys, final)
            )                                          # levels 1..log_n
        else:
            final = lvl1
            stacked = tuple(f[None] for f in lvl1)
        total = tuple(a[0] for a in final)
        # batched Fenwick gather over all levels at once
        ls = jnp.arange(1, log_n + 1, dtype=jnp.uint32)
        pl = p[None] >> ls.reshape((log_n,) + (1,) * p.ndim)  # [L, m(,W)]
        bit = pl & jnp.uint32(1)
        idx = (jnp.maximum(pl, jnp.uint32(1)) - jnp.uint32(1)).astype(
            jnp.int32
        )
        g = []
        for a in stacked:
            ix = idx.reshape(idx.shape + (1,) * (a.ndim - idx.ndim))
            g.append(jnp.take_along_axis(a, ix, axis=1))
        g = tuple(g)
        inf = C.infinity_like(ops, g)
        lvl_contribs = C.select_point(ops, bit == 1, g, inf)
        contribs = tuple(
            jnp.concatenate(
                [s0[None], lc], axis=0
            ).reshape((-1,) + s0.shape[1:])
            for s0, lc in zip(sex0, lvl_contribs)
        )                                              # [(L+1)*m, (W), ...]
    sum_sex = C.scan_fold(ops, contribs)               # [(W), ...]
    wt = _small_scalar_mul(ops, total, (1 << c) - 1)
    return _point_add_jit(ops, wt, C.point_neg(ops, sum_sex))


def _msm_window(ops, pts, digits, c: int, src_cols: int | None = None,
                compact: bool = False):
    """One Pippenger window group: sort by digit, up-sweep sum tree, Fenwick
    boundary reduction. digits uint32[N] -> point with no batch axis;
    digits uint32[N, M] -> points [M, ...]. With src_cols set, pts are the
    UNBROADCAST source stream ([N, ...] for src_cols == 1, [N, B, ...] for
    B sources) and the sort gathers from it directly. compact=True selects
    the O(1)-instance scan formulation (_compact_window) for traced
    shard_map contexts."""
    if src_cols is not None:
        keys, spts = _sorted_stream(ops, pts, digits, src_cols)
    else:
        keys, spts = _sort_by_digit(ops, pts, digits)
    if compact:
        return _compact_window(ops, spts, keys, c)
    if _engine() == "merge":
        buckets = _segmented_bucket_sums(ops, spts, keys, c)
        return _weighted_bucket_sum(ops, buckets)
    # boundaries first (needs only the sorted keys), then the up-sweep with
    # each level's Fenwick contribution folded in AS THE LEVEL IS PRODUCED —
    # no levels list stays live, so peak memory is ~2 level arrays instead
    # of the full 2x-stream level pyramid (the levels-list formulation blew
    # the 16 GB HBM budget assignment at W=16 G2 window groups).
    p = _boundary_positions(keys, 1 << c)        # [2^c-1, (W)]
    sex = _fenwick_gather_level(ops, spts, p, 0)
    cur = spts
    l = 0
    while cur[0].shape[0] > 1:
        cur = _pair_halve(ops, cur)
        l += 1
        sex = _point_add_jit(
            ops, sex, _fenwick_gather_level(ops, cur, p, l)
        )
    total = tuple(a[0] for a in cur)             # [(W), ...]
    sex = C.pad_to_pow2(ops, sex)
    while sex[0].shape[0] > 1:                   # reduce the k axis
        sex = _half_fold(ops, sex)
    sum_sex = tuple(a[0] for a in sex)           # [(W), ...]
    wt = _small_scalar_mul(ops, total, (1 << c) - 1)
    return _point_add_jit(ops, wt, C.point_neg(ops, sum_sex))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _msm_window_fused(ops, pts, digits, c: int, src_cols: int | None = None):
    """The whole window pass as ONE executable. The per-stage jits inline
    into this trace, so a pass costs a single dispatch instead of ~80.

    Rationale (measured round 5, tunneled v5e): per-executable launch
    overhead is ~1.3 ms even fully async (64k-batch mont_mul: 1.75 ms wall
    vs 0.4 ms compute), so the eager per-level structure — ~10k small
    executables for a 2^20 MSM — costs ~40 s in pure launch overhead while
    the arithmetic itself is ~3 s. One fused executable per window group
    removes all of it. The old `tens of minutes of XLA compile` concern
    predates the Pallas mont_mul kernel, which XLA treats as one opaque
    custom call: the fused pass now compiles in ~1-2 min (cached across
    runs via the persistent compilation cache)."""
    return _msm_window(ops, pts, digits, c, src_cols)


def _fused() -> bool:
    """Fuse the whole window pass into one executable? Default: yes on
    accelerators (per-executable launch overhead through the tunneled
    runtime is ~1.3 ms — see _msm_window_fused), no on CPU (XLA-CPU compiles
    the per-level executables once and shares them across every shape/test;
    the fused mega-module costs ~2 min of LLVM time per distinct shape)."""
    import os

    if os.environ.get("ZKT_MSM_NO_FUSE"):
        return False
    if os.environ.get("ZKT_MSM_FUSE"):
        return True
    return jax.default_backend() != "cpu"


def _engine() -> str:
    """Bucket-phase engine: "fenwick" (default; sum tree + boundary queries,
    scatter-free) or "merge" (round-4 segmented merge tree, kept for A/B)."""
    import os

    return os.environ.get("ZKT_MSM_ENGINE", "fenwick")


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
        win_fn = _msm_window_fused if _fused() else _msm_window
        grp = win_fn(ops, pts_t, dig_flat, c, b)           # [B*W, ...]
        partials.append(
            tuple(x.reshape((b, w) + x.shape[1:]) for x in grp)
        )
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=1) for i in range(3)
    )                                                      # [B, n_windows, ...]
    return _horner_combine_many(ops, stacked, c)


def msm_pippenger_traced(ops, pts, scalars, nbits: int, c: int,
                         window_chunk: int | None = None):
    """Fully-traceable single-MSM Pippenger (no host-side stream chunking, no
    eager dispatch) for use INSIDE jit/shard_map bodies — e.g. the local MSM
    modules of the sharded Groth16 prove (parallel/sharded_groth16.py), which
    previously used a 256-step double-and-add scan (~16x the point work).
    pts: Jacobian tuple [n, ...]; scalars uint32[n, S]. Returns one point."""
    pts, scalars = C.pad_to_pow2(ops, pts, scalars)
    n = pts[0].shape[0]
    n_windows = (nbits + c - 1) // c
    wc = window_chunk or n_windows
    partials = []
    for lo in range(0, n_windows, wc):
        hi = min(lo + wc, n_windows)
        digits = _window_digits_group(scalars, c, lo, hi)   # [N, W]
        partials.append(_msm_window(ops, pts, digits, c, 0, compact=True))
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=0) for i in range(3)
    )
    return _horner_combine(ops, stacked, c)


def msm_pippenger_many_traced(ops, pts, scalars, nbits: int, c: int,
                              window_chunk: int | None = None):
    """Traceable batched variant: pts [B, n, ...], scalars [B, n, S] ->
    [B, ...]. Same program as msm_pippenger_many minus host orchestration."""
    b = pts[0].shape[0]
    pts, scalars = _pad_stream_axis1(ops, pts, scalars)
    n = pts[0].shape[1]
    n_windows = (nbits + c - 1) // c
    pts_t = tuple(a.swapaxes(0, 1) for a in pts)
    scal_t = scalars.swapaxes(0, 1)
    wc = window_chunk or n_windows
    partials = []
    for lo in range(0, n_windows, wc):
        hi = min(lo + wc, n_windows)
        w = hi - lo
        digits = _window_digits_cols(scal_t, c, lo, hi)
        dig_flat = digits.reshape(n, b * w)
        grp = _msm_window(ops, pts_t, dig_flat, c, b, compact=True)
        partials.append(tuple(x.reshape((b, w) + x.shape[1:]) for x in grp))
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=1) for i in range(3)
    )
    return _horner_combine_many(ops, stacked, c)


def _auto_window_chunk(n: int, n_windows: int, struct_elems: int) -> int:
    """How many windows to batch per dispatch group: bounded by a device
    memory budget for the gathered per-window point copies (sorted copy,
    broadcast input, and the top merge-tree levels each hold one W-wide
    stream copy live). Prefers a divisor of n_windows so every group
    compiles to the SAME executable shape."""
    import os

    cap = int(os.environ.get("ZKT_MSM_MEM_BYTES", 6 << 30))
    # live set per pass ~ 3x one W-wide sorted stream (sorted copy + two
    # up-sweep level arrays; the Fenwick fold frees levels as it goes)
    per_window = n * struct_elems * 4 * 3
    raw = max(1, min(n_windows, cap // max(per_window, 1)))
    for d in range(raw, 0, -1):
        if n_windows % d == 0:
            return d
    return raw


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
        __import__("os").environ.get("ZKT_MSM_MAX_STREAM", 1 << 20)
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
    win_fn = _msm_window_fused if _fused() else _msm_window
    partials = []  # per window, ascending
    for lo in range(0, n_windows, wc):
        ws = list(range(lo, min(lo + wc, n_windows)))
        if len(ws) == 1:
            digits = _window_digits(scalars, c, ws[0])
            partials.append(
                tuple(x[None] for x in win_fn(ops, pts, digits, c, 0))
            )
        else:
            digits = _window_digits_group(scalars, c, ws[0], ws[-1] + 1)  # [N, W]
            group = win_fn(ops, pts, digits, c, 0)  # tuple of [W, ...]
            partials.append(group)
    stacked = tuple(
        jnp.concatenate([p[i] for p in partials], axis=0) for i in range(3)
    )
    return _horner_combine(ops, stacked, c)
