"""Windowed fixed-base scalar multiplication.

The CRS of Groth16/Pinocchio is thousands-to-millions of multiples of ONE
generator (reference zktoolkit_based/crs.rs:49-146, pinocchio/crs.rs:46-159
— there a per-scalar double-and-add). Fixed-base is the textbook case for
window tables: precompute T[w][d] = d * 2^(c*w) * G once, and every scalar
multiplication becomes W = ceil(nbits/c) table gathers plus a log2(W)-deep
tree of batched point additions — zero doublings, no 256-step scan keeping
the whole scalar batch live (which is what OOM'd the 2^16-constraint CRS
build in round 1).

The table is stored in affine form ((x, y, inf); 2/3 the gather bandwidth of
Jacobian) and lifted to Jacobian z∈{0,1} at gather time. Batches are chunked
to bound device live memory.

Generic over the field-ops namespace: FqOps gives secp256k1 / BLS12-381 G1
tables, Fq2Ops gives G2.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from zk_toolkit_tpu.ops import curve_ops as C
from zk_toolkit_tpu.utils.bigint import LIMB_BITS


def _digits(scalars, c: int, w: int):
    """Digit of window w (bits [c*w, c*(w+1))) of each scalar.
    scalars: uint32[B, S] 16-bit limbs -> uint32[B] in [0, 2^c)."""
    per = LIMB_BITS // c
    limb = scalars[:, w // per]
    shift = jnp.uint32((w % per) * c)
    return (limb >> shift) & jnp.uint32((1 << c) - 1)


def build_table(ops, base_jac, nbits: int, c: int):
    """Affine window table for one base point.

    base_jac: Jacobian tuple with leading batch axis 1.
    Returns (ax, ay, inf) each with leading axis W * 2^c, entry
    w * 2^c + d holding d * 2^(c*w) * G (d = 0 rows are infinity).
    """
    assert LIMB_BITS % c == 0, "window size must divide the limb width"
    n_win = (nbits + c - 1) // c
    m = 1 << c

    # G_w = 2^(c*w) * G for every window: one scan of c-fold doubling over a
    # 1-point batch, collecting each window's base.
    def win_step(p, _):
        nxt = p
        for _ in range(c):
            nxt = C.point_double(ops, nxt)
        return nxt, p

    _, g_ws = jax.lax.scan(win_step, base_jac, None, length=n_win)
    g_ws = tuple(a[:, 0] for a in g_ws)  # [W, ...]

    # d * G_w for d = 0..2^c-1: running batched add over the window axis.
    def add_step(acc, _):
        nxt = C.point_add(ops, acc, g_ws)
        return nxt, acc

    init = C.infinity_like(ops, g_ws)
    _, entries = jax.lax.scan(add_step, init, None, length=m)
    # entries: [2^c, W, ...] -> flat [W * 2^c, ...] with index w * 2^c + d
    flat = tuple(
        jnp.swapaxes(a, 0, 1).reshape((n_win * m,) + a.shape[2:])
        for a in entries
    )
    ax, ay, inf = C.to_affine(ops, flat)
    return (ax, ay, inf)


def _table_cache_dir() -> str:
    d = os.environ.get("ZKT_TABLE_CACHE_DIR")
    if not d:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = os.path.join(root, ".zkt_tables")
    return d


def build_table_cached(ops, base_jac, nbits: int, c: int, key: str):
    """build_table with .npz persistence (SURVEY.md §5 checkpoint note: the
    reference rebuilds every reusable artifact per test — the window table is
    deterministic in (generator, nbits, c), so build it once per machine).
    Cache dir: $ZKT_TABLE_CACHE_DIR or <repo>/.zkt_tables (gitignored).

    The npz stores the table's full derivation spec (base-point limbs, field
    modulus, limb count, nbits, c) and the loader verifies every field plus a
    structural self-check — the w=0, d=1 entry must equal the base point —
    before trusting the file. A stale or foreign cache file silently
    substituting wrong window tables into every CRS is exactly the
    at-scale-corruption class round 4 debugged (ADVICE r4)."""
    import numpy as np

    spec = ops.spec if hasattr(ops, "spec") else ops.f.spec
    base_np = tuple(np.asarray(jax.device_get(a)) for a in base_jac)
    meta = {
        "meta_p": np.asarray([spec.p >> (32 * i) & 0xFFFFFFFF
                              for i in range(12)], dtype=np.uint64),
        "meta_dims": np.asarray([spec.K, nbits, c], dtype=np.int64),
        "meta_bx": base_np[0],
        "meta_by": base_np[1],
        "meta_bz": base_np[2],
    }
    path = os.path.join(_table_cache_dir(), f"{key}_n{nbits}_c{c}.npz")
    if os.path.exists(path):
        try:
            data = np.load(path)
            ok = all(
                k in data and data[k].shape == v.shape and (data[k] == v).all()
                for k, v in meta.items()
            )
            if ok:
                table = tuple(jnp.asarray(data[f"t{i}"]) for i in range(3))
                # structural self-check: entry w=0, d=1 is 1 * 2^0 * G = G
                g_aff = C.to_affine(ops, base_jac)
                e_x = np.asarray(jax.device_get(table[0][1]))
                e_y = np.asarray(jax.device_get(table[1][1]))
                g_x = np.asarray(jax.device_get(g_aff[0][0]))
                g_y = np.asarray(jax.device_get(g_aff[1][0]))
                if (e_x == g_x).all() and (e_y == g_y).all():
                    return table
        except Exception:
            pass  # corrupt/stale/foreign cache: rebuild below
    table = build_table(ops, base_jac, nbits, c)
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}.npz"
        np.savez_compressed(
            tmp,
            **{f"t{i}": np.asarray(jax.device_get(a))
               for i, a in enumerate(table)},
            **meta,
        )
        os.replace(tmp, path)
    except OSError:
        pass  # read-only filesystem: stay in-memory
    return table


def _lift(ops, aff):
    """Affine (x, y, inf) -> Jacobian with z in {0, 1}."""
    ax, ay, inf = aff
    one = ops.one_like(ax)
    zero = ops.zero_like(ax)
    x = ops.select(inf, one, ax)
    y = ops.select(inf, one, ay)
    z = ops.select(inf, zero, one)
    return (x, y, z)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _gather_fold(ops, table, scalars, c: int):
    """One chunk: gather each scalar's W window entries and tree-sum them.
    Returns a Jacobian tuple with leading axis B."""
    s_limbs = scalars.shape[1]
    n_win = s_limbs * LIMB_BITS // c
    m = 1 << c
    # digit index matrix [W, B] -> flat table rows w * 2^c + d
    digs = jnp.stack([_digits(scalars, c, w) for w in range(n_win)], axis=0)
    wi = jnp.arange(n_win, dtype=jnp.uint32)[:, None]
    flat_idx = wi * jnp.uint32(m) + digs                     # [W, B]
    # fused-coordinate gather: one wide-row take instead of three (TPU
    # row-gathers are row-count-limited; same trick as msm._sorted_stream)
    t_rows = table[0].shape[0]
    ax_f = table[0].reshape(t_rows, -1)
    ay_f = table[1].reshape(t_rows, -1)
    wx = ax_f.shape[-1]
    comb = jnp.concatenate([ax_f, ay_f], axis=-1)
    g = jnp.take(comb, flat_idx, axis=0)                     # [W, B, 2*wx]
    gax = g[..., :wx].reshape((n_win,) + scalars.shape[:1] + table[0].shape[1:])
    gay = g[..., wx:].reshape((n_win,) + scalars.shape[:1] + table[1].shape[1:])
    ginf = jnp.take(table[2], flat_idx, axis=0)
    pts = _lift(ops, (gax, gay, ginf))
    # pad W to a power of two with infinity, then halve along axis 0
    n = n_win
    target = 1 << max(0, (n - 1).bit_length())
    if target != n:
        pad = C.infinity_like(ops, tuple(a[: target - n] for a in pts))
        pts = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(pts, pad))
        n = target
    while n > 1:
        half = n // 2
        pts = C.point_add(
            ops, tuple(a[:half] for a in pts), tuple(a[half:] for a in pts)
        )
        n = half
    return tuple(a[0] for a in pts)


def scalar_mul_fixed(ops, table, scalars, c: int, chunk: int | None = None):
    """[k_i * G] for a batch of scalars against a precomputed window table.

    scalars: uint32[B, S] plain 16-bit limbs. Chunked so the gathered
    per-window point copies stay inside a device memory budget.

    Every _gather_fold execution is padded to a 1024-row-aligned batch:
    on the experimental TPU runtime, sublane-misaligned batches (B % 8 != 0,
    e.g. the old memory-budget chunk of 10700) produced wrong points in
    processes that had executed the table-build graphs, while every
    8/1024-aligned batch was bit-correct in the same processes (bisected
    round 4: fb_probe chunk=10700 -> 0/64 correct, chunk=4096 and
    chunk=40000 -> 64/64, table itself verified entry-by-entry). Zero-pad
    rows cost one infinity gather each and are sliced off the result."""
    b = scalars.shape[0]
    align = 1024
    if chunk is None:
        cap = int(os.environ.get("ZKT_FB_MEM_BYTES", 128 << 20))
        s_limbs = scalars.shape[1]
        n_win = s_limbs * LIMB_BITS // c
        struct = sum(
            functools.reduce(lambda x, y: x * y, a.shape[1:], 1) for a in table
        )
        per_row = n_win * struct * 4 * 2  # gathered copy + tree scratch
        chunk = max(align, cap // max(per_row, 1) // align * align)
    else:
        chunk = max(8, chunk - chunk % 8)

    def padded(lo: int, hi: int):
        """scalars[lo:hi] zero-padded to a 1024-row-aligned batch; zero
        scalars gather only infinity rows, so padding cannot change results.
        Sub-1024 batches also pad to 1024 (ADVICE r4): the miscompile bisect
        only proved 1024-aligned batches safe, and the cost is bounded at
        1023 infinity gathers once per call."""
        sl = scalars[lo:hi]
        n = hi - lo
        pad = (-n) % align
        if pad:
            sl = jnp.concatenate(
                [sl, jnp.zeros((pad,) + sl.shape[1:], dtype=sl.dtype)], axis=0
            )
        out = _gather_fold(ops, table, sl, c)
        return tuple(a[:n] for a in out) if pad else out

    if b <= chunk:
        return padded(0, b)
    parts = [padded(lo, min(lo + chunk, b)) for lo in range(0, b, chunk)]
    return tuple(jnp.concatenate([p[i] for p in parts], axis=0) for i in range(3))
