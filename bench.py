"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ..., "extra": {...}}

Headline metric: 2^20-point BLS12-381 G1 MSM throughput (BASELINE.md). The
reference publishes no numbers (its README is explicitly anti-optimization),
so vs_baseline is reported against a measured single-threaded host-tier
(Python-int, reference-semantics) MSM rate extrapolated to 2^20 points.

Extra metrics: BLS12-381 Fq Montgomery muls/s/chip, batched optimal-ate
pairing throughput, Groth16 prove time on a 2^16-constraint R1CS.

Everything runs on the default JAX platform (the real TPU under the driver;
JAX_PLATFORMS=cpu works for smoke runs — use --quick).
"""

from __future__ import annotations

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_here, ".jax_cache_bench"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_field_muls(quick: bool) -> float:
    """Montgomery muls/s on BLS12-381 Fq (K = 24 16-bit limbs)."""
    import jax
    import jax.numpy as jnp
    from zk_toolkit_tpu.curves.bls12_381 import params
    from zk_toolkit_tpu.ops import limbs as L

    spec = L.field_spec(params.Q)
    b = 1 << (12 if quick else 16)
    chain = 16 if quick else 64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 16, size=(b, spec.K), dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 1 << 16, size=(b, spec.K), dtype=np.uint32))

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def chained(a, c, n):
        def body(x, _):
            return L.mont_mul(x, c, spec), None
        out, _ = jax.lax.scan(body, a, None, length=n)
        return out

    chained(a, c, chain).block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = chained(a, c, chain)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return b * chain / dt


def bench_msm(quick: bool) -> tuple[float, float]:
    """(seconds per 2^20 MSM, points/s) over n DISTINCT random points
    (generated with the windowed fixed-base path) and random 256-bit
    scalars."""
    import jax
    import jax.numpy as jnp
    from zk_toolkit_tpu.curves.bls12_381 import params
    from zk_toolkit_tpu.ops import curve_ops as C, limbs as L, msm as M
    from zk_toolkit_tpu.ops.field_ops import FqOps
    from zk_toolkit_tpu.protocols.groth16_device import fixed_base_g1

    n = 1 << (12 if quick else 20)
    spec = L.field_spec(params.Q)
    ops = FqOps(spec)
    rng = np.random.default_rng(1)
    base_scalars = jnp.asarray(
        rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    )
    pts = fixed_base_g1(base_scalars)
    scalars_np = np.zeros((n, 16), dtype=np.uint32)
    raw = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars_np[:] = raw
    scalars = jnp.asarray(scalars_np)

    c = None  # default c=8: the 2^16-bucket c=16 path crashes the TPU AOT helper
    res = M.msm_pippenger(ops, pts, scalars, 255, c=c)
    jax.block_until_ready(res)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = M.msm_pippenger(ops, pts, scalars, 255, c=c)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / reps
    return dt, n / dt


def bench_pairing(quick: bool) -> float:
    """Batched optimal-ate pairings/s."""
    import jax
    import jax.numpy as jnp
    from zk_toolkit_tpu.curves.bls12_381 import g1, g2
    from zk_toolkit_tpu.ops import pairing_ops as P

    ops = P.bls_pairing_ops()
    spec = ops.f.spec
    b = 16 if quick else 256
    pa1 = P.pack_g1_affine([g1.g() * 3], spec)
    qa1 = P.pack_g2_affine([g2.g() * 5], spec)
    pa = tuple(jnp.tile(a, (b,) + (1,) * (a.ndim - 1)) for a in pa1)
    qa = tuple(jnp.tile(a, (b,) + (1,) * (a.ndim - 1)) for a in qa1)
    out = P.pairing_e(ops, pa, qa)
    out.block_until_ready()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = P.pairing_e(ops, pa, qa)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    return b / dt


def bench_groth16(quick: bool) -> dict:
    """Groth16 on a synthetic 2^16-constraint R1CS (2^10 when --quick)
    through the public API. Returns {prove_s, crs_s, verify_s}."""
    import jax
    from zk_toolkit_tpu.curves.bls12_381 import params
    from zk_toolkit_tpu.protocols import groth16_device as GD
    from zk_toolkit_tpu.snark.synthetic import synthetic_r1cs

    n = 1 << (10 if quick else 16)
    log(f"groth16 bench: building synthetic R1CS n={n} ...")
    tmpl, wit = synthetic_r1cs(params.SUBGROUP, n, seed=2)
    mat = GD.CircuitMatrices.from_tmpl(tmpl)

    log(f"groth16 bench: generating CRS (m={mat.m}) ...")
    t0 = time.perf_counter()
    crs = GD.DeviceCRS.from_trapdoor(mat, tau=987654321, alpha=11, beta=22,
                                     gamma=33, delta=44)
    jax.block_until_ready(crs.g1_u)
    crs_s = time.perf_counter() - t0

    prover = GD.DeviceGroth16Prover(mat, wit)
    log("groth16 bench: warm-up prove ...")
    proof = prover.prove_with_rs(crs, r=5, s=6)
    jax.block_until_ready(proof.a)
    t0 = time.perf_counter()
    ok = GD.DeviceGroth16Verifier().verify(proof, crs, prover.statement())
    verify_s = time.perf_counter() - t0
    log(f"groth16 bench: proof verifies = {ok}")
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = prover.prove_with_rs(crs, r=7, s=8)
    jax.block_until_ready(proof.a)
    dt = (time.perf_counter() - t0) / reps
    return {"prove_s": dt, "crs_s": crs_s, "verify_s": verify_s}


def host_msm_rate() -> float:
    """Single-threaded host-tier (reference-semantics) MSM points/s, measured
    on a small sample — the stand-in baseline (the reference publishes no
    numbers; BASELINE.md)."""
    import random
    from zk_toolkit_tpu.curves.bls12_381 import g1, params

    random.seed(3)
    pts = [g1.g() * random.randrange(1, params.R) for _ in range(4)]
    ks = [random.randrange(params.R) for _ in range(4)]
    t0 = time.perf_counter()
    acc = g1.infinity()
    for p, k in zip(pts, ks):
        acc = acc + p * k
    dt = time.perf_counter() - t0
    return len(pts) / dt


def main():
    # sitecustomize imports jax before this file runs, freezing env-var
    # config reads — route the cache settings through the config API.
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    quick = "--quick" in sys.argv
    extra = {}
    t_start = time.time()

    try:
        extra["fq_mont_muls_per_s"] = bench_field_muls(quick)
        log(f"field muls/s: {extra['fq_mont_muls_per_s']:.3e}")
    except Exception as e:  # pragma: no cover
        log(f"field bench failed: {e!r}")

    try:
        extra["pairings_per_s"] = bench_pairing(quick)
        log(f"pairings/s: {extra['pairings_per_s']:.1f}")
    except Exception as e:
        log(f"pairing bench failed: {e!r}")

    try:
        g16 = bench_groth16(quick)
        extra["groth16_prove_s"] = g16["prove_s"]
        extra["groth16_crs_s"] = g16["crs_s"]
        extra["groth16_verify_s"] = g16["verify_s"]
        log(f"groth16 prove s: {g16['prove_s']:.2f} (crs {g16['crs_s']:.1f}s)")
    except Exception as e:
        log(f"groth16 bench failed: {e!r}")

    msm_s, msm_pts_per_s = bench_msm(quick)
    extra["msm_seconds"] = msm_s
    log(f"msm: {msm_s:.3f}s ({msm_pts_per_s:.3e} pts/s)")

    try:
        base_rate = host_msm_rate()
        extra["host_reference_msm_pts_per_s"] = base_rate
        vs = msm_pts_per_s / base_rate
    except Exception as e:
        log(f"host baseline failed: {e!r}")
        vs = None

    extra["wall_s"] = time.time() - t_start
    n = 1 << (12 if quick else 20)
    print(json.dumps({
        "metric": f"bls12_381_g1_msm_2pow{n.bit_length()-1}_points_per_s",
        "value": msm_pts_per_s,
        "unit": "points/s",
        "vs_baseline": vs,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
