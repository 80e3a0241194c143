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


def _retry(fn, attempts: int = 3, label: str = ""):
    """Remote-compile flake guard: the tunneled TPU compile service can drop
    a response mid-read (BENCH_r03 died on 'response body closed before all
    bytes were read' during the Groth16 warm-up prove). Retrying re-issues
    only the failed compiles — everything already compiled is cached."""
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            log(f"{label}: attempt {i + 1}/{attempts} failed: {e!r}")
            if i == attempts - 1:
                raise
            time.sleep(10)


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


def _limb_dot_mod_r(a_np: np.ndarray, b_np: np.ndarray, nbits_b: int) -> int:
    """sum_i int(a_i) * (int(b_i) mod 2^nbits_b)  mod r, computed from the
    16-bit limb matrices with ONE uint64 matmul: sum_i a_i b_i =
    sum_{j,l} 2^(16(j+l)) * (A^T B)[j,l]. Products < 2^32 and N <= 2^20 keep
    every accumulation below 2^52 — exact in uint64."""
    from zk_toolkit_tpu.curves.bls12_381 import params

    a = a_np.astype(np.uint64)
    b = b_np.astype(np.uint64).copy()
    top, rem = divmod(nbits_b, 16)
    if rem and b.shape[1] > top:
        b[:, top] &= (1 << rem) - 1
    if b.shape[1] > top + (1 if rem else 0):
        b[:, top + (1 if rem else 0):] = 0
    m = a.T @ b
    total = 0
    for j in range(m.shape[0]):
        for l in range(m.shape[1]):
            total += int(m[j, l]) << (16 * (j + l))
    return total % params.R


def bench_msm(quick: bool) -> tuple[float, float]:
    """(seconds per 2^20 MSM, points/s) over n DISTINCT random points
    (generated with the windowed fixed-base path) and random 256-bit
    scalars. The result is asserted against the known-dlog host oracle:
    P_i = k_i*G with known k_i, so the MSM must equal
    (sum s_i k_i mod r) * G — an exact check costing one uint64 matmul plus
    one host scalar-mul. The bench refuses to report a wrong result."""
    import jax
    import jax.numpy as jnp
    from zk_toolkit_tpu.curves.bls12_381 import g1, params
    from zk_toolkit_tpu.ops import curve_ops as C, limbs as L, msm as M
    from zk_toolkit_tpu.ops.field_ops import FqOps
    from zk_toolkit_tpu.protocols.groth16_device import fixed_base_g1
    from zk_toolkit_tpu.utils import host_curve as HC

    n = 1 << (12 if quick else 20)
    spec = L.field_spec(params.Q)
    ops = FqOps(spec)
    rng = np.random.default_rng(1)
    base_np = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    base_scalars = jnp.asarray(base_np)
    pts = fixed_base_g1(base_scalars)
    scalars_np = np.zeros((n, 16), dtype=np.uint32)
    raw = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    scalars_np[:] = raw
    # The MSM is asked for nbits=255 but its 32 c=8 windows span bits
    # [0, 256); mask the stream to 255 bits so the kernel and the known-dlog
    # oracle (which reduces mod 2^255) see the same scalars. Real callers
    # (Groth16, signatures) always pass scalars < r < 2^255.
    scalars_np[:, 15] &= 0x7FFF
    scalars = jnp.asarray(scalars_np)

    c = None  # default c=8: the 2^16-bucket c=16 path crashes the TPU AOT helper
    res = M.msm_pippenger(ops, pts, scalars, 255, c=c)
    jax.block_until_ready(res)

    got = C.unpack_points(tuple(a[None] for a in res), spec)[0]
    expect_k = _limb_dot_mod_r(base_np, scalars_np, 255)
    gp = g1.g()
    F1 = HC.FpHost(params.Q)
    want = HC.jac_to_affine(
        F1, HC.jac_mul(F1, HC.from_affine(F1, (gp.x.e, gp.y.e)), expect_k)
    )
    if got != want:
        raise RuntimeError(
            f"MSM(2^{n.bit_length() - 1}) does not match the known-dlog host "
            f"oracle — refusing to report"
        )
    log(f"msm known-dlog oracle: OK (n={n})")

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = M.msm_pippenger(ops, pts, scalars, 255, c=c)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / reps
    return dt, n / dt


def bench_pairing(quick: bool) -> float:
    """Batched optimal-ate pairings/s, asserted against the host optimal-ate
    oracle (curves/bls12_381/optimal_ate.py) before any number is reported."""
    import jax
    import jax.numpy as jnp
    from zk_toolkit_tpu.curves.bls12_381 import g1, g2
    from zk_toolkit_tpu.curves.bls12_381 import optimal_ate as oa
    from zk_toolkit_tpu.ops import pairing_ops as P
    from zk_toolkit_tpu.ops.tower_ops import unpack_fq12

    ops = P.bls_pairing_ops()
    spec = ops.f.spec
    b = 16 if quick else 256
    pa1 = P.pack_g1_affine([g1.g() * 3], spec)
    qa1 = P.pack_g2_affine([g2.g() * 5], spec)
    pa = tuple(jnp.tile(a, (b,) + (1,) * (a.ndim - 1)) for a in pa1)
    qa = tuple(jnp.tile(a, (b,) + (1,) * (a.ndim - 1)) for a in qa1)
    out = P.pairing_e(ops, pa, qa)
    out.block_until_ready()

    gt = unpack_fq12(out, spec)
    want = oa.OptimalAtePairing().e(g1.g() * 3, g2.g() * 5).e
    if gt[0] != want or gt[-1] != want:
        raise RuntimeError(
            "device pairing does not match the host optimal-ate oracle — "
            "refusing to report"
        )
    log("pairing host oracle: OK")

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
    # warm-up verify: the first call pays the Miller-loop compile (~40 s),
    # which round 4 mistakenly reported as verify_s. Time the SECOND call —
    # execution only.
    verifier = GD.DeviceGroth16Verifier()
    ok = verifier.verify(proof, crs, prover.statement())
    log(f"groth16 bench: proof verifies = {ok}")
    if not ok:
        raise RuntimeError(
            "groth16 proof failed device verification — refusing to report"
        )
    t0 = time.perf_counter()
    ok = verifier.verify(proof, crs, prover.statement())
    verify_s = time.perf_counter() - t0
    if not ok:
        raise RuntimeError("groth16 verify flipped on re-run")
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        proof = prover.prove_with_rs(crs, r=7, s=8)
    jax.block_until_ready(proof.a)
    dt = (time.perf_counter() - t0) / reps
    return {"prove_s": dt, "crs_s": crs_s, "verify_s": verify_s}


def bench_ipa(quick: bool) -> float:
    """Seconds for one 2^10-length Bulletproofs inner-product argument
    (2^6 when --quick) through the fused device rounds; the run must accept
    (it proves a true statement) or no number is reported."""
    import random

    import jax.numpy as jnp
    from zk_toolkit_tpu.curves import secp256k1
    from zk_toolkit_tpu.ops import curve_ops as C
    from zk_toolkit_tpu.ops import limbs as L
    from zk_toolkit_tpu.ops import msm as M
    from zk_toolkit_tpu.protocols import bulletproofs_device as BD

    n = 1 << (6 if quick else 10)
    rng = random.Random(17)
    spec = BD._P_OPS.spec
    gp = C.pack_points([secp256k1.g()], spec)
    # bases/aux points on device: one batched scalar-mul of the generator
    ks = [rng.randrange(1, secp256k1.N) for _ in range(2 * n + 1)]
    base = tuple(jnp.tile(t, (2 * n + 1,) + (1,) * (t.ndim - 1)) for t in gp)
    pts = C.scalar_mul(BD._P_OPS, base, C.pack_scalars(ks, 256), 256)
    gg = tuple(t[:n] for t in pts)
    hh = tuple(t[n : 2 * n] for t in pts)
    u = tuple(t[2 * n :] for t in pts)
    a = [rng.randrange(secp256k1.N) for _ in range(n)]
    b = [rng.randrange(secp256k1.N) for _ in range(n)]
    c = sum(x * y for x, y in zip(a, b)) % secp256k1.N
    # P = g^a h^b u^c as one (2n+1)-point MSM on device
    scal = C.pack_scalars(a + b + [c], 256)
    P = tuple(t[None] for t in M.msm_pippenger(BD._P_OPS, pts, scal, 256))
    chal = [rng.randrange(1, secp256k1.N) for _ in range(n.bit_length() - 1)]
    am, bm = BD._fr(a), BD._fr(b)

    ok = BD.DeviceBulletproofs(list(chal)).inner_product_argument(
        n, gg, hh, u, P, am, bm
    )  # warm-up + correctness gate
    if not ok:
        raise RuntimeError("IPA rejected a true statement — refusing to report")
    t0 = time.perf_counter()
    ok = BD.DeviceBulletproofs(list(chal)).inner_product_argument(
        n, gg, hh, u, P, am, bm
    )
    dt = time.perf_counter() - t0
    assert ok
    return dt


def bench_weak_scaling() -> dict | None:
    """Weak-scaling proxies + collective-inventory evidence, measured in a
    SUBPROCESS on the virtual 8-device CPU mesh (parallel/weak_scaling.py).
    The subprocess clears PALLAS_AXON_POOL_IPS so it neither claims nor
    blocks on the tunneled TPU this process is using."""
    import subprocess
    import tempfile

    dump_dir = tempfile.mkdtemp(prefix="zkt_hlo_dump_")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(_here, ".jax_cache_scaling"),
        "ZKT_XLA_DUMP_DIR": dump_dir,
        "XLA_FLAGS": (
            "--xla_force_host_platform_device_count=8"
            " --xla_backend_optimization_level=0"
            " --xla_llvm_disable_expensive_passes=true"
            f" --xla_dump_to={dump_dir}"
            " --xla_dump_hlo_pass_re=.*after_optimizations.*"
        ),
    })
    proc = subprocess.run(
        [sys.executable, "-m", "zk_toolkit_tpu.parallel.weak_scaling"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=_here,
    )
    if proc.returncode != 0:
        log(f"weak scaling runner failed rc={proc.returncode}: "
            f"{proc.stderr[-2000:]}")
        return {"error": f"runner rc={proc.returncode}: "
                         f"{proc.stderr[-300:]}"}
    last = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    return json.loads(last[-1]) if last else {"error": "runner emitted no JSON"}


def host_msm_rate() -> float:
    """Single-threaded host-tier (reference-semantics) MSM points/s, measured
    on 64 points (VERDICT r4: 4 samples of a ~50 pts/s path was noise) — the
    stand-in baseline (the reference publishes no numbers; BASELINE.md)."""
    import random
    from zk_toolkit_tpu.curves.bls12_381 import g1, params

    random.seed(3)
    n = 64
    pts = [g1.g() * random.randrange(1, params.R) for _ in range(n)]
    ks = [random.randrange(params.R) for _ in range(n)]
    t0 = time.perf_counter()
    acc = g1.infinity()
    for p, k in zip(pts, ks):
        acc = acc + p * k
    dt = time.perf_counter() - t0
    return n / dt


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
        extra["fq_mont_muls_per_s"] = _retry(
            lambda: bench_field_muls(quick), label="field bench")
        log(f"field muls/s: {extra['fq_mont_muls_per_s']:.3e}")
    except Exception as e:  # pragma: no cover
        log(f"field bench failed: {e!r}")

    try:
        extra["pairings_per_s"] = _retry(
            lambda: bench_pairing(quick), label="pairing bench")
        log(f"pairings/s: {extra['pairings_per_s']:.1f}")
    except Exception as e:
        log(f"pairing bench failed: {e!r}")

    try:
        g16 = _retry(lambda: bench_groth16(quick), label="groth16 bench")
        extra["groth16_prove_s"] = g16["prove_s"]
        extra["groth16_crs_s"] = g16["crs_s"]
        extra["groth16_verify_s"] = g16["verify_s"]
        extra["groth16_proves_per_s"] = 1.0 / g16["prove_s"]
        log(f"groth16 prove s: {g16['prove_s']:.2f} (crs {g16['crs_s']:.1f}s)")
    except Exception as e:
        log(f"groth16 bench failed: {e!r}")

    try:
        ipa_s = _retry(lambda: bench_ipa(quick), label="ipa bench")
        extra["ipa_2pow10_s" if not quick else "ipa_2pow6_s"] = ipa_s
        log(f"ipa: {ipa_s:.2f}s")
    except Exception as e:
        log(f"ipa bench failed: {e!r}")

    msm_s, msm_pts_per_s = _retry(lambda: bench_msm(quick), label="msm bench")
    extra["msm_seconds"] = msm_s
    log(f"msm: {msm_s:.3f}s ({msm_pts_per_s:.3e} pts/s)")

    if not quick:
        # LOUD on failure (VERDICT r4 item 2): a missing weak_scaling field
        # hid four rounds of crashes — absence must be an error string, not
        # silence.
        try:
            ws = bench_weak_scaling()
            if ws and "error" not in ws:
                extra["weak_scaling"] = ws
                log(f"weak scaling: {json.dumps(ws)[:400]} ...")
            else:
                extra["weak_scaling_error"] = (
                    ws.get("error") if ws else "runner produced no JSON"
                )
        except Exception as e:
            extra["weak_scaling_error"] = repr(e)
            log(f"weak scaling failed: {e!r}")

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
