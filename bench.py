#!/usr/bin/env python
"""Benchmark harness (run on real TPU hardware).

Prints ONE headline JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
and writes every measured axis to BENCH_DETAILS.json (merged, not
overwritten, and flushed after EVERY axis so a timeout still leaves
parseable data - round-2 lesson).

Axes mirror the reference's harness (reference:
test/benchmarks/bench_barretenberg.cpp:282-755 Pippenger/field/FFT axes,
bench_plonk.cpp:18-92 prover wall time, bench_sha256.cpp:23-120,
bench_mimc.cpp:18-93). Baseline: the reference's only stated absolute
figure, ~4 us per scalar-mul for large-batch Pippenger
(src/barretenberg/pippenger.md:7); vs_baseline = baseline / ours, so > 1
means faster than the reference.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SRS_CACHE_DIR = os.path.join(REPO, ".srs_cache")
DETAILS_PATH = os.path.join(REPO, "BENCH_DETAILS.json")

# Persistent XLA compile cache: MUST be configured before the first
# compile. Round 2 only set this in tests/conftest.py, so every driver
# bench run compiled cold (237s for the 2^20 MSM) and timed out.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_T0 = time.time()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "480"))


def _log(msg: str) -> None:
    print(f"[bench t+{time.time() - _T0:5.1f}s] {msg}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return _DEADLINE_S - (time.time() - _T0)


def _sync(x):
    return jax.block_until_ready(x)


def _record(details: dict, key: str, value: dict) -> None:
    """Merge one axis into BENCH_DETAILS.json on disk immediately."""
    details[key] = value
    on_disk = {}
    if os.path.exists(DETAILS_PATH):
        try:
            with open(DETAILS_PATH) as f:
                on_disk = json.load(f)
        except (json.JSONDecodeError, OSError):
            on_disk = {}
    on_disk.update(details)
    with open(DETAILS_PATH, "w") as f:
        json.dump(on_disk, f, indent=2, default=str)
    _log(f"axis done: {json.dumps({key: value}, default=str)}")


def timeit(fn, *args, warmup: int = 1, iters: int = 3):
    """Returns (best_seconds, first_call_seconds). fn must return jax arrays."""
    t0 = time.perf_counter()
    _sync(fn(*args))
    first = time.perf_counter() - t0
    for _ in range(max(0, warmup - 1)):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, first


def _fetch(x):
    """Force completion by fetching ONE element to host (slicing first so
    only a tiny buffer crosses the wire)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def chain_timeit(fn, x, *extra, iters: int = 10):
    """Device-throughput timing: run a DEPENDENT chain c <- fn(c, *extra)
    and fetch once at the end, so the per-call remote-dispatch round trip
    (~24ms through the axon TPU tunnel, which swamps single-call walls of
    hot kernels) amortizes away. This matches how the ops run in anger:
    the prover issues long pipelines of kernels without host syncs, like
    the reference's benchmark hot loops (bench_barretenberg.cpp:720-755
    times 10^7 back-to-back calls between two rdtsc reads).

    Returns (per_call_seconds, first_call_seconds)."""
    t0 = time.perf_counter()
    c = fn(x, *extra)
    _fetch(c)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        c = fn(c, *extra)
    _fetch(c)
    return (time.perf_counter() - t0) / iters, first


def get_srs(degree: int):
    """Deterministic SRS, generated on device once and cached on disk."""
    from barretenberg_tpu.srs.reference_string import ReferenceString

    os.makedirs(SRS_CACHE_DIR, exist_ok=True)
    path = os.path.join(SRS_CACHE_DIR, f"srs_{degree}.dat")
    if os.path.exists(path):
        _log(f"loading cached SRS degree {degree}")
        return ReferenceString.load(path, degree)
    _log(f"generating SRS degree {degree} on device")
    t0 = time.perf_counter()
    srs = ReferenceString.generate(degree, 0xA11CE)
    _sync(srs.monomials.x)
    _log(f"SRS generated in {time.perf_counter() - t0:.1f}s; saving")
    mono = srs.monomials_host()
    ReferenceString.save(path, mono[1:], srs.g2_x)
    return srs


def bench_mont_mul(n: int, details: dict):
    from barretenberg_tpu.fields import fr

    rng = np.random.default_rng(1)
    a = fr.random_elements(n, rng)
    b = fr.random_elements(n, rng)
    f = jax.jit(fr.mont_mul)
    best, first = chain_timeit(f, a, b, iters=20)
    _record(details, "mont_mul", {
        "n": n,
        "ns_per_op": best / n * 1e9,
        "mops_per_s": n / best / 1e6,
        "gbytes_per_s": 3 * 18 * 4 * n / best / 1e9,
        "compile_s": first,
    })


def bench_fft(log_n: int, details: dict):
    from barretenberg_tpu.fields import fr
    from barretenberg_tpu.polynomials import fft
    from barretenberg_tpu.polynomials.domain import get_domain

    n = 1 << log_n
    dom = get_domain(n)
    dom.warm_tables()
    rng = np.random.default_rng(2)
    coeffs = fr.random_elements(n, rng)
    f = jax.jit(lambda c: fft.fft(c, dom))
    best, first = chain_timeit(f, coeffs)
    _record(details, f"fft_2e{log_n}", {
        "n": n,
        "wall_ms": best * 1e3,
        "compile_s": first,
    })


def bench_msm(log_n: int, details: dict, srs=None):
    from barretenberg_tpu.fields import fr
    from barretenberg_tpu.groups.g1 import g1
    from barretenberg_tpu.msm import pippenger

    n = 1 << log_n
    if srs is None:
        srs = get_srs(n)
    points = g1.take_affine(srs.monomials, jnp.arange(n))
    rng = np.random.default_rng(3)
    # K distinct scalar sets, dispatched back-to-back with ONE final fetch
    # (in-order device stream => last completion implies all done); per-call
    # tunnel round trips amortize away, same rationale as chain_timeit.
    K = 4
    scalar_sets = [fr.random_elements(n, rng) for _ in range(K)]
    t0 = time.perf_counter()
    _fetch(pippenger(scalar_sets[0], points))
    first = time.perf_counter() - t0
    _fetch(pippenger(scalar_sets[1], points))  # steady-state warm
    t0 = time.perf_counter()
    out = None
    for s in scalar_sets:
        out = pippenger(s, points)
    _fetch(out)
    best = (time.perf_counter() - t0) / K
    _record(details, f"msm_2e{log_n}", {
        "n": n,
        "us_per_point": best / n * 1e6,
        "wall_s": best,
        "compile_s": first,
    })
    return best / n * 1e6


def bench_prove(log_n: int, details: dict):
    """Full PLONK prove at n gates (reference bench_plonk.cpp:18-92).
    First call includes phase compiles; the second is the steady-state
    number."""
    from tests.test_plonk import build_fixture_prover

    n = 1 << log_n
    srs = get_srs(n)
    prover = build_fixture_prover(n, srs=srs)
    cold_timings: dict = {}
    t0 = time.perf_counter()
    prover.construct_proof(timings=cold_timings)
    cold = time.perf_counter() - t0
    _log(f"prove 2^{log_n} cold {cold:.1f}s phases {cold_timings}")
    prover = build_fixture_prover(n, srs=srs)
    timings: dict = {}
    t0 = time.perf_counter()
    proof = prover.construct_proof(timings=timings)
    wall = time.perf_counter() - t0
    # verify once for the record (bench_plonk.cpp benches this too)
    from barretenberg_tpu.plonk import preprocess

    prover2 = build_fixture_prover(n, srs=srs)
    verifier = preprocess(prover2)
    t1 = time.perf_counter()
    ok = verifier.verify_proof(proof)
    verify_s = time.perf_counter() - t1
    _record(details, f"plonk_prove_2e{log_n}", {
        "n": n,
        "wall_s": wall,
        "cold_s": cold,
        "verify_s": verify_s,
        "verified": bool(ok),
        "phases_s": timings,
        "cold_phases_s": cold_timings,
    })


def _bench_circuit(name: str, build, details: dict):
    """Shared prove/verify harness for the stdlib circuit benches."""
    from barretenberg_tpu.plonk import preprocess

    t0 = time.perf_counter()
    ctx, extra = build()
    witness_s = time.perf_counter() - t0
    gates = ctx.n
    padded = 1
    while padded < gates + 1:
        padded <<= 1
    srs = get_srs(padded)
    _log(f"{name} circuit: {gates} gates (padded {padded}), witness {witness_s:.1f}s")

    t0 = time.perf_counter()
    prover = ctx.preprocess(reference_string=srs)
    verifier = preprocess(prover)
    setup_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    proof = prover.construct_proof()
    prove_s = time.perf_counter() - t0
    # steady-state prove: fresh prover, same compiled phases (the first
    # prove's wall is dominated by XLA compiles at a fresh size)
    prover2 = ctx.preprocess(reference_string=srs)
    t0 = time.perf_counter()
    proof2 = prover2.construct_proof()
    prove_warm_s = time.perf_counter() - t0
    assert proof2.serialize() == proof.serialize()
    t0 = time.perf_counter()
    ok = verifier.verify_proof(proof)
    verify_s = time.perf_counter() - t0
    entry = {
        "gates": gates,
        "padded_n": padded,
        "witness_s": witness_s,
        "setup_s": setup_s,
        "prove_s": prove_s,
        "prove_warm_s": prove_warm_s,
        "verify_s": verify_s,
        "verified": bool(ok),
    }
    entry.update(extra)
    _record(details, f"{name}_circuit", entry)


def bench_sha256(details: dict):
    """SHA256 circuit prove/verify - the reference's flagship demo
    (bench_sha256.cpp:23-120): one-block 'abc' through the stdlib gadget."""
    import hashlib

    from barretenberg_tpu.composer import StandardComposer
    from barretenberg_tpu.stdlib import BitArray, sha256 as sha256_gadget

    def build():
        ctx = StandardComposer()
        inp = BitArray.from_string(ctx, b"abc")
        out = sha256_gadget(inp)
        ctx.create_dummy_gates()
        assert out.to_bytes() == hashlib.sha256(b"abc").digest()
        return ctx, {}

    _bench_circuit("sha256", build, details)


def bench_mimc(details: dict):
    """MiMC circuit prove/verify (reference bench_mimc.cpp:18-93):
    repeated mimc7 rounds through the MiMC composer's native gates."""
    from barretenberg_tpu.composer import MiMCComposer
    from barretenberg_tpu.stdlib import field_t, mimc_block_cipher, witness_t

    def build():
        ctx = MiMCComposer()
        x = field_t.from_witness(witness_t(ctx, 0x1234))
        k = field_t.from_witness(witness_t(ctx, 0x5678))
        out = mimc_block_cipher(x, k)
        for _ in range(31):
            out = mimc_block_cipher(out, k)
        ctx.create_dummy_gates()
        return ctx, {"blocks": 32}

    _bench_circuit("mimc", build, details)


def bench_extended(details: dict, length: int = 5000):
    """ExtendedComposer merged-gate circuit prove/verify at bench scale -
    the q_oo / Sequential-widget path on hardware (reference
    test_extended_composer.cpp:29-380 e2e pattern + composer benches)."""
    from barretenberg_tpu.composer import ExtendedComposer
    from barretenberg_tpu.stdlib import field_t, witness_t

    def build():
        ctx = ExtendedComposer()
        acc = field_t.from_witness(witness_t(ctx, 1))
        total = 1
        for i in range(length):
            v = i + 2
            acc = acc + field_t.from_witness(witness_t(ctx, v))
            total += v
        acc.assert_equal(field_t(ctx, value=total))
        ctx.create_dummy_gates()
        return ctx, {"chain_length": length}

    _bench_circuit("extended", build, details)


def bench_bool(details: dict, pairs: int = 1100):
    """BoolComposer circuit prove/verify at bench scale - the Bool-widget
    path on hardware at n >= 2^12 (reference test_bool_composer.cpp e2e
    pattern; each pair adds 2 bool-constrained wires + mul + add gates)."""
    from barretenberg_tpu.composer import AddTriple, BoolComposer, MulTriple
    from barretenberg_tpu.fields import fr

    def build():
        composer = BoolComposer()
        for i in range(pairs):
            a, b = (i >> 1) & 1, i & 1
            a_idx = composer.add_variable(a)
            b_idx = composer.add_variable(b)
            c_idx = composer.add_variable(a * b)
            d_idx = composer.add_variable(a + b)
            composer.create_bool_gate(a_idx)
            composer.create_bool_gate(b_idx)
            composer.create_mul_gate(
                MulTriple(a_idx, b_idx, c_idx, 1, fr.p - 1, 0)
            )
            composer.create_add_gate(
                AddTriple(a_idx, b_idx, d_idx, 1, 1, fr.p - 1, 0)
            )
        composer.create_dummy_gates()
        return composer, {"bool_pairs": pairs}

    _bench_circuit("bool", build, details)


def bench_srs_check(log_n: int, details: dict, sample: int = 2048):
    """SRS validation at scale (reference test_io.cpp:12 loads 100k points,
    checks on-curve + tau-pairing consistency): (a) device on-curve sweep
    over ALL monomials, (b) a full-coverage random-linear-combination
    pairing gate (2 MSMs + 2 pairings cover every index), (c) a sampled
    per-index pairing gate."""
    import numpy as np

    from barretenberg_tpu.pairing.device import (
        srs_on_curve_all,
        validate_srs_device,
        validate_srs_rlc,
    )

    n = 1 << log_n
    srs = get_srs(n)
    t0 = time.perf_counter()
    on_curve = srs_on_curve_all(srs)
    t_curve = time.perf_counter() - t0
    t0 = time.perf_counter()
    rlc = validate_srs_rlc(srs)
    t_rlc = time.perf_counter() - t0
    rng = np.random.default_rng(99)
    idx = sorted(rng.choice(n - 1, size=min(sample, n - 1), replace=False).tolist())
    t0 = time.perf_counter()
    sampled = validate_srs_device(srs, idx)
    t_sample = time.perf_counter() - t0
    _record(details, f"srs_check_2e{log_n}", {
        "n": n,
        "on_curve_all": bool(on_curve),
        "on_curve_s": t_curve,
        "rlc_full_coverage": bool(rlc),
        "rlc_s": t_rlc,
        "pairing_sample_indices": len(idx),
        "pairing_sample_ok": bool(sampled),
        "pairing_sample_s": t_sample,
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes only")
    ap.add_argument("--msm-log-n", type=int, default=None)
    ap.add_argument("--prove", action="store_true", help="include PLONK prove")
    ap.add_argument("--prove-log-n", type=int, default=None)
    ap.add_argument("--sha256", action="store_true", help="include SHA256 circuit prove")
    ap.add_argument("--mimc", action="store_true", help="include MiMC circuit prove")
    ap.add_argument(
        "--bool", dest="bool_circuit", action="store_true",
        help="include BoolComposer circuit prove (n=2^12)",
    )
    ap.add_argument(
        "--extended", action="store_true",
        help="include ExtendedComposer merged-gate circuit prove",
    )
    ap.add_argument(
        "--srs-check", action="store_true",
        help="include SRS on-curve + pairing-consistency validation",
    )
    ap.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="capture a jax.profiler trace of the MSM (the analog of the "
        "reference's BARRETENBERG_PROFILING binary, main.cpp:59-70)",
    )
    args = ap.parse_args()

    details = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if args.msm_log_n:
        msm_log = args.msm_log_n
    elif args.quick:
        msm_log = 12
    else:
        # prefer the largest size whose SRS is already on disk (2^20 is the
        # headline scale; generating its SRS fresh costs minutes one-time)
        msm_log = 16
        for log in (20, 18, 16):
            if os.path.exists(os.path.join(SRS_CACHE_DIR, f"srs_{1 << log}.dat")):
                msm_log = log
                break

    # ---- headline axis FIRST so a timeout later never loses it ----------
    _log(f"msm 2^{msm_log}")
    if args.profile:
        with jax.profiler.trace(args.profile):
            us_per_point = bench_msm(msm_log, details)
        _log(f"profiler trace written to {args.profile}")
    else:
        us_per_point = bench_msm(msm_log, details)

    baseline_us = 4.0  # pippenger.md:7
    headline = {
        "metric": f"msm_2e{msm_log}_us_per_point",
        "value": round(us_per_point, 3),
        "unit": "us/point",
        "vs_baseline": round(baseline_us / us_per_point, 3),
    }
    print(json.dumps(headline), flush=True)

    # ---- secondary axes, each guarded by the wall-clock budget -----------
    if _remaining() > 30:
        _log("mont_mul 2^20")
        bench_mont_mul(1 << 20, details)
    if _remaining() > 60:
        _log("fft")
        bench_fft(12 if args.quick else 20, details)
    # PLONK prove runs by DEFAULT (budget-guarded): it is the reference's
    # flagship capability (bench_plonk.cpp:18-92), so the driver artifact
    # must carry it. --quick keeps it opt-in via --prove.
    if (args.prove or not args.quick) and _remaining() > 90:
        bench_prove(args.prove_log_n or (10 if args.quick else 14), details)
    if args.sha256 and _remaining() > 60:
        bench_sha256(details)
    if args.mimc and _remaining() > 60:
        bench_mimc(details)
    if args.bool_circuit and _remaining() > 60:
        bench_bool(details)
    if args.extended and _remaining() > 60:
        bench_extended(details)
    if args.srs_check and _remaining() > 60:
        bench_srs_check(msm_log, details)
    _log(f"all axes done at t+{time.time() - _T0:.1f}s")


if __name__ == "__main__":
    sys.exit(main())
