#!/usr/bin/env python
"""Cross-implementation bit-exactness check (VERDICT r2 item 5).

Builds the reference C++ prover (portable DISABLE_SHENANIGANS int128 path,
no OpenMP) from /root/reference, feeds BOTH provers the same generated
transcript.dat and the same deterministic splitmix64 fixture circuit
(fixture.cpp here == _build_twin_prover below), and compares the full
800-byte proof serialization byte for byte.

Run:  python tools/crosscheck/run_crosscheck.py
Exit 0 and prints "PROOFS IDENTICAL" on success.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF = os.environ.get("BARRETENBERG_REF", "/root/reference")
N = 16

sys.path.insert(0, REPO)

MASK64 = (1 << 64) - 1


def _splitmix_stream(state: int):
    while True:
        state = (state + 0x9E3779B97F4A7C15) & MASK64
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
        yield z ^ (z >> 31)


def _build_twin_prover(srs, n=N, with_bool=False):
    """The Python twin of fixture.cpp's circuit."""
    import numpy as np

    from barretenberg_tpu.fields import fr
    from barretenberg_tpu.plonk import Prover
    from barretenberg_tpu.plonk.widgets import (
        ProverArithmeticWidget,
        ProverBoolWidget,
    )

    P = fr.p
    gen = _splitmix_stream(0x5EED5EED5EED5EED)

    def det():
        w = [next(gen) for _ in range(4)]
        w[3] &= 0x1FFFFFFFFFFFFFFF
        return w[0] | (w[1] << 64) | (w[2] << 128) | (w[3] << 192)

    w_l = [0] * n
    w_r = [0] * n
    w_o = [0] * n
    q_m = [0] * n
    q_l = [0] * n
    q_r = [0] * n
    q_o = [0] * n
    q_c = [0] * n
    for i in range(n // 4):
        w_l[2 * i] = det()
        w_r[2 * i] = det()
        w_o[2 * i] = (w_l[2 * i] * w_r[2 * i] + w_l[2 * i] + w_r[2 * i] + 1) % P
        q_l[2 * i] = q_r[2 * i] = q_m[2 * i] = q_c[2 * i] = 1
        q_o[2 * i] = P - 1
        w_l[2 * i + 1] = det()
        w_r[2 * i + 1] = det()
        w_o[2 * i + 1] = det()
        q_c[2 * i + 1] = (-(w_l[2 * i + 1] + w_r[2 * i + 1] + w_o[2 * i + 1])) % P
        q_l[2 * i + 1] = q_r[2 * i + 1] = q_o[2 * i + 1] = 1

    shift = n // 2
    for arr in (w_l, w_r, w_o, q_m, q_l, q_r, q_o, q_c):
        arr[shift:] = arr[:shift]

    s1 = np.zeros(n, dtype=np.uint32)
    s2 = np.zeros(n, dtype=np.uint32)
    s3 = np.zeros(n, dtype=np.uint32)
    for i in range(shift):
        s1[shift + i] = i
        s2[shift + i] = i + (1 << 30)
        s3[shift + i] = i + (1 << 31)
        s1[i] = i + shift
        s2[i] = i + shift + (1 << 30)
        s3[i] = i + shift + (1 << 31)
    for j in (shift - 1, n - 1):
        s1[j] = j
        s2[j] = j + (1 << 30)
        s3[j] = j + (1 << 31)
        w_l[j] = w_r[j] = w_o[j] = 0
        q_c[j] = 0
    q_l[n - 1] = q_r[n - 1] = q_o[n - 1] = q_m[n - 1] = 0

    prover = Prover(n, srs)
    prover.w_l = fr.encode(w_l)
    prover.w_r = fr.encode(w_r)
    prover.w_o = fr.encode(w_o)
    prover.sigma_1_mapping = s1
    prover.sigma_2_mapping = s2
    prover.sigma_3_mapping = s3
    prover.widgets.append(
        ProverArithmeticWidget(
            fr.encode(q_m), fr.encode(q_l), fr.encode(q_r),
            fr.encode(q_o), fr.encode(q_c),
        )
    )
    if with_bool:
        q_bl = [1 if i % 3 == 0 else 0 for i in range(n)]
        q_br = [1 if i % 5 == 0 else 0 for i in range(n)]
        q_bo = [1 if i % 7 == 0 else 0 for i in range(n)]
        prover.widgets.append(
            ProverBoolWidget(fr.encode(q_bl), fr.encode(q_br), fr.encode(q_bo))
        )
    return prover


REF_SOURCES = [
    "curves/bn254/scalar_multiplication.cpp",
    "curves/bn254/pairing.cpp",
    "polynomials/evaluation_domain.cpp",
    "polynomials/polynomial_arithmetic.cpp",
    "polynomials/polynomial.cpp",
    "waffle/reference_string/reference_string.cpp",
    "waffle/proof_system/widgets/arithmetic_widget.cpp",
    "waffle/proof_system/widgets/bool_widget.cpp",
    "waffle/proof_system/prover/prover.cpp",
]
REF_C_SOURCES = ["keccak/keccakf1600.c", "keccak/keccak.c"]


def build_reference_fixture(transcript_path: str) -> str:
    out = os.path.join(HERE, "fixture.bin")
    objs = []
    base = os.path.join(REF, "src/barretenberg")
    common = [
        "-O2",
        "-DDISABLE_SHENANIGANS=1",
        "-DNO_MULTITHREADING=1",
        f'-DBARRETENBERG_SRS_PATH="{transcript_path}"',
        "-I" + os.path.join(REF, "src"),
        "-w",
    ]
    for src in REF_C_SOURCES:
        obj = os.path.join(HERE, os.path.basename(src) + ".o")
        subprocess.run(
            ["gcc", "-c", os.path.join(base, src), "-o", obj, *common],
            check=True,
        )
        objs.append(obj)
    for src in REF_SOURCES:
        obj = os.path.join(HERE, os.path.basename(src) + ".o")
        subprocess.run(
            ["g++", "-std=c++17", "-c", os.path.join(base, src), "-o", obj, *common],
            check=True,
        )
        objs.append(obj)
    subprocess.run(
        [
            "g++", "-std=c++17",
            os.path.join(HERE, "fixture.cpp"), *objs, "-o", out, *common,
        ],
        check=True,
    )
    return out


def build_reference_fixture_opt(transcript_path: str) -> str:
    """The reference's FAST configuration (x64 assembly field kernels +
    OpenMP over all host cores, its default build, field_impl_asm.tcc /
    CMakeLists) - used for the recorded same-host timing comparison; the
    int128 build above stays the byte-compare oracle. Both binaries print
    identical proofs (checked by the caller)."""
    out = os.path.join(HERE, "fixture_opt.bin")
    objs = []
    base = os.path.join(REF, "src/barretenberg")
    common = [
        "-O2",
        "-DNDEBUG",
        "-fopenmp",
        "-march=native",
        f'-DBARRETENBERG_SRS_PATH="{transcript_path}"',
        "-I" + os.path.join(REF, "src"),
        "-w",
    ]
    for src in REF_C_SOURCES:
        obj = os.path.join(HERE, os.path.basename(src) + ".opt.o")
        subprocess.run(
            ["gcc", "-c", os.path.join(base, src), "-o", obj, *common],
            check=True,
        )
        objs.append(obj)
    for src in REF_SOURCES:
        obj = os.path.join(HERE, os.path.basename(src) + ".opt.o")
        subprocess.run(
            ["g++", "-std=c++17", "-c", os.path.join(base, src), "-o", obj, *common],
            check=True,
        )
        objs.append(obj)
    subprocess.run(
        [
            "g++", "-std=c++17",
            os.path.join(HERE, "fixture.cpp"), *objs, "-o", out, *common,
        ],
        check=True,
    )
    return out


def main() -> int:
    import argparse
    import hashlib
    import json
    import time

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--big",
        type=int,
        default=None,
        metavar="LOG2N",
        help="single big-circuit case at n=2^LOG2N (e.g. 20): reference C++ "
        "prover on this host's cores vs barretenberg_tpu on the default JAX "
        "backend (TPU when available), same deterministic circuit, proofs "
        "compared byte for byte; walls of both sides are recorded",
    )
    args = ap.parse_args()

    if args.big is None:
        # default cases run the Python twin on CPU for reproducibility
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from barretenberg_tpu.srs import ReferenceString, test_srs

    if args.big is not None:
        # reuse bench.py's disk-cached deterministic SRS (same 0xA11CE
        # secret as test_srs) so neither side regenerates 2^20 points
        max_n = 1 << args.big
        cache = os.path.join(REPO, ".srs_cache", f"srs_{max_n}.dat")
        if os.path.exists(cache):
            srs = ReferenceString.load(cache, max_n)
            transcript = cache
        else:
            srs = test_srs(max_n)
            transcript = os.path.join(HERE, "transcript.dat")
            ReferenceString.save(transcript, srs.monomials_host()[1:], srs.g2_x)
    else:
        max_n = 256
        srs = test_srs(max_n)
        transcript = os.path.join(HERE, "transcript.dat")
        ReferenceString.save(transcript, srs.monomials_host()[1:], srs.g2_x)

    print("[crosscheck] building reference C++ prover (int128 path)...")
    binary = build_reference_fixture(transcript)
    with open(binary, "rb") as f:
        binary_sha = hashlib.sha256(f.read()).hexdigest()
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()

    if args.big is not None:
        cases = [
            {"name": f"arithmetic_2e{args.big}", "n": 1 << args.big,
             "with_bool": False},
        ]
    else:
        cases = [
            {"name": "arithmetic_n16", "n": 16, "with_bool": False},
            {"name": "bool_n256", "n": 256, "with_bool": True},
        ]
    record = {
        "git_head": head,
        "reference_binary_sha256": binary_sha,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "cases": [],
    }
    rc = 0
    for case in cases:
        t0 = time.perf_counter()
        ref_hex = subprocess.run(
            [binary, str(case["n"]), "1" if case["with_bool"] else "0"],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        ref_s = time.perf_counter() - t0
        print(f"[crosscheck] reference prover: {ref_s:.1f}s")
        print(f"[crosscheck] {case['name']}: running barretenberg_tpu twin...")
        prover = _build_twin_prover(srs, n=case["n"], with_bool=case["with_bool"])
        t0 = time.perf_counter()
        ours_hex = prover.construct_proof().serialize().hex()
        ours_s = time.perf_counter() - t0
        print(f"[crosscheck] barretenberg_tpu prover: {ours_s:.1f}s "
              f"(backend {jax.default_backend()})")
        case["ref_prove_s"] = round(ref_s, 3)
        case["tpu_prove_s"] = round(ours_s, 3)
        case["tpu_backend"] = jax.default_backend()
        if args.big is not None:
            # steady-state twin timing (first prove in a process pays the
            # XLA compile / cache-load round trips; the service shape is
            # the warm number - BENCH_DETAILS plonk_prove_* cold_s/wall_s)
            prover = _build_twin_prover(
                srs, n=case["n"], with_bool=case["with_bool"]
            )
            t0 = time.perf_counter()
            warm_hex = prover.construct_proof().serialize().hex()
            case["tpu_prove_warm_s"] = round(time.perf_counter() - t0, 3)
            assert warm_hex == ours_hex, "warm twin proof diverged"
            # reference fast build (asm + OpenMP): timing-only, must print
            # the identical proof
            try:
                opt_binary = build_reference_fixture_opt(transcript)
                t0 = time.perf_counter()
                opt_hex = subprocess.run(
                    [opt_binary, str(case["n"]),
                     "1" if case["with_bool"] else "0"],
                    check=True, capture_output=True, text=True,
                ).stdout.strip()
                case["ref_prove_opt_s"] = round(time.perf_counter() - t0, 3)
                case["ref_opt_identical"] = opt_hex == ref_hex
                print(f"[crosscheck] reference prover (asm+OpenMP): "
                      f"{case['ref_prove_opt_s']}s "
                      f"identical={case['ref_opt_identical']}")
            except subprocess.CalledProcessError as e:  # pragma: no cover
                print(f"[crosscheck] optimized reference build failed: {e}")
        identical = ref_hex == ours_hex
        entry = {
            **case,
            "identical": identical,
            "proof_bytes": len(ours_hex) // 2,
            "proof_sha256": hashlib.sha256(bytes.fromhex(ours_hex)).hexdigest(),
        }
        record["cases"].append(entry)
        if identical:
            print(f"  PROOFS IDENTICAL ({len(ours_hex) // 2} bytes)")
        else:
            rc = 1
            print("  MISMATCH")
            for k in range(0, min(len(ref_hex), len(ours_hex)), 64):
                if ref_hex[k : k + 64] != ours_hex[k : k + 64]:
                    print(f"  first differing element #{k // 64}")
                    entry["first_diff_element"] = k // 64
                    break
    record["identical"] = all(c["identical"] for c in record["cases"])
    out_path = os.path.join(REPO, "CROSSCHECK.json")
    if args.big is not None and os.path.exists(out_path):
        # merge the big case into the standing record instead of dropping
        # the default small cases
        with open(out_path) as f:
            prior = json.load(f)
        names = {c["name"] for c in record["cases"]}
        merged = [c for c in prior.get("cases", []) if c["name"] not in names]
        record["cases"] = merged + record["cases"]
        record["identical"] = all(c["identical"] for c in record["cases"])
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(f"[crosscheck] wrote {out_path} (identical={record['identical']})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
