#!/usr/bin/env python
"""First-divergence debug harness for the stdlib circuit benches.

Proves the SAME circuit on CPU (oracle, known-verifying) and on TPU, dumping
every intermediate digest / commitment / challenge to JSON; diffing the two
dumps pinpoints the first phase where the TPU run diverges.

Usage:
  python tools/debug_circuit.py --circuit mimc --backend cpu
  python tools/debug_circuit.py --circuit mimc --backend tpu
  python tools/debug_circuit.py --diff mimc
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.path.join(REPO, "tools", "debug_out")


def digest(arr) -> str:
    import numpy as np

    return hashlib.sha256(np.asarray(arr).tobytes()).hexdigest()[:16]


def build_mimc():
    from barretenberg_tpu.composer import MiMCComposer
    from barretenberg_tpu.stdlib import field_t, mimc_block_cipher, witness_t

    ctx = MiMCComposer()
    x = field_t.from_witness(witness_t(ctx, 0x1234))
    k = field_t.from_witness(witness_t(ctx, 0x5678))
    out = mimc_block_cipher(x, k)
    for _ in range(31):
        out = mimc_block_cipher(out, k)
    ctx.create_dummy_gates()
    return ctx


def build_sha256():
    import hashlib as h

    from barretenberg_tpu.composer import StandardComposer
    from barretenberg_tpu.stdlib import BitArray, sha256 as sha256_gadget

    ctx = StandardComposer()
    inp = BitArray.from_string(ctx, b"abc")
    out = sha256_gadget(inp)
    ctx.create_dummy_gates()
    assert out.to_bytes() == h.sha256(b"abc").digest()
    return ctx


BUILDERS = {"mimc": build_mimc, "sha256": build_sha256}


def run(circuit: str, backend: str) -> None:
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from barretenberg_tpu.plonk import preprocess
    from barretenberg_tpu.srs.reference_string import ReferenceString

    t0 = time.time()

    def log(msg):
        print(f"[dbg t+{time.time() - t0:5.1f}s] {msg}", file=sys.stderr, flush=True)

    rec: dict = {"circuit": circuit, "backend": jax.default_backend()}
    ctx = BUILDERS[circuit]()
    gates = ctx.n
    padded = 1
    while padded < gates + 1:
        padded <<= 1
    rec["gates"] = gates
    rec["padded_n"] = padded
    srs_path = os.path.join(REPO, ".srs_cache", f"srs_{padded}.dat")
    srs = ReferenceString.load(srs_path, padded)
    log(f"{circuit}: {gates} gates padded {padded}; srs loaded")

    prover = ctx.preprocess(reference_string=srs)
    rec["sigma_map_digest"] = [
        digest(m)
        for m in (
            prover.sigma_1_mapping,
            prover.sigma_2_mapping,
            prover.sigma_3_mapping,
        )
    ]
    rec["wire_eval_digest"] = [digest(prover.w_l), digest(prover.w_r), digest(prover.w_o)]
    verifier = preprocess(prover)
    log("preprocess done")
    rec["sigma_commitments"] = [
        [str(c) for c in verifier.sigma_1_commitment],
        [str(c) for c in verifier.sigma_2_commitment],
        [str(c) for c in verifier.sigma_3_commitment],
    ]
    rec["widget_commitments"] = [
        [[str(x) for x in c] for c in w.commitments] for w in verifier.verifier_widgets
    ]

    # ---- phases, with dumps between (mirrors Prover.construct_proof) ----
    from barretenberg_tpu.plonk.permutation import compute_permutation_lagrange_base

    small = prover.state.small_domain
    prover.sigma_1 = compute_permutation_lagrange_base(prover.sigma_1_mapping, small)
    prover.sigma_2 = compute_permutation_lagrange_base(prover.sigma_2_mapping, small)
    prover.sigma_3 = compute_permutation_lagrange_base(prover.sigma_3_mapping, small)
    rec["sigma_base_digest"] = [
        digest(prover.sigma_1), digest(prover.sigma_2), digest(prover.sigma_3)
    ]
    log("sigma bases")
    prover.compute_wire_coefficients()
    rec["wire_coeff_digest"] = [
        digest(prover.w_l), digest(prover.w_r), digest(prover.w_o)
    ]
    prover.compute_wire_commitments()
    rec["wire_commitments"] = [
        [str(c) for c in prover.proof.w_l_commitment],
        [str(c) for c in prover.proof.w_r_commitment],
        [str(c) for c in prover.proof.w_o_commitment],
    ]
    rec["gamma"] = str(prover.challenges.gamma)
    rec["beta"] = str(prover.challenges.beta)
    log("round 1 done")
    prover.compute_z_coefficients()
    rec["z_poly_digest"] = digest(prover.z_poly)
    prover.compute_z_commitment()
    rec["z_commitment"] = [str(c) for c in prover.proof.z_commitment]
    rec["alpha"] = str(prover.challenges.alpha)
    log("round 2 done")
    prover.compute_quotient_polynomial()
    rec["quotient_digest"] = digest(prover.state.quotient_large)
    rec["wire_fft_digest"] = [
        digest(prover.state.w_l_fft),
        digest(prover.state.w_r_fft),
        digest(prover.state.w_o_fft),
    ]
    prover.compute_quotient_commitment()
    rec["t_commitments"] = [
        [str(c) for c in prover.proof.t_lo_commitment],
        [str(c) for c in prover.proof.t_mid_commitment],
        [str(c) for c in prover.proof.t_hi_commitment],
    ]
    rec["z_challenge"] = str(prover.challenges.z)
    log("round 3 done")
    prover.compute_opening_elements()
    p = prover.proof
    rec["evals"] = {
        k: str(getattr(p, k, None))
        for k in (
            "w_l_eval", "w_r_eval", "w_o_eval", "sigma_1_eval", "sigma_2_eval",
            "z_1_shifted_eval", "linear_eval", "w_o_shifted_eval",
            "q_mimc_coefficient_eval",
        )
    }
    rec["nu"] = str(prover.challenges.nu)
    rec["pi_z_commitment"] = [str(c) for c in p.pi_z_commitment]
    rec["pi_z_omega_commitment"] = [str(c) for c in p.pi_z_omega_commitment]
    log("round 5 done; verifying")
    rec["verified"] = bool(verifier.verify_proof(p))
    log(f"verified: {rec['verified']}")

    os.makedirs(OUT_DIR, exist_ok=True)
    out_path = os.path.join(OUT_DIR, f"{circuit}_{backend}.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(out_path)


def diff(circuit: str) -> None:
    recs = {}
    for backend in ("cpu", "tpu"):
        path = os.path.join(OUT_DIR, f"{circuit}_{backend}.json")
        with open(path) as f:
            recs[backend] = json.load(f)
    keys = [k for k in recs["cpu"] if k != "backend"]
    for k in keys:
        a, b = recs["cpu"].get(k), recs["tpu"].get(k)
        mark = "OK " if a == b else ">>>"
        if a != b:
            print(f"{mark} {k}:\n      cpu={a}\n      tpu={b}")
        else:
            print(f"{mark} {k}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--circuit", default="mimc", choices=list(BUILDERS))
    ap.add_argument("--backend", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--diff", metavar="CIRCUIT", default=None)
    args = ap.parse_args()
    if args.diff:
        diff(args.diff)
    else:
        assert args.backend
        run(args.circuit, args.backend)
