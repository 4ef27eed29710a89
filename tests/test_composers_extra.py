"""Bool and MiMC composer end-to-end prove/verify.

Analog of test/composer/test_bool_composer.cpp:14-200 and
test_mimc_composer.cpp: each composer builds a small satisfiable circuit,
proves, verifies; unsatisfiable variants must fail.
"""

import pytest

from barretenberg_tpu.composer import (
    AddTriple,
    BoolComposer,
    MiMCComposer,
    MiMCQuadruplet,
    MulTriple,
)
from barretenberg_tpu.fields import fr
from barretenberg_tpu.plonk import preprocess

P = fr.p


def build_bool_circuit(tamper: bool = False):
    composer = BoolComposer()
    # boolean wires through mul/add gates: c = a*b, d = a+b with a,b in {0,1}
    for a, b in ((1, 0), (1, 1), (0, 0), (0, 1)):
        a_idx = composer.add_variable(a)
        b_idx = composer.add_variable(b)
        c_idx = composer.add_variable(a * b % P)
        d_idx = composer.add_variable((a + b) % P)
        composer.create_bool_gate(a_idx)
        composer.create_bool_gate(b_idx)
        composer.create_mul_gate(
            MulTriple(a_idx, b_idx, c_idx, 1, P - 1, 0)
        )
        composer.create_add_gate(
            AddTriple(a_idx, b_idx, d_idx, 1, 1, P - 1, 0)
        )
    if tamper:
        # non-boolean value on a wire marked boolean
        x = composer.add_variable(2)
        y = composer.add_variable(4)
        composer.create_bool_gate(x)
        composer.create_mul_gate(MulTriple(x, x, y, 1, P - 1, 0))
    composer.create_dummy_gates()
    return composer


def test_bool_composer_prove_and_verify():
    composer = build_bool_circuit()
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)


def test_bool_composer_rejects_nonboolean():
    composer = build_bool_circuit(tamper=True)
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert not verifier.verify_proof(proof)


def mimc_round(x: int, k: int, c: int):
    t = (x + k + c) % P
    cubed = pow(t, 3, P)
    out = t * cubed % P * cubed % P  # t^7
    return cubed, out


def build_mimc_circuit(rounds: int = 3, tamper: bool = False):
    composer = MiMCComposer()
    x, k = 11, 223
    x_idx = composer.add_variable(x)
    k_idx = composer.add_variable(k)
    for r in range(rounds):
        c = 5 + r
        cubed, out = mimc_round(x, k, c)
        if tamper and r == rounds - 1:
            out = (out + 1) % P
        cubed_idx = composer.add_variable(cubed)
        out_idx = composer.add_variable(out)
        composer.create_mimc_gate(
            MiMCQuadruplet(x_idx, k_idx, cubed_idx, out_idx, c)
        )
        x_idx, x = out_idx, out
    composer.create_dummy_gates()
    return composer


def test_mimc_composer_prove_and_verify():
    composer = build_mimc_circuit()
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)


def test_mimc_composer_rejects_bad_round():
    composer = build_mimc_circuit(tamper=True)
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert not verifier.verify_proof(proof)
