"""StandardComposer end-to-end: gates -> prover -> proof -> verifier.

Analog of test/composer/test_standard_composer.cpp's prove+verify round
trips, sized so the padded circuit hits n=16 (sharing compiled kernel shapes
with test_plonk).
"""

import pytest

from barretenberg_tpu.composer import AddTriple, MulTriple, StandardComposer
from barretenberg_tpu.fields import fr
from barretenberg_tpu.plonk import preprocess

P = fr.p


def build_circuit(num_pairs: int = 6):
    """num_pairs x (mul gate + add gate) satisfying c = a*b and d = a+b."""
    composer = StandardComposer()
    for i in range(num_pairs):
        a = 3 + i
        b = 7 + 2 * i
        a_idx = composer.add_variable(a)
        b_idx = composer.add_variable(b)
        c_idx = composer.add_variable(a * b % P)
        d_idx = composer.add_variable((a + b) % P)
        composer.create_mul_gate(
            MulTriple(a_idx, b_idx, c_idx, mul_scaling=1, c_scaling=P - 1, const_scaling=0)
        )
        composer.create_add_gate(
            AddTriple(a_idx, b_idx, d_idx, a_scaling=1, b_scaling=1,
                      c_scaling=P - 1, const_scaling=0)
        )
    composer.create_dummy_gates()
    return composer


def test_composer_sigma_mappings_are_permutations():
    composer = build_circuit()
    n = composer.n
    padded = 16
    while composer.n < padded - 1:
        composer.create_dummy_gates()
    s1, s2, s3 = composer.compute_sigma_mappings(padded)
    # the union of all three mappings must be a permutation of all 3n slots
    slots = set()
    for arr, base in ((s1, 0), (s2, 1 << 30), (s3, 1 << 31)):
        for v in arr.tolist():
            slots.add(v)
    assert len(slots) == 3 * padded


def test_composer_prove_and_verify():
    composer = build_circuit()
    prover = composer.preprocess()
    assert prover.n == 16
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)


def test_composer_unsatisfied_circuit_fails():
    composer = StandardComposer()
    for i in range(6):
        a_idx = composer.add_variable(3 + i)
        b_idx = composer.add_variable(5 + i)
        # wrong product: circuit is NOT satisfied
        c_idx = composer.add_variable(((3 + i) * (5 + i) + 1) % P)
        composer.create_mul_gate(
            MulTriple(a_idx, b_idx, c_idx, mul_scaling=1, c_scaling=P - 1,
                      const_scaling=0)
        )
        d_idx = composer.add_variable((8 + 2 * i) % P)
        composer.create_add_gate(
            AddTriple(a_idx, b_idx, d_idx, a_scaling=1, b_scaling=1,
                      c_scaling=P - 1, const_scaling=0)
        )
    composer.create_dummy_gates()
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert not verifier.verify_proof(proof)
