"""ExtendedComposer: gate merging via the 4th virtual wire.

Analog of test/composer/test_extended_composer.cpp:29-380 - gate-count
assertions plus full prove/verify through the sequential widget's
w_o(X.omega) path."""

from barretenberg_tpu.composer import AddTriple, MulTriple
from barretenberg_tpu.composer.extended import ExtendedComposer
from barretenberg_tpu.fields import fr
from barretenberg_tpu.plonk import preprocess
from barretenberg_tpu.stdlib import field_t, witness_t

P = fr.p


def build_chain_circuit(length: int = 6):
    """An addition chain a0 + a1 + ... through intermediate wires - the
    shape the optimizer targets (each intermediate is used exactly twice,
    in adjacent gates)."""
    composer = ExtendedComposer()
    acc = field_t.from_witness(witness_t(composer, 1))
    for i in range(length):
        nxt = field_t.from_witness(witness_t(composer, i + 2))
        acc = acc + nxt
    # pin the final value so the chain is load-bearing
    expected = 1 + sum(i + 2 for i in range(length))
    acc.assert_equal(field_t(composer, value=expected))
    composer.create_dummy_gates()
    return composer


def test_gate_merging_reduces_count():
    composer = build_chain_circuit(6)
    n_before = composer.n
    zero_idx = composer.add_variable(0)
    composer._combine_linear_relations(zero_idx)
    assert composer.merged_count > 0
    assert composer.n == n_before - composer.merged_count
    assert any(q != 0 for q in composer.q_oo)


def test_extended_composer_prove_and_verify():
    composer = build_chain_circuit(6)
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)
    assert composer.merged_count > 0


def test_extended_composer_rejects_bad_witness():
    composer = ExtendedComposer()
    a = field_t.from_witness(witness_t(composer, 3))
    b = field_t.from_witness(witness_t(composer, 4))
    c = a + b
    d = c + a
    # forge the final wire AFTER construction: 3+4+3 != 11
    composer.variables[d.witness_index] = 11
    composer.create_dummy_gates()
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert not verifier.verify_proof(proof)


def test_extended_composer_mixed_gates():
    """Mul gates interleaved with additions still prove."""
    composer = ExtendedComposer()
    a = field_t.from_witness(witness_t(composer, 5))
    b = field_t.from_witness(witness_t(composer, 7))
    c = a * b
    d = c + a
    e = d * b
    f = e + d + c
    val = f.get_value()
    f.assert_equal(field_t(composer, value=val))
    composer.create_dummy_gates()
    prover = composer.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)
