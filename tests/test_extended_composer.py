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
    assert composer.deleted_count > 0
    assert composer.n == n_before - composer.deleted_count
    assert any(q != 0 for q in composer.q_oo)


def _add(c, a, b, o):
    c.create_add_gate(AddTriple(a, b, o, 1, 1, P - 1, 0))


def test_basic_add_chain_gate_counts():
    """Port of test_extended_composer.cpp:29-52
    (test_combine_linear_relations_basic_add): 3 chained adds -> the middle
    gate is deleted, 2 gates remain."""
    c = ExtendedComposer()
    w = [c.add_variable(v) for v in (1, 1, 2, 1, 3, 1, 4)]
    _add(c, w[0], w[1], w[2])
    _add(c, w[2], w[3], w[4])
    _add(c, w[4], w[5], w[6])
    n_before = c.n
    zero_idx = c.add_variable(0)
    c._combine_linear_relations(zero_idx)
    assert n_before == 3 and c.n == 2
    assert c.deleted_count == 1
    assert c.q_oo[0] != 0  # merged row reads w_o(X.omega)
    assert c.check_circuit()


def test_basic_mul_add_gate_counts():
    """Port of test_extended_composer.cpp:54-77: mul + add + add -> middle
    gate deleted; the mul's operands stay in their fixed slots."""
    c = ExtendedComposer()
    w = [c.add_variable(v) for v in (2, 3, 6, 1, 7, 1, 8)]
    c.create_mul_gate(MulTriple(w[0], w[1], w[2], 1, P - 1, 0))
    _add(c, w[2], w[3], w[4])
    _add(c, w[4], w[5], w[6])
    zero_idx = c.add_variable(0)
    c._combine_linear_relations(zero_idx)
    assert c.n == 2
    assert c.deleted_count == 1
    # multiplicative operands keep the l/r slots of the merged row
    assert c.w_l[0] == w[0] and c.w_r[0] == w[1]
    assert c.q_m[0] != 0
    assert c.check_circuit()


def test_anchoring_rewrite_between_adjacent_quads():
    """The anchoring path (extended_composer.cpp:233-265): two adjacent
    quads where the second has no lookahead into the following gate; the
    second quad keeps a selector-free anchor row whose output wire lets
    the first quad elide its gate."""
    c = ExtendedComposer()
    a, b, cc, d, e, f, g, h, i_ = (
        c.add_variable(v) for v in (1, 2, 3, 4, 7, 5, 12, 6, 18)
    )
    _add(c, a, b, cc)      # gate 0: a+b = c
    _add(c, cc, d, e)      # gate 1: c+d = e      (quad A: removes c)
    _add(c, e, f, g)       # gate 2: e+f = g
    _add(c, g, h, i_)      # gate 3: g+h = i      (quad B: removes g)
    c.create_dummy_gates()
    n_before = c.n
    zero_idx = c.add_variable(0)
    c._combine_linear_relations(zero_idx)
    assert c.merged_count == 2
    assert c.deleted_count == 1  # quad B anchors (no delete), quad A deletes
    assert c.n == n_before - 1
    # anchor row: selector-free, output-only
    anchor_rows = [
        k
        for k in range(c.n)
        if c.q_m[k] == c.q_l[k] == c.q_r[k] == c.q_o[k] == c.q_c[k] == 0
        and c.q_oo[k] == 0
        and c.w_o[k] != zero_idx
    ]
    assert anchor_rows, "no anchor row emitted"
    assert c.check_circuit()


def test_anchored_chain_proves_and_verifies():
    c = ExtendedComposer()
    a, b, cc, d, e, f, g, h, i_ = (
        c.add_variable(v) for v in (1, 2, 3, 4, 7, 5, 12, 6, 18)
    )
    _add(c, a, b, cc)
    _add(c, cc, d, e)
    _add(c, e, f, g)
    _add(c, g, h, i_)
    c.create_dummy_gates()
    prover = c.preprocess()
    verifier = preprocess(prover)
    proof = prover.construct_proof()
    assert verifier.verify_proof(proof)
    assert c.merged_count == 2


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
