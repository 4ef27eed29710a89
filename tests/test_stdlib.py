"""stdlib gadget tests: witness generation + circuit satisfiability oracles,
plus small prove/verify round trips.

Mirrors the reference's stdlib test strategy (test_stdlib_field.cpp,
test_stdlib_uint32.cpp vs native uint32 arithmetic,
test_stdlib_sha256.cpp:89-260 NIST vectors, test_stdlib_mimc.cpp). The big
hash circuits are checked with the composer's host satisfiability oracle
(proving them is the benchmark's job, bench_sha256.cpp)."""

import hashlib

import pytest

from barretenberg_tpu.composer import BoolComposer, MiMCComposer, StandardComposer
from barretenberg_tpu.fields import fr
from barretenberg_tpu.plonk import preprocess
from barretenberg_tpu.stdlib import (
    BitArray,
    Uint32,
    bool_t,
    field_t,
    mimc7,
    sha256,
    witness_t,
)
from barretenberg_tpu.stdlib.mimc import mimc7_host

P = fr.p


# ---------------------------------------------------------------------------
# field_t
# ---------------------------------------------------------------------------
class TestFieldT:
    def test_lazy_constants_emit_no_gates(self):
        ctx = StandardComposer()
        a = field_t.from_witness(witness_t(ctx, 7))
        before = ctx.n
        b = a * 5 + 3  # constant scale/shift: no gates
        assert ctx.n == before
        assert b.get_value() == 7 * 5 + 3

    def test_add_mul_div(self):
        ctx = StandardComposer()
        a = field_t.from_witness(witness_t(ctx, 11))
        b = field_t.from_witness(witness_t(ctx, 23))
        c = a * b
        d = a + b
        e = d / b
        assert c.get_value() == 11 * 23
        assert d.get_value() == 34
        assert e.get_value() == 34 * pow(23, -1, P) % P
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_assert_equal_catches_mismatch(self):
        ctx = StandardComposer()
        a = field_t.from_witness(witness_t(ctx, 5))
        b = field_t.from_witness(witness_t(ctx, 5))
        (a + b).assert_equal(field_t(ctx, value=10))
        assert ctx.check_circuit()
        ctx2 = StandardComposer()
        x = field_t.from_witness(witness_t(ctx2, 5))
        # forge: claim x + 1 == 5
        (x + 1).assert_equal(field_t(ctx2, value=5))
        assert not ctx2.check_circuit()


# ---------------------------------------------------------------------------
# bool_t
# ---------------------------------------------------------------------------
class TestBoolT:
    @pytest.mark.parametrize("a", [False, True])
    @pytest.mark.parametrize("b", [False, True])
    def test_truth_tables(self, a, b):
        ctx = StandardComposer()
        x = bool_t.from_witness(witness_t(ctx, int(a)))
        y = bool_t.from_witness(witness_t(ctx, int(b)))
        assert (x & y).get_value() == (a and b)
        assert (x | y).get_value() == (a or b)
        assert (x ^ y).get_value() == (a ^ b)
        assert (~x).get_value() == (not a)
        assert (x == y).get_value() == (a == b)
        # inverted operands exercise the free-NOT path through gates
        assert ((~x) & y).get_value() == ((not a) and b)
        assert ((~x) ^ (~y)).get_value() == (a ^ b)
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_gates_are_sound(self):
        """Tampering with an AND output must break the circuit."""
        ctx = StandardComposer()
        x = bool_t.from_witness(witness_t(ctx, 1))
        y = bool_t.from_witness(witness_t(ctx, 1))
        z = x & y
        ctx.variables[z.witness_index] = 0  # forge
        assert not ctx.check_circuit()


# ---------------------------------------------------------------------------
# Uint32
# ---------------------------------------------------------------------------
MASK = 0xFFFFFFFF


class TestUint32:
    def test_arithmetic_vs_native(self):
        ctx = StandardComposer()
        a, b = 0xDEADBEEF, 0x12345678
        ua = Uint32.from_witness(witness_t(ctx, a))
        ub = Uint32.from_witness(witness_t(ctx, b))
        assert (ua + ub).get_value() == (a + b) & MASK
        assert (ua - ub).get_value() == (a - b) & MASK
        assert (ub - ua).get_value() == (b - a) & MASK
        assert (ua * ub).normalize().get_value() == (a * b) & MASK
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_divmod_vs_native(self):
        """Witness-division + range-checked remainder (reference
        uint32.tcc:743-830 operator/)."""
        ctx = StandardComposer()
        cases = [
            (0xDEADBEEF, 0x1234),
            (0x12345678, 0xDEADBEEF),  # quotient 0
            (0xFFFFFFFF, 1),
            (0xFFFFFFFF, 0xFFFFFFFF),
            (7, 3),
        ]
        for a, b in cases:
            ua = Uint32.from_witness(witness_t(ctx, a))
            ub = Uint32.from_witness(witness_t(ctx, b))
            assert (ua // ub).get_value() == a // b, (a, b)
            assert (ua % ub).get_value() == a % b, (a, b)
        # constant path
        assert (Uint32(ctx, value=100) // Uint32(ctx, value=7)).get_value() == 14
        assert (Uint32(ctx, value=100) % Uint32(ctx, value=7)).get_value() == 2
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_divmod_bad_quotient_witness_fails(self):
        """Tampering the quotient witness must break the circuit (the
        r < b range constraint)."""
        ctx = StandardComposer()
        ua = Uint32.from_witness(witness_t(ctx, 1000))
        ub = Uint32.from_witness(witness_t(ctx, 7))
        q = ua // ub
        assert ctx.check_circuit()
        # bump the quotient wire: remainder goes negative -> r < b fails
        idx = q._accumulator().witness_index
        ctx.variables[idx] = ctx.variables[idx] + 1
        assert not ctx.check_circuit()

    def test_bitwise_and_shifts_vs_native(self):
        ctx = StandardComposer()
        a, b = 0xCAFEF00D, 0x31415926
        ua = Uint32.from_witness(witness_t(ctx, a))
        ub = Uint32.from_witness(witness_t(ctx, b))
        assert (ua & ub).get_value() == a & b
        assert (ua | ub).get_value() == a | b
        assert (ua ^ ub).get_value() == a ^ b
        assert (~ua).get_value() == (~a) & MASK
        for s in (1, 3, 13, 31):
            assert (ua >> s).get_value() == a >> s
            assert (ua << s).get_value() == (a << s) & MASK
            assert ua.ror(s).get_value() == ((a >> s) | (a << (32 - s))) & MASK
            assert ua.rol(s).get_value() == ((a << s) | (a >> (32 - s))) & MASK
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_comparisons(self):
        ctx = StandardComposer()
        ua = Uint32.from_witness(witness_t(ctx, 100))
        ub = Uint32.from_witness(witness_t(ctx, 200))
        assert (ua < ub).get_value()
        assert not (ub < ua).get_value()
        assert (ub > ua).get_value()
        assert (ua <= ub).get_value()
        assert not (ua >= ub).get_value()
        assert ua.eq(Uint32(ctx, value=100)).get_value()
        assert ua.ne(ub).get_value()
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_lazy_carry_chain(self):
        """Long unnormalized addition chains stay mod-2^32 correct."""
        ctx = StandardComposer()
        vals = [0xFFFFFFFF - i * 7 for i in range(50)]
        total = Uint32(ctx, value=0)
        for v in vals:
            total = total + Uint32.from_witness(witness_t(ctx, v))
        assert total.get_value() == sum(vals) & MASK
        assert total.normalize().get_value() == sum(vals) & MASK
        ctx.create_dummy_gates()
        assert ctx.check_circuit()

    def test_prove_and_verify_small_uint32_circuit(self):
        """End-to-end proof over a small uint32 computation."""
        ctx = StandardComposer()
        ua = Uint32.from_witness(witness_t(ctx, 0xAABBCCDD))
        ub = Uint32.from_witness(witness_t(ctx, 0x11223344))
        (ua + ub).normalize()
        ctx.create_dummy_gates()
        assert ctx.check_circuit()
        prover = ctx.preprocess()
        verifier = preprocess(prover)
        proof = prover.construct_proof()
        assert verifier.verify_proof(proof)


# ---------------------------------------------------------------------------
# SHA256 (NIST vectors, test_stdlib_sha256.cpp:89-260)
# ---------------------------------------------------------------------------
NIST_VECTORS = [
    b"abc",
    b"",
    b"abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq",
]


class TestSha256:
    @pytest.mark.parametrize("msg", NIST_VECTORS, ids=["abc", "empty", "two_block"])
    def test_nist_vectors(self, msg):
        ctx = StandardComposer()
        inp = BitArray.from_string(ctx, msg)
        out = sha256(inp)
        assert out.to_bytes() == hashlib.sha256(msg).digest()
        assert ctx.check_circuit()

    def test_tampered_witness_breaks_circuit(self):
        ctx = StandardComposer()
        inp = BitArray.from_string(ctx, b"abc")
        out = sha256(inp)
        # flip one output bit's witness
        idx = out[0].witness_index
        ctx.variables[idx] = 1 - ctx.variables[idx]
        assert not ctx.check_circuit()


# ---------------------------------------------------------------------------
# MiMC (test_stdlib_mimc.cpp:18 consistency between composers)
# ---------------------------------------------------------------------------
class TestMiMC:
    def test_mimc7_standard_composer_matches_host(self):
        ctx = StandardComposer()
        values = [1, 2, 3]
        inputs = [field_t.from_witness(witness_t(ctx, v)) for v in values]
        out = mimc7(inputs)
        assert out.get_value() == mimc7_host(values)
        assert ctx.check_circuit()

    def test_mimc7_composers_agree(self):
        values = [77, 88]
        ctx_s = StandardComposer()
        out_s = mimc7([field_t.from_witness(witness_t(ctx_s, v)) for v in values])
        ctx_m = MiMCComposer()
        out_m = mimc7([field_t.from_witness(witness_t(ctx_m, v)) for v in values])
        assert out_s.get_value() == out_m.get_value() == mimc7_host(values)
        assert ctx_s.check_circuit()
        assert ctx_m.check_circuit()

    def test_mimc_composer_prove_and_verify_cipher(self):
        ctx = MiMCComposer()
        from barretenberg_tpu.stdlib.mimc import mimc_block_cipher

        m = field_t.from_witness(witness_t(ctx, 12345))
        k = field_t.from_witness(witness_t(ctx, 678))
        mimc_block_cipher(m, k)
        ctx.create_dummy_gates()
        assert ctx.check_circuit()
        prover = ctx.preprocess()
        verifier = preprocess(prover)
        proof = prover.construct_proof()
        assert verifier.verify_proof(proof)
