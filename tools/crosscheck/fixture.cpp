// Cross-implementation bit-exactness fixture.
//
// Builds the SAME deterministic satisfiable PLONK circuit as
// tools/crosscheck/run_crosscheck.py (a splitmix64-seeded variant of the
// reference's test_prover.cpp:73-162 fixture), runs the REFERENCE C++
// prover (portable int128 path, -DDISABLE_SHENANIGANS), and prints the
// proof serialized exactly as barretenberg_tpu's Proof.serialize():
// 9 commitments (x, y) + 7 Fr evaluations, each 32 bytes as 4 u64 words
// LSW-first / per-word big-endian (the keccak.c:112-135 layout).
//
// The Python side generates the transcript.dat this binary consumes
// (BARRETENBERG_SRS_PATH is injected at compile time), builds its own
// proof over the identical circuit, and compares the bytes.

#include <cstdint>
#include <cstdio>
#include <cstdlib>

#include "barretenberg/waffle/proof_system/prover/prover.hpp"
#include "barretenberg/waffle/proof_system/widgets/arithmetic_widget.hpp"
#include "barretenberg/waffle/proof_system/widgets/bool_widget.hpp"

using namespace barretenberg;

namespace {

uint64_t splitmix_state = 0x5EED5EED5EED5EEDULL;

uint64_t splitmix64()
{
    uint64_t z = (splitmix_state += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

// deterministic field value < 2^253 < r, in Montgomery form
fr::field_t det_element()
{
    fr::field_t raw;
    raw.data[0] = splitmix64();
    raw.data[1] = splitmix64();
    raw.data[2] = splitmix64();
    raw.data[3] = splitmix64() & 0x1FFFFFFFFFFFFFFFULL;
    return fr::to_montgomery_form(raw);
}

void print_words(const uint64_t* data)
{
    for (int j = 0; j < 4; ++j) {
        for (int b = 7; b >= 0; --b) {
            printf("%02x", (unsigned)((data[j] >> (8 * b)) & 0xFF));
        }
    }
}

void print_fq(const fq::field_t& mont)
{
    fq::field_t plain = fq::from_montgomery_form(mont);
    print_words(plain.data);
}

void print_fr(const fr::field_t& mont)
{
    fr::field_t plain = fr::from_montgomery_form(mont);
    print_words(plain.data);
}

void print_point(const g1::affine_element& pt)
{
    print_fq(pt.x);
    print_fq(pt.y);
}

} // namespace

int main(int argc, char** argv)
{
    // argv: [n] [with_bool01] - defaults keep the original n=16 fixture
    const size_t n = argc > 1 ? (size_t)atoi(argv[1]) : 16;
    const bool with_bool = argc > 2 && atoi(argv[2]) != 0;
    waffle::Prover state(n);
    auto widget = std::make_unique<waffle::ProverArithmeticWidget>(n);

    state.w_l.resize(n);
    state.w_r.resize(n);
    state.w_o.resize(n);

    fr::field_t T0;
    for (size_t i = 0; i < n / 4; ++i) {
        // even gates: w_o = w_l*w_r + w_l + w_r + 1
        state.w_l.at(2 * i) = det_element();
        state.w_r.at(2 * i) = det_element();
        fr::__mul(state.w_l.at(2 * i), state.w_r.at(2 * i), state.w_o.at(2 * i));
        fr::__add(state.w_o[2 * i], state.w_l[2 * i], state.w_o[2 * i]);
        fr::__add(state.w_o[2 * i], state.w_r[2 * i], state.w_o[2 * i]);
        fr::__add(state.w_o[2 * i], fr::one, state.w_o[2 * i]);
        fr::__copy(fr::one, widget->q_l.at(2 * i));
        fr::__copy(fr::one, widget->q_r.at(2 * i));
        fr::__copy(fr::neg_one(), widget->q_o.at(2 * i));
        fr::__copy(fr::one, widget->q_c.at(2 * i));
        fr::__copy(fr::one, widget->q_m.at(2 * i));

        // odd gates: q_c = -(w_l + w_r + w_o)
        state.w_l.at(2 * i + 1) = det_element();
        state.w_r.at(2 * i + 1) = det_element();
        state.w_o.at(2 * i + 1) = det_element();
        fr::__add(state.w_l.at(2 * i + 1), state.w_r.at(2 * i + 1), T0);
        fr::__add(T0, state.w_o.at(2 * i + 1), widget->q_c.at(2 * i + 1));
        fr::__neg(widget->q_c.at(2 * i + 1), widget->q_c.at(2 * i + 1));
        widget->q_l.at(2 * i + 1) = fr::one;
        widget->q_r.at(2 * i + 1) = fr::one;
        widget->q_o.at(2 * i + 1) = fr::one;
        widget->q_m.at(2 * i + 1) = fr::zero;
    }
    const size_t shift = n / 2;
    for (size_t i = 0; i < shift; ++i) {
        fr::__copy(state.w_l[i], state.w_l[shift + i]);
        fr::__copy(state.w_r[i], state.w_r[shift + i]);
        fr::__copy(state.w_o[i], state.w_o[shift + i]);
        fr::__copy(widget->q_m[i], widget->q_m[shift + i]);
        fr::__copy(widget->q_l[i], widget->q_l[shift + i]);
        fr::__copy(widget->q_r[i], widget->q_r[shift + i]);
        fr::__copy(widget->q_o[i], widget->q_o[shift + i]);
        fr::__copy(widget->q_c[i], widget->q_c[shift + i]);
    }

    state.sigma_1_mapping.resize(n);
    state.sigma_2_mapping.resize(n);
    state.sigma_3_mapping.resize(n);
    for (size_t i = 0; i < shift; ++i) {
        state.sigma_1_mapping[shift + i] = (uint32_t)i;
        state.sigma_2_mapping[shift + i] = (uint32_t)i + (1U << 30U);
        state.sigma_3_mapping[shift + i] = (uint32_t)i + (1U << 31U);
        state.sigma_1_mapping[i] = (uint32_t)(i + shift);
        state.sigma_2_mapping[i] = (uint32_t)(i + shift) + (1U << 30U);
        state.sigma_3_mapping[i] = (uint32_t)(i + shift) + (1U << 31U);
    }
    for (size_t j : { shift - 1, n - 1 }) {
        state.sigma_1_mapping[j] = (uint32_t)j;
        state.sigma_2_mapping[j] = (uint32_t)j + (1U << 30U);
        state.sigma_3_mapping[j] = (uint32_t)j + (1U << 31U);
        state.w_l.at(j) = fr::zero;
        state.w_r.at(j) = fr::zero;
        state.w_o.at(j) = fr::zero;
        fr::__copy(fr::zero, widget->q_c.at(j));
    }
    fr::__copy(fr::zero, widget->q_l.at(n - 1));
    fr::__copy(fr::zero, widget->q_r.at(n - 1));
    fr::__copy(fr::zero, widget->q_o.at(n - 1));
    fr::__copy(fr::zero, widget->q_m.at(n - 1));

    state.widgets.emplace_back(std::move(widget));

    if (with_bool) {
        // deterministic booleanity selectors (twin of run_crosscheck.py);
        // the byte-for-byte proof comparison does not require the circuit
        // to be satisfiable, only that both provers see identical inputs
        auto bool_widget = std::make_unique<waffle::ProverBoolWidget>(n);
        for (size_t i = 0; i < n; ++i) {
            bool_widget->q_bl.at(i) = (i % 3 == 0) ? fr::one : fr::zero;
            bool_widget->q_br.at(i) = (i % 5 == 0) ? fr::one : fr::zero;
            bool_widget->q_bo.at(i) = (i % 7 == 0) ? fr::one : fr::zero;
        }
        state.widgets.emplace_back(std::move(bool_widget));
    }

    waffle::plonk_proof proof = state.construct_proof();

    print_point(proof.W_L);
    print_point(proof.W_R);
    print_point(proof.W_O);
    print_point(proof.Z_1);
    print_point(proof.T_LO);
    print_point(proof.T_MID);
    print_point(proof.T_HI);
    print_point(proof.PI_Z);
    print_point(proof.PI_Z_OMEGA);
    print_fr(proof.w_l_eval);
    print_fr(proof.w_r_eval);
    print_fr(proof.w_o_eval);
    print_fr(proof.sigma_1_eval);
    print_fr(proof.sigma_2_eval);
    print_fr(proof.z_1_shifted_eval);
    print_fr(proof.linear_eval);
    printf("\n");
    return 0;
}
