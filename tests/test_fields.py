"""Field arithmetic tests.

Ports the reference's KATs and consistency suites (reference:
test/test_fq.cpp, test/test_fr.cpp) onto the TPU limb representation. The
hardcoded limb constants pin the external R=2^256 Montgomery representation
bit-exactly.
"""

import jax
import numpy as np
import pytest

from barretenberg_tpu.fields import fq, fr
from barretenberg_tpu.fields.glv import split_into_endomorphism_scalars
from barretenberg_tpu.fields.limbs import u64x4_to_int
from barretenberg_tpu.fields.params import R_EXTERNAL

from helpers import random_values


def u64(*limbs):
    return u64x4_to_int(limbs)


@pytest.fixture(scope="module", params=["fq", "fr"])
def F(request):
    return {"fq": fq, "fr": fr}[request.param]


class TestAgainstPython:
    """Random-input oracle tests vs Python int arithmetic."""

    N = 32

    def test_add_sub_neg_mul(self, F):
        p = F.p
        a = random_values(F, self.N, seed=7)
        b = random_values(F, self.N, seed=8)
        A, B = F.encode(a), F.encode(b)
        assert F.decode(jax.jit(F.add)(A, B)) == [(x + y) % p for x, y in zip(a, b)]
        assert F.decode(jax.jit(F.sub)(A, B)) == [(x - y) % p for x, y in zip(a, b)]
        assert F.decode(jax.jit(F.neg)(A)) == [(-x) % p for x in a]
        assert F.decode(jax.jit(F.mont_mul)(A, B)) == [
            (x * y) % p for x, y in zip(a, b)
        ]

    def test_edge_values(self, F):
        p = F.p
        a = [0, 1, p - 1, p - 2, 2, (p - 1) // 2]
        b = [p - 1, p - 1, p - 1, 1, 0, 2]
        A, B = F.encode(a), F.encode(b)
        assert F.decode(F.add(A, B)) == [(x + y) % p for x, y in zip(a, b)]
        assert F.decode(F.sub(A, B)) == [(x - y) % p for x, y in zip(a, b)]
        assert F.decode(F.mont_mul(A, B)) == [(x * y) % p for x, y in zip(a, b)]
        assert F.decode(F.neg(A)) == [(-x) % p for x in a]

    def test_invert_and_batch(self, F):
        p = F.p
        a = random_values(F, 16, seed=9)
        A = F.encode(a)
        assert F.decode(jax.jit(F.invert)(A)) == [pow(x, -1, p) for x in a]
        assert F.decode(jax.jit(F.batch_invert)(A)) == [pow(x, -1, p) for x in a]

    def test_sqrt(self, F):
        p = F.p
        squares = [x * x % p for x in random_values(F, 8, seed=10)]
        if p % 4 == 3:
            roots = F.decode(jax.jit(F.sqrt)(F.encode(squares)))
            for s, r in zip(squares, roots):
                assert r * r % p == s
        for s in squares:
            r = F.sqrt_host(s)
            assert r is not None and r * r % p == s
        # non-residue detection
        g = 5 if p % 4 == 1 else 3
        if pow(g, (p - 1) // 2, p) != 1:
            assert F.sqrt_host(g) is None

    def test_pow_static(self, F):
        p = F.p
        a = random_values(F, 4, seed=11)
        e = 0xDEADBEEF12345
        out = F.decode(jax.jit(lambda x: F.pow_static(x, e))(F.encode(a)))
        assert out == [pow(x, e, p) for x in a]


class TestFqKats:
    """Known-answer vectors (test_fq.cpp:51-140)."""

    def mont(self, F, vals):
        return F.encode_montgomery(vals)

    def test_mul_check_against_constants(self):
        a = u64(0x2523B6FA3956F038, 0x158AA08ECDD9EC1D, 0xF48216A4C74738D4, 0x2514CC93D6F0A1BF)
        b = u64(0xB68AEE5E4C8FC17C, 0xC5193DE7F401D5E8, 0xB8777D4DDE671DB3, 0x0E513E75C087B0BB)
        exp = u64(0x7ED4174114B521C4, 0x58F5BD1D4279FDC2, 0x6A73AC09EE843D41, 0x0687A76AE9B3425C)
        r = fq.decode_montgomery(fq.mont_mul(self.mont(fq, [a]), self.mont(fq, [b])))
        assert r == [exp]

    def test_mul_short_integers(self):
        exp = u64(0x65991A6DC2F3A183, 0xE3BA1F83394A2D08, 0x8401DF65A169DB3F, 0x1727099643607BBA)
        r = fq.decode_montgomery(fq.mont_mul(self.mont(fq, [0xA]), self.mont(fq, [0xB])))
        assert r == [exp]

    def test_sqr_check_against_constants(self):
        a = u64(0x329596AA978981E8, 0x8542E6E254C2A5D0, 0xC5B687D82EADB178, 0x2D242AAF48F56B8A)
        exp = u64(0xBF4FB34E120B8B12, 0xF64D70EFBF848328, 0xEFBB6A533F2E7D89, 0x1DE50F941425E4AA)
        assert fq.decode_montgomery(fq.sqr(self.mont(fq, [a]))) == [exp]

    def test_add_check_against_constants(self):
        a = u64(0x7D2E20E82F73D3E8, 0x8E50616A7A9D419D, 0xCDC833531508914B, 0x00D510253A2CE62C)
        b = u64(0x2829438B071FD14E, 0x0B03EF3F9FF9274E, 0x605B671F6DC7B209, 0x008701F9D971FBC9)
        exp = u64(0xA55764733693A536, 0x995450AA1A9668EB, 0x2E239A7282D04354, 0x015C121F139EE1F6)
        assert fq.decode_montgomery(fq.add(self.mont(fq, [a]), self.mont(fq, [b]))) == [exp]

    def test_sub_check_against_constants(self):
        a = u64(0xD68D01812313FB7C, 0x2965D7AE7C6070A5, 0x08EF9AF6D6BA9A48, 0x0CB8FE2108914F53)
        b = u64(0x2CD2A2A37E9BF14A, 0xEBC86EF589C530F6, 0x75124885B362B8FE, 0x1394324205C7A41D)
        exp = u64(0xE5DAEAF47CF50779, 0xD51ED34A5B0D0A3C, 0x4C2D9827A4D939A6, 0x29891A51E3FB4B5F)
        assert fq.decode_montgomery(fq.sub(self.mont(fq, [a]), self.mont(fq, [b]))) == [exp]

    def test_to_from_montgomery(self):
        one_mont = u64(0xD35D438DC58F0D9D, 0x0A78EB28F5C70B3D, 0x666EA36F7879462C, 0x0E0A77C19A07DF2F)
        assert fq.params.r_ext == one_mont  # fq.hpp:33-36
        r = fq.decode_montgomery(fq.to_montgomery_form(self.mont(fq, [1])))
        assert r == [one_mont]
        r = fq.decode_montgomery(fq.from_montgomery_form(self.mont(fq, [one_mont])))
        assert r == [1]

    def test_beta_cube_root(self):
        # beta^3 = 1 and beta != 1 (test_fq.cpp:222)
        beta = fq.params.cube_root
        assert beta != 1 and pow(beta, 3, fq.p) == 1
        beta_mont = u64(0x71930C11D782E155, 0xA6BB947CFFBE3323, 0xAA303344D4741444, 0x2C3B3F0D26594943)
        assert beta * R_EXTERNAL % fq.p == beta_mont  # fq.hpp:53-56


class TestFrKats:
    def test_header_constants(self):
        # fr.hpp:33-36, :54-57, :60-63, :66-79
        assert fr.params.r_ext == u64(0xAC96341C4FFFFFFB, 0x36FC76959F60CD29, 0x666EA36F7879462E, 0x0E0A77C19A07DF2F)
        assert fr.params.cube_root * R_EXTERNAL % fr.p == u64(
            0x93E7CEDE4A0329B3, 0x7D4FDCA77A96C167, 0x8BE4BA08B19A750A, 0x1CBD5653A5661C25)
        assert fr.params.primitive_root * R_EXTERNAL % fr.p == u64(
            0x636E735580D13D9C, 0xA22BF3742445FFD6, 0x56452AC01EB203D8, 0x1860EF942963F9E7)
        assert 5 * R_EXTERNAL % fr.p == u64(
            0x1B0D0EF99FFFFFE6, 0xEABA68A3A32A913F, 0x47D8EB76D8DD0689, 0x15D0085520F5BBC3)
        assert pow(5, -1, fr.p) * R_EXTERNAL % fr.p == u64(
            0xD745397409999999, 0xB4ADA7D483C3EFA8, 0xC49CA2F8E57F3161, 0x162A3754AC156CB3)

    def test_root_of_unity(self):
        w = fr.get_root_of_unity(28)
        assert pow(w, 1 << 28, fr.p) == 1
        assert pow(w, 1 << 27, fr.p) != 1
        for k in (2, 8, 16):
            wk = fr.get_root_of_unity(k)
            assert pow(wk, 1 << k, fr.p) == 1
            assert pow(wk, 1 << (k - 1), fr.p) != 1

    def test_lambda_is_cube_root(self):
        lam = fr.params.cube_root
        assert lam != 1 and pow(lam, 3, fr.p) == 1

    def test_split_into_endomorphism_scalars(self):
        # reference test_fr.cpp:239-296: k1 - k2*lambda == k mod r
        lam = fr.params.cube_root
        for k in random_values(fr, 20, seed=42) + [1, 0, fr.p - 1]:
            k1, k2 = split_into_endomorphism_scalars(k)
            assert k1 < (1 << 128) and k2 < (1 << 128)
            assert (k1 - k2 * lam) % fr.p == k % fr.p


class TestConsistency:
    """mul/sqr and add/mul consistency (test_fq.cpp:85,188)."""

    def test_mul_sqr_consistency(self, F):
        a, b = random_values(F, 8, seed=3), random_values(F, 8, seed=4)
        A, B = F.encode(a), F.encode(b)
        lhs = F.mont_mul(F.sub(A, B), F.add(A, B))
        rhs = F.sub(F.sqr(A), F.sqr(B))
        assert F.decode(lhs) == F.decode(rhs)

    def test_add_mul_consistency(self, F):
        a = random_values(F, 8, seed=5)
        A = F.encode(a)
        r = F.add(A, A)
        r = F.add(r, r)
        r = F.add(r, r)
        r = F.add(r, A)
        assert F.decode(r) == F.decode(F.mont_mul(A, F.full(A.shape[1:], F.const(9))))


class TestTpuRowProductBranch:
    """The TPU-only row-accumulation formulation of the wide limb product
    (the v5e miscompile workaround gating all >= 2^13 batches,
    montgomery.py::_wide_product_cols) must stay equivalent to the skew
    formulation the CPU suite normally exercises. Forcing the backend
    probe to report 'tpu' (with Pallas disabled) runs the row branch on
    CPU so a regression there cannot ship silently."""

    def test_row_formulation_matches_skew(self, monkeypatch):
        from barretenberg_tpu import config

        rng = np.random.default_rng(77)
        n = 1 << 13  # at/above the row-dispatch threshold
        a = fr.random_elements(n, rng)
        b = fr.random_elements(n, rng)
        expect = np.asarray(fr.mont_mul(a, b))  # skew path (cpu, no pallas)
        expect_scalar = np.asarray(fr.mont_mul(a, fr.encode([12345])))

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        config.set_use_pallas(False)
        try:
            got = np.asarray(fr.mont_mul(a, b))  # row-accumulation path
            got_scalar = np.asarray(fr.mont_mul(a, fr.encode([12345])))
        finally:
            config.set_use_pallas(None)
        np.testing.assert_array_equal(got, expect)
        np.testing.assert_array_equal(got_scalar, expect_scalar)
