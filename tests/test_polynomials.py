"""FFT + polynomial arithmetic vs Python oracle (reference:
test/test_polynomial_arithmetic.cpp round-trip/cross-check pattern)."""

import numpy as np
import pytest

from barretenberg_tpu.fields import fr
from barretenberg_tpu.polynomials import arithmetic as PA
from barretenberg_tpu.polynomials import fft as F
from barretenberg_tpu.polynomials import get_domain

N = 16


def poly_eval(cs, x):
    acc = 0
    for c in reversed(cs):
        acc = (acc * x + c) % fr.p
    return acc


@pytest.fixture(scope="module")
def coeffs():
    rng = np.random.default_rng(5)
    return [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]


@pytest.fixture(scope="module")
def dom():
    return get_domain(N)


def test_fft_matches_dft_oracle(coeffs, dom):
    expected = [poly_eval(coeffs, pow(dom.root, i, fr.p)) for i in range(N)]
    assert fr.decode(F.fft(fr.encode(coeffs), dom)) == expected


def test_ifft_round_trip(coeffs, dom):
    C = fr.encode(coeffs)
    assert fr.decode(F.ifft(F.fft(C, dom), dom)) == coeffs


def test_coset_fft_and_round_trip(coeffs, dom):
    C = fr.encode(coeffs)
    g = dom.generator
    expected = [poly_eval(coeffs, g * pow(dom.root, i, fr.p) % fr.p) for i in range(N)]
    assert fr.decode(F.coset_fft(C, dom)) == expected
    assert fr.decode(F.coset_ifft(F.coset_fft(C, dom), dom)) == coeffs


def test_evaluate(coeffs):
    z = 0x1234567DEADBEEF
    assert PA.evaluate(fr.encode(coeffs), z) == poly_eval(coeffs, z)


def test_kate_opening_coefficients(coeffs):
    z = 0x1234567DEADBEEF
    W, fz = PA.compute_kate_opening_coefficients(fr.encode(coeffs), z)
    Wv = fr.decode(W)
    assert fz == poly_eval(coeffs, z)
    x = 0xABCDEF987  # W(x)*(x-z) + f(z) == P(x)
    assert (poly_eval(Wv, x) * ((x - z) % fr.p) + fz) % fr.p == poly_eval(coeffs, x)


def test_lagrange_evaluations(dom):
    z = 0x987654321
    le = PA.get_lagrange_evaluations(z, dom)
    p = fr.p
    num = (pow(z, N, p) - 1) % p
    assert le.vanishing_poly == num * pow((z - dom.root_inverse) % p, -1, p) % p
    assert le.l_1 == num * pow(N * (z - 1) % p, -1, p) % p
    assert le.l_n_minus_1 == num * pow(N * (z * dom.root * dom.root - 1) % p, -1, p) % p


def test_lagrange_polynomial_fft(dom):
    dom2 = get_domain(2 * N)
    vals = fr.decode(PA.compute_lagrange_polynomial_fft(dom, dom2))
    g, p = dom.generator, fr.p
    for i in range(2 * N):
        X = g * pow(dom2.root, i, p) % p
        assert vals[i] == (pow(X, N, p) - 1) * pow(N * (X - 1) % p, -1, p) % p


def test_divide_by_pseudo_vanishing_polynomial(dom):
    rng = np.random.default_rng(6)
    qv = [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]
    dom4 = get_domain(4 * N)
    g, p = dom.generator, fr.p
    tv, exp = [], []
    for i in range(4 * N):
        X = g * pow(dom4.root, i, p) % p
        zh = (pow(X, N, p) - 1) * pow((X - pow(dom.root, N - 1, p)) % p, -1, p) % p
        q = poly_eval(qv, X)
        tv.append(zh * q % p)
        exp.append(q)
    out = fr.decode(
        PA.divide_by_pseudo_vanishing_polynomial(fr.encode(tv), dom, dom4)
    )
    assert out == exp


def test_bailey_fft_matches_stage_loop():
    """Two-level Bailey core (TPU path, kernels/butterfly.py in interpret
    mode) vs the single-level stage loop, both directions, at the minimum
    Bailey size 2^14."""
    import jax.numpy as jnp

    from barretenberg_tpu import config

    n = 1 << 14
    domb = get_domain(n)
    rng = np.random.default_rng(11)
    x = fr.random_elements(n, rng)
    old_interp = config.pallas_interpret()
    config.set_pallas_interpret(True)
    try:
        for inverse in (False, True):
            domb.warm_tables(inverse=inverse)
            tbl = domb.inverse_twiddles if inverse else domb.twiddles
            xb = jnp.take(x, domb.bit_reverse_indices, axis=1)
            ref = F.fft_stages(xb, tbl, domb.log2_size)
            got = F._bailey_core(x, domb, inverse=inverse)
            assert bool(jnp.all(ref == got))
    finally:
        config.set_pallas_interpret(old_interp)
