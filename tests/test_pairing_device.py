"""Device pairing vs the host tower oracle (reference:
test_pairing.cpp:12-100 KAT + bilinearity pattern, on the batched device
Miller loop / microcoded final exponentiation)."""

import pytest

from barretenberg_tpu.pairing import tower as ht
from barretenberg_tpu.utils import host_curve as hc

slow = pytest.mark.slow  # ~8 fq12-op instances: minutes of cold XLA on CPU


@slow
def test_device_pairing_matches_host_oracle():
    from barretenberg_tpu.pairing import device as dp

    p = hc.g1_mul(hc.G1_GENERATOR, 7)
    q = hc.g2_mul(hc.G2_GENERATOR, 11)
    got = dp.reduced_ate_pairing(p, q)
    want = ht.reduced_ate_pairing_batch([(p, q)])
    assert got == want


@slow
def test_device_pairing_bilinearity_and_groups():
    from barretenberg_tpu.pairing import device as dp

    a, b = 6, 13
    pa = hc.g1_mul(hc.G1_GENERATOR, a)
    qb = hc.g2_mul(hc.G2_GENERATOR, b)
    pab = hc.g1_mul(hc.G1_GENERATOR, a * b)
    # e(aP, bQ) * e(-abP, Q) == 1, checked as one device group; plus an
    # unrelated group that must NOT be one - both in the same lane sweep
    groups = [
        [(pa, qb), (hc.g1_neg(pab), hc.G2_GENERATOR)],
        [(pa, qb), (pab, hc.G2_GENERATOR)],
    ]
    res = dp.pairing_check_groups(groups)
    assert res == [True, False]


@slow
def test_validate_srs_device():
    from barretenberg_tpu.pairing import device as dp
    from barretenberg_tpu.srs import test_srs

    srs = test_srs(8)
    assert dp.validate_srs_device(srs)
    # corrupt one monomial -> the batched check must fail
    bad = test_srs(8)
    pts = bad.monomials_host()
    pts[3] = hc.g1_mul(hc.G1_GENERATOR, 999)

    class FakeSRS:
        degree = 8
        g2_x = bad.g2_x

        def monomials_host(self):
            return pts

    assert not dp.validate_srs_device(FakeSRS())
