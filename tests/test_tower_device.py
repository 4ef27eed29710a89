"""Device Fq6/Fq12 tower vs the host tower oracle (the reference's
test_fq6/test_fq12 consistency pattern)."""

import random

import pytest

from barretenberg_tpu.fields.quadratic import QuadraticField
from barretenberg_tpu.fields import fq
from barretenberg_tpu.fields.tower import SexticField, TwelfthField
from barretenberg_tpu.pairing import tower as ht

fq2 = QuadraticField(fq)
fq6 = SexticField(fq2)
fq12 = TwelfthField(fq6)

random.seed(42)


def rand_fq2():
    return (random.randrange(ht.P), random.randrange(ht.P))


def rand_fq6():
    return (rand_fq2(), rand_fq2(), rand_fq2())


def rand_fq12():
    return (rand_fq6(), rand_fq6())


N = 4


class TestFq6Device:
    def test_mul_sqr_inv_vs_host(self):
        a = [rand_fq6() for _ in range(N)]
        b = [rand_fq6() for _ in range(N)]
        da, db = fq6.encode(a), fq6.encode(b)
        assert fq6.decode(fq6.mul(da, db)) == [
            ht.fq6_mul(x, y) for x, y in zip(a, b)
        ]
        assert fq6.decode(fq6.sqr(da)) == [ht.fq6_sqr(x) for x in a]
        assert fq6.decode(fq6.invert(da)) == [ht.fq6_inv(x) for x in a]
        assert fq6.decode(fq6.mul_by_nonresidue(da)) == [
            ht.fq6_mul_by_nonresidue(x) for x in a
        ]

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_frobenius_vs_host(self, k):
        a = [rand_fq6() for _ in range(N)]
        assert fq6.decode(fq6.frobenius(fq6.encode(a), k)) == [
            ht.fq6_frobenius(x, k) for x in a
        ]


class TestFq12Device:
    def test_mul_sqr_inv_conj_vs_host(self):
        a = [rand_fq12() for _ in range(N)]
        b = [rand_fq12() for _ in range(N)]
        da, db = fq12.encode(a), fq12.encode(b)
        assert fq12.decode(fq12.mul(da, db)) == [
            ht.fq12_mul(x, y) for x, y in zip(a, b)
        ]
        assert fq12.decode(fq12.sqr(da)) == [ht.fq12_sqr(x) for x in a]
        assert fq12.decode(fq12.invert(da)) == [ht.fq12_inv(x) for x in a]
        assert fq12.decode(fq12.conjugate(da)) == [ht.fq12_conj(x) for x in a]

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_frobenius_vs_host(self, k):
        a = [rand_fq12() for _ in range(N)]
        assert fq12.decode(fq12.frobenius(fq12.encode(a), k)) == [
            ht.fq12_frobenius(x, k) for x in a
        ]

    def test_cyclotomic_sqr_vs_host(self):
        # put elements into the cyclotomic subgroup via the easy part
        raw = [rand_fq12() for _ in range(N)]
        cyc = []
        for f in raw:
            a = ht.fq12_mul(ht.fq12_conj(f), ht.fq12_inv(f))
            cyc.append(ht.fq12_mul(a, ht.fq12_frobenius(a, 2)))
        da = fq12.encode(cyc)
        assert fq12.decode(fq12.cyclotomic_sqr(da)) == [
            ht.fq12_cyclotomic_sqr(x) for x in cyc
        ]

    def test_sparse_mul_vs_host(self):
        a = [rand_fq12() for _ in range(N)]
        lines = [(rand_fq2(), rand_fq2(), rand_fq2()) for _ in range(N)]
        da = fq12.encode(a)
        o = fq2.encode([l[0] for l in lines])
        vw = fq2.encode([l[1] for l in lines])
        vv = fq2.encode([l[2] for l in lines])
        got = fq12.decode(fq12.sparse_mul(da, o, vw, vv))
        want = [
            ht._sparse_mul(x, (lo, lvw, lvv), 1, 1)
            for x, (lo, lvw, lvv) in zip(a, lines)
        ]
        assert got == want
