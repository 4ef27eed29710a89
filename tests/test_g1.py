"""G1 group law tests (reference: test/test_g1.cpp).

KATs apply the reference's exact rational maps to arbitrary limb inputs and
compare projectively, pinning our formulas to the reference's
(dbl-2009-l / add-2007-bl / madd-2007-bl schedules, groups/group.hpp:153-448).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from barretenberg_tpu.fields import fq, fr
from barretenberg_tpu.fields.limbs import u64x4_to_int
from barretenberg_tpu.groups import AffinePoints, JacobianPoints, g1
from barretenberg_tpu.groups.g1 import (
    jacobian_to_host,
    points_to_host,
    random_affine_points,
    scalar_mul,
)
from barretenberg_tpu.utils import host_curve


def u64(*limbs):
    return u64x4_to_int(limbs)


def jac(x, y, z):
    return JacobianPoints(
        fq.encode([x]), fq.encode([y]), fq.encode([z]), jnp.zeros(1, dtype=bool)
    )


def aff(x, y):
    return AffinePoints(fq.encode([x]), fq.encode([y]), jnp.zeros(1, dtype=bool))


def rand_jac(n, seed=0):
    """Random on-curve Jacobian points with non-trivial z."""
    rng = np.random.default_rng(seed)
    a = random_affine_points(n, rng)
    p = g1.to_jacobian(a)
    # scale z to exercise projective paths: (x*t^2, y*t^3, t)
    t = fq.random_elements(n, rng)
    t2 = fq.sqr(t)
    return JacobianPoints(
        fq.mul(p.x, t2), fq.mul(p.y, fq.mul(t, t2)), fq.mul(p.z, t), p.inf
    )


class TestKats:
    def test_mixed_add_check_against_constants(self):
        lhs = jac(
            u64(0x92716CAA6CAC6D26, 0x1E6E234136736544, 0x1BB04588CDE00AF0, 0x09A2AC922D97E6F5),
            u64(0x9E693AEB52D79D2D, 0xF0C1895A61E5E975, 0x18CD7F5310CED70F, 0x0AC67920A22939AD),
            u64(0xFEF593C9CE1DF132, 0xE0486F801303C27D, 0x9BBD01AB881DC08E, 0x2A589BADF38EC0F9),
        )
        rhs = aff(
            u64(0xA1EC5D1398660DB8, 0x6BE3E1F6FD5D8AB1, 0x69173397DD272E11, 0x12575BBFE1198886),
            u64(0xCFBFD4441138823E, 0xB5F817E28A1EF904, 0xEFB7C5629DCC1C42, 0x1A9ED3D6F846230E),
        )
        expected = jac(
            u64(0x02A9D0201FCCCA20, 0x36F969B294F31776, 0x0EE5534422A6F646, 0x0911DBC6B02310B6),
            u64(0x14C30AAEB4F135EF, 0x9C27C128EA2017A1, 0xF9B7D80C8315EABF, 0x035E628DF8ADD760),
            u64(0xA43FE96673D10EB3, 0x88FBE6351753D410, 0x045C21CC9D99CB7D, 0x3018020AA6E9EDE5),
        )
        result = jax.jit(g1.mixed_add)(lhs, rhs)
        assert bool(g1.eq(result, expected)[0])

    def test_dbl_check_against_constants(self):
        lhs = jac(
            u64(0x8D1703AA518D827F, 0xD19CC40779F54F63, 0xABC11CE30D02728C, 0x10938940DE3CBEEC),
            u64(0xCF1798994F1258B4, 0x36307A354AD90A25, 0xCD84ADB348C63007, 0x06266B85241AFF3F),
            u64(0xE213E18FD2DF7044, 0xB2F42355982C5BC8, 0xF65CF5150A3A9DA1, 0x0C43BDE08B03ACA2),
        )
        expected = jac(
            u64(0xD5C6473044B2E67C, 0x89B185EA20951F3A, 0x4AC597219CF47467, 0x2D00482F63B12C86),
            u64(0x4E7E6C06A87E4314, 0x906A877A71735161, 0xAA7B9893CC370D39, 0x062F206BEF795A05),
            u64(0x8813BDCA7B0B115A, 0x929104DFFDFABD22, 0x3FFF575136879112, 0x18A299C1F683BDCA),
        )
        d = jax.jit(g1.dbl)
        result = d(d(d(lhs)))
        assert bool(g1.eq(result, expected)[0])

    def test_add_check_against_constants(self):
        lhs = jac(
            u64(0x184B38AFC6E2E09A, 0x4965CD1C3687F635, 0x334DA8E7539E71C4, 0x00F708D16CFE6E14),
            u64(0x2A6FF6FFC739B3B6, 0x070761D618B513B9, 0xBF1645401DE26BA1, 0x114A1616C164B980),
            u64(0x10143ADE26BBD57A, 0x98CF4E1F6C214053, 0x6BFDC534F6B00006, 0x1875E5068ABABF2C),
        )
        rhs = jac(
            u64(0xAFDB8A15C98BF74C, 0xAC54DF622A8D991A, 0xC6E5AE1F3DAD4EC8, 0x1BD3FB4A59E19B52),
            u64(0x21B3BB529BEC20C0, 0xAABD496406FFB8C1, 0xCD3526C26AC5BDCB, 0x187ADA6B8693C184),
            u64(0xFFCD440A228ED652, 0x8A795C8F234145F1, 0xD5279CDBABB05B95, 0x0BDF19BA16FC607A),
        )
        expected = jac(
            u64(0x18764DA36AA4CD81, 0xD15388D1FEA9F3D3, 0xEB7C437DE4BBD748, 0x2F09B712ADF6F18F),
            u64(0x50C5F3CAB191498C, 0xE50AA3CE802EA3B5, 0xD9D6125B82EBEFF8, 0x27E91BA0686E54FE),
            u64(0x0E4B81EF75FEDF95, 0xF608EDEF14913C75, 0xFD9E178143224C96, 0x0A8AE44990C8ACCD),
        )
        result = jax.jit(g1.add)(lhs, rhs)
        assert bool(g1.eq(result, expected)[0])

    def test_group_exponentiation_check_against_constants(self):
        a = u64(0xB67299B792199CF0, 0xC1DA7DF1E7E12768, 0x692E427911532EDF, 0x13DD85E87DC89978)
        expected = aff(
            u64(0x9BF840FAF1B4BA00, 0xE81B7260D068E663, 0x7610C9A658D2C443, 0x278307CD3D0CDDB0),
            u64(0x0F6ED5FB779EBECB, 0x414CA771ACBE183C, 0xE3692CB56DFBDB67, 0x03D3C5ED19B080A3),
        )
        result = scalar_mul(g1.generator((1,)), a)
        assert bool(g1.eq(result, g1.to_jacobian(expected))[0])


class TestExceptions:
    def test_add_infinity_cases(self):
        p = rand_jac(4, seed=1)
        result = g1.add(p, g1.neg(p))
        assert bool(result.inf.all())
        inf = g1.infinity((4,))
        assert bool(g1.eq(g1.add(p, inf), p).all())
        assert bool(g1.eq(g1.add(inf, p), p).all())
        assert bool(g1.add(inf, inf).inf.all())

    def test_add_dbl_when_equal(self):
        p = rand_jac(4, seed=2)
        assert bool(g1.eq(g1.add(p, p), g1.dbl(p)).all())

    def test_mixed_add_exceptions(self):
        rng = np.random.default_rng(3)
        a = random_affine_points(4, rng)
        j = g1.to_jacobian(a)
        # P + (-P) = infinity
        assert bool(g1.mixed_add(g1.neg(j), a).inf.all())
        # infinity + Q = Q
        inf = g1.infinity((4,))
        assert bool(g1.eq(g1.mixed_add(inf, a), j).all())
        # P + P = dbl
        assert bool(g1.eq(g1.mixed_add(j, a), g1.dbl(j)).all())
        # jacobian-z path consistency: add == mixed_add
        p = rand_jac(4, seed=4)
        assert bool(g1.eq(g1.mixed_add(p, a), g1.add(p, g1.to_jacobian(a))).all())

    def test_add_dbl_consistency(self):
        # (a+b) + (a-b) == 2a  (test_g1.cpp:165)
        a = rand_jac(4, seed=5)
        b = rand_jac(4, seed=6)
        c = g1.add(a, b)
        d = g1.add(a, g1.neg(b))
        assert bool(g1.eq(g1.add(c, d), g1.dbl(a)).all())


class TestNormalizeAndOracle:
    def test_batch_normalize(self):
        p = rand_jac(8, seed=7)
        n = g1.batch_normalize(p)
        f = fq
        zz = f.sqr(p.z)
        assert bool(f.eq(f.mul(n.x, zz), p.x).all())
        assert bool(f.eq(f.mul(n.y, f.mul(p.z, zz)), p.y).all())
        assert bool(g1.on_curve_affine(n).all())

    def test_vs_host_oracle(self):
        rng = np.random.default_rng(8)
        a = random_affine_points(6, rng)
        b = random_affine_points(6, rng)
        dev = jacobian_to_host(g1.add(g1.to_jacobian(a), g1.to_jacobian(b)))
        ah, bh = points_to_host(a), points_to_host(b)
        host = [host_curve.g1_add(x, y) for x, y in zip(ah, bh)]
        assert dev == host

    def test_scalar_mul_oracle_and_edges(self):
        gpt = g1.generator((1,))
        assert bool(scalar_mul(gpt, 0).inf.all())
        assert bool(g1.eq(scalar_mul(gpt, 1), g1.to_jacobian(gpt))[0])
        k = 0x1234567890ABCDEF1234567890ABCDEF
        dev = jacobian_to_host(scalar_mul(gpt, k))[0]
        assert dev == host_curve.g1_mul(host_curve.G1_GENERATOR, k)


class TestWindowedScalarMul:
    """Arbitrary-base GLV + signed-window scalar multiplication vs the
    double-and-add oracle (reference group_exponentiation_endo,
    groups/group.hpp:653-760)."""

    def test_windowed_and_glv_vs_oracle(self):
        from barretenberg_tpu.fields import fr
        from barretenberg_tpu.groups.g1 import scalar_mul_glv, scalars_to_bits_msb

        rng = np.random.default_rng(17)
        pts = random_affine_points(4, rng)
        svals = [0, 1, fr.p - 1,
                 int.from_bytes(rng.bytes(32), "little") % fr.p]
        s = fr.encode(svals)
        oracle = jacobian_to_host(g1.scalar_mul_bits(pts, scalars_to_bits_msb(svals)))
        assert jacobian_to_host(g1.scalar_mul_windowed(pts, s, c=5)) == oracle
        assert jacobian_to_host(scalar_mul_glv(pts, s, c=5)) == oracle

    def test_glv_infinity_base(self):
        from barretenberg_tpu.fields import fr
        from barretenberg_tpu.groups.g1 import scalar_mul_glv

        r = scalar_mul_glv(g1.affine_infinity((2,)), fr.encode([5, 7]))
        assert bool(r.inf.all())


class TestHashToCurve:
    """Device hash-to-curve (reference groups/group.hpp:49-71 rejection
    walk + can_hash_to_curve, g1.hpp:12)."""

    def test_on_curve_and_deterministic(self):
        from barretenberg_tpu.groups.g1 import hash_to_curve
        from barretenberg_tpu.utils import host_curve

        pts = hash_to_curve(b"kat-seed", 16, attempts=4)
        xs, ys = fq.decode(pts.x), fq.decode(pts.y)
        assert all(host_curve.g1_is_on_curve(p) for p in zip(xs, ys))
        again = hash_to_curve(b"kat-seed", 16, attempts=4)
        assert fq.decode(again.x) == xs and fq.decode(again.y) == ys

    def test_matches_host_rejection_walk(self):
        # KAT pinned from the host bigint walk (keccak candidates, first
        # QR x, y = (x^3+3)^((q+1)/4))
        from barretenberg_tpu.groups.g1 import hash_to_curve

        pts = hash_to_curve(b"kat-seed", 1)
        assert fq.decode(pts.x)[0] == (
            0x2C18C36213674232FA0639643913CD5DFF4D3F08C434432DB4D11BCE58BDDDBA
        )
        assert fq.decode(pts.y)[0] == (
            0x0AD722A88ED54726ECAE4398297497A01F004BB90EE73ED7960345A221DDBD73
        )
