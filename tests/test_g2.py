"""Device G2 group law over vectorized Fq2 vs the host oracle
(reference test_g2.cpp's add/dbl/mixed/exponentiation checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from barretenberg_tpu.fields import fr
from barretenberg_tpu.groups.g2 import (
    fq2,
    g2,
    g2_host_to_affine,
    g2_jacobian_to_host,
    g2_points_to_host,
)
from barretenberg_tpu.utils import host_curve as hc


def random_g2_points(n, rng):
    pts = []
    for _ in range(n):
        k = int.from_bytes(rng.bytes(32), "little") % fr.p or 1
        pts.append(hc.g2_mul(hc.G2_GENERATOR, k))
    return g2_host_to_affine(pts), pts


class TestFq2Device:
    def test_mul_sqr_invert_vs_host(self):
        rng = np.random.default_rng(1)
        vals = [
            (
                int.from_bytes(rng.bytes(32), "little") % fq2.p,
                int.from_bytes(rng.bytes(32), "little") % fq2.p,
            )
            for _ in range(8)
        ]
        a = fq2.encode(vals)
        b = fq2.encode(vals[::-1])
        from barretenberg_tpu.pairing import tower as tw

        got_mul = fq2.decode(fq2.mul(a, b))
        want_mul = [tw.fq2_mul(x, y) for x, y in zip(vals, vals[::-1])]
        assert got_mul == want_mul
        got_sqr = fq2.decode(fq2.sqr(a))
        assert got_sqr == [tw.fq2_sqr(x) for x in vals]
        got_inv = fq2.decode(fq2.invert(a))
        assert got_inv == [tw.fq2_inv(x) for x in vals]
        # batch inversion with the Montgomery trick
        got_binv = fq2.decode(fq2.batch_invert_any(a))
        assert got_binv == got_inv


class TestG2Device:
    def test_on_curve_and_add_vs_host(self):
        rng = np.random.default_rng(2)
        pts_a, host_a = random_g2_points(4, rng)
        pts_b, host_b = random_g2_points(4, rng)
        assert bool(g2.on_curve_affine(pts_a).all())
        got = g2_jacobian_to_host(
            g2.add(g2.to_jacobian(pts_a), g2.to_jacobian(pts_b))
        )
        want = [hc.g2_add(x, y) for x, y in zip(host_a, host_b)]
        assert got == want

    def test_dbl_and_mixed_add(self):
        rng = np.random.default_rng(3)
        pts, host_pts = random_g2_points(4, rng)
        got_dbl = g2_jacobian_to_host(g2.dbl(g2.to_jacobian(pts)))
        want_dbl = [hc.g2_add(p, p) for p in host_pts]
        assert got_dbl == want_dbl
        got_mixed = g2_jacobian_to_host(g2.mixed_add(g2.dbl(g2.to_jacobian(pts)), pts))
        want_mixed = [hc.g2_add(d, p) for d, p in zip(want_dbl, host_pts)]
        assert got_mixed == want_mixed

    def test_add_exceptions(self):
        """P + (-P) = infinity; P + P via add = dbl; infinity handling."""
        rng = np.random.default_rng(4)
        pts, host_pts = random_g2_points(2, rng)
        j = g2.to_jacobian(pts)
        res = g2.add(j, g2.neg(j))
        assert bool(res.inf.all())
        same = g2.add(j, j)
        want = [hc.g2_add(p, p) for p in host_pts]
        assert g2_jacobian_to_host(same) == want

    @pytest.mark.slow  # 64-step G2 double-and-add scan: minutes of cold XLA
    def test_scalar_mul_vs_host(self):
        rng = np.random.default_rng(5)
        pts, host_pts = random_g2_points(1, rng)
        k = 0xDEADBEEF12345678
        nbits = k.bit_length()
        bits = jnp.asarray(
            [[(k >> (nbits - 1 - i)) & 1] for i in range(nbits)],
            dtype=jnp.uint32,
        )
        got = g2_jacobian_to_host(g2.scalar_mul_bits(pts, bits))
        assert got == [hc.g2_mul(host_pts[0], k)]
