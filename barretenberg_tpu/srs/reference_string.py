"""Structured reference string (powers-of-tau SRS) handling.

Mirrors the reference's ReferenceString + io::read_transcript
(reference: waffle/reference_string/reference_string.cpp, io/io.hpp:157-182)
minus the Pippenger endo-point-table expansion (our MSM gathers affine points
directly) and minus the eager Miller-line precompute (the host pairing
computes lines on the fly).

Two sources:
  * `load(path, degree)` - the reference's trusted-setup transcript format
    (BE-serialized points; io.hpp:76-133);
  * `generate(degree, secret)` - a device-computed fake SRS for tests and
    benchmarks ([tau^i]G via one vectorized double-and-add sweep over all
    lanes; the real library never generates - its SRS is an input artifact).
"""

from __future__ import annotations

import functools
import struct

import jax.numpy as jnp
import numpy as np

from ..fields import fq, fr
from ..groups import AffinePoints
from ..groups.g1 import g1
from ..utils import host_curve

_WORD_MASK = (1 << 64) - 1


def _read_fq(buf: bytes, off: int) -> int:
    """4 x u64, least-significant word first, each word big-endian
    (io.hpp:86-93's bswap of the LSB-first limb array)."""
    v = 0
    for j in range(4):
        word = int.from_bytes(buf[off + 8 * j : off + 8 * j + 8], "big")
        v |= word << (64 * j)
    return v


def _write_fq(v: int) -> bytes:
    return b"".join(
        ((v >> (64 * j)) & _WORD_MASK).to_bytes(8, "big") for j in range(4)
    )


class ReferenceString:
    """monomials: AffinePoints batch of [1, tau, tau^2, ...]G (degree points);
    g2_x: host G2 affine point ((x0,x1),(y0,y1)) = [tau]G2."""

    def __init__(self, monomials: AffinePoints, g2_x, degree: int):
        self.monomials = monomials
        self.g2_x = g2_x
        self.degree = degree
        self._pip_tables: dict = {}

    def pippenger_table(self, n: int):
        """Per-round shifted point table for the first n monomials, built
        once and cached (the analog of the reference expanding its SRS into
        a Pippenger point table at load, reference_string.cpp:22-23 +
        pippenger_precomputed's tables, scalar_multiplication.cpp:478-573).
        Commitments against a fixed SRS then need ONE sort+segment-scan
        pass - no per-round sorts and no accumulator doublings."""
        tab = self._pip_tables.get(n)
        if tab is None:
            from ..msm.pippenger import generate_pippenger_point_table

            pts = g1.take_affine(self.monomials, jnp.arange(n))
            tab = generate_pippenger_point_table(pts)
            self._pip_tables[n] = tab
        return tab

    # -- constructors -------------------------------------------------------
    @staticmethod
    def load(path: str, degree: int) -> "ReferenceString":
        """Parse the reference's transcript format (io.hpp:157-182): 28-byte
        network-order manifest, num_g1_points G1 points, 2 G2 points; the
        first monomial is the plain generator, file points fill [1..degree)."""
        with open(path, "rb") as f:
            buf = f.read()
        (_, _, _, _, num_g1, _num_g2, _) = struct.unpack(">7I", buf[:28])
        assert num_g1 >= degree - 1, "transcript too small for degree"
        xs = [1]
        ys = [2]
        off = 28
        for i in range(degree - 1):
            xs.append(_read_fq(buf, off + 64 * i))
            ys.append(_read_fq(buf, off + 64 * i + 32))
        g2_off = off + 64 * num_g1 + 128  # skip [1]_2, read [x]_2
        g2_x = (
            (_read_fq(buf, g2_off), _read_fq(buf, g2_off + 32)),
            (_read_fq(buf, g2_off + 64), _read_fq(buf, g2_off + 96)),
        )
        monomials = AffinePoints(
            fq.encode(xs), fq.encode(ys), jnp.zeros(degree, dtype=bool)
        )
        return ReferenceString(monomials, g2_x, degree)

    @staticmethod
    def save(path: str, monomial_values: list, g2_x) -> None:
        """Write a transcript file in the reference format (points are host
        (x, y) int tuples EXCLUDING the leading generator)."""
        n = len(monomial_values)
        manifest = struct.pack(">7I", 0, 1, n, 2, n, 2, 0)
        out = [manifest]
        for x, y in monomial_values:
            out.append(_write_fq(x))
            out.append(_write_fq(y))
        g2_gen = host_curve.G2_GENERATOR
        for pt in (g2_gen, g2_x):
            out.append(_write_fq(pt[0][0]))
            out.append(_write_fq(pt[0][1]))
            out.append(_write_fq(pt[1][0]))
            out.append(_write_fq(pt[1][1]))
        out.append(b"\x00" * 64)  # checksum placeholder
        with open(path, "wb") as f:
            f.write(b"".join(out))

    @staticmethod
    def generate(degree: int, secret: int) -> "ReferenceString":
        """Test/bench SRS: [tau^i]G1 for i < degree plus [tau]G2.

        The tau powers are host ints (cheap); the degree generator
        multiplications run via the fixed-base window table
        (groups/g1.fixed_base_mul): 32 gather+mixed-add steps over all
        lanes, no doublings - seconds at 2^20 where the double-and-add
        sweep took ~5 minutes.
        """
        tau = secret % fr.p
        powers = [1] * degree
        for i in range(1, degree):
            powers[i] = powers[i - 1] * tau % fr.p
        from ..groups.g1 import fixed_base_mul

        mono_jac = fixed_base_mul(powers)
        monomials = g1.batch_normalize_chunked(mono_jac)
        g2_x = host_curve.g2_mul(host_curve.G2_GENERATOR, tau)
        return ReferenceString(monomials, g2_x, degree)

    # -- views --------------------------------------------------------------
    @functools.cached_property
    def g2_miller_lines(self):
        """Precomputed Miller lines for ([1]_2, [x]_2) - the verifier
        reference string (reference: reference_string.cpp:26-28,135-146)."""
        from ..pairing import tower

        return (
            tower.precompute_miller_lines(host_curve.G2_GENERATOR),
            tower.precompute_miller_lines(self.g2_x),
        )

    def monomials_host(self) -> list:
        from ..groups.g1 import points_to_host

        return points_to_host(self.monomials)

    def srs_pairing_check(self) -> bool:
        """e(-[x]_1, [1]_2) * e([1]_1, [x]_2) == 1 (the test_io.cpp:12 SRS
        sanity gate)."""
        from ..pairing import pairing_check

        pts = self.monomials_host()
        return pairing_check(
            [
                (host_curve.g1_neg(pts[1]), host_curve.G2_GENERATOR),
                (pts[0], self.g2_x),
            ]
        )


@functools.lru_cache(maxsize=4)
def test_srs(degree: int, secret: int = 0xA11CE) -> ReferenceString:
    """Cached deterministic SRS for tests/benchmarks."""
    return ReferenceString.generate(degree, secret)
