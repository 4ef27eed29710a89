"""Vectorized device Fq6/Fq12 tower (reference: fields/field6.hpp,
field12.hpp).

Element layouts extend the quadratic field's leading-coordinate-axis
convention:
  Fq6  = Fq2[v]/(v^3 - xi): shape (3, 2, 18, *batch)
  Fq12 = Fq6[w]/(w^2 - v):  shape (2, 3, 2, 18, *batch)

This gives the device everything the host tower (pairing/tower.py) has -
Karatsuba/Toom multiplication, Frobenius maps via derived xi-power
coefficients, cyclotomic squaring, sparse line multiplication - enabling
batched on-device Miller loops (e.g. SRS validation at scale). The host
tower remains the oracle.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..pairing import tower as host_tower
from .montgomery import Field
from .quadratic import QuadraticField


class SexticField:
    """Fq6 over a vectorized Fq2 (reference field6.hpp)."""

    def __init__(self, fq2: QuadraticField):
        self.fq2 = fq2
        self.p = fq2.p

    # -- encoding ---------------------------------------------------------
    def encode(self, values) -> jnp.ndarray:
        """List of ((c0),(c1),(c2)) fq2 triples -> (3, 2, 18, N)."""
        return jnp.stack([self.fq2.encode([v[i] for v in values]) for i in range(3)])

    def decode(self, a) -> list:
        cs = [self.fq2.decode(a[i]) for i in range(3)]
        return list(zip(*cs))

    def zeros(self, batch_shape):
        return jnp.zeros((3, 2, 18, *batch_shape), dtype=jnp.uint32)

    # -- arithmetic (field6.hpp:44-195) -------------------------------------
    def add(self, a, b):
        f = self.fq2
        return jnp.stack([f.add(a[i], b[i]) for i in range(3)])

    def sub(self, a, b):
        f = self.fq2
        return jnp.stack([f.sub(a[i], b[i]) for i in range(3)])

    def neg(self, a):
        f = self.fq2
        return jnp.stack([f.neg(a[i]) for i in range(3)])

    def mul_xi(self, a2):
        """fq2 element * xi = (9+i): (9 a0 - a1) + (9 a1 + a0) i, with
        9a = 8a + a (fq6.hpp __mul_by_non_residue)."""
        f = self.fq2.base
        c0 = f.sub(f.add(f.double(f.double(f.double(a2[0]))), a2[0]), a2[1])
        c1 = f.add(f.add(f.double(f.double(f.double(a2[1]))), a2[1]), a2[0])
        return jnp.stack([c0, c1])

    def mul(self, a, b):
        """Toom/Karatsuba cubic mul (field6.hpp:44-124)."""
        f = self.fq2
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        t2 = f.mul(a[2], b[2])
        c0 = f.add(
            t0,
            self.mul_xi(
                f.sub(f.mul(f.add(a[1], a[2]), f.add(b[1], b[2])), f.add(t1, t2))
            ),
        )
        c1 = f.add(
            f.sub(f.mul(f.add(a[0], a[1]), f.add(b[0], b[1])), f.add(t0, t1)),
            self.mul_xi(t2),
        )
        c2 = f.add(
            f.sub(f.mul(f.add(a[0], a[2]), f.add(b[0], b[2])), f.add(t0, t2)), t1
        )
        return jnp.stack([c0, c1, c2])

    def sqr(self, a):
        return self.mul(a, a)

    def mul_by_nonresidue(self, a):
        """a * v (field12.hpp mul_by_non_residue)."""
        return jnp.stack([self.mul_xi(a[2]), a[0], a[1]])

    def invert(self, a):
        """(field6.hpp:184-228)."""
        f = self.fq2
        c0 = f.sub(f.sqr(a[0]), self.mul_xi(f.mul(a[1], a[2])))
        c1 = f.sub(self.mul_xi(f.sqr(a[2])), f.mul(a[0], a[1]))
        c2 = f.sub(f.sqr(a[1]), f.mul(a[0], a[2]))
        t = f.invert(
            f.add(
                f.mul(a[0], c0),
                self.mul_xi(f.add(f.mul(a[2], c1), f.mul(a[1], c2))),
            )
        )
        return jnp.stack([f.mul(c0, t), f.mul(c1, t), f.mul(c2, t)])

    def frobenius(self, a, k: int):
        """(field6.hpp:267-293): conjugate each fq2 coord (odd k) and scale
        c1/c2 by the derived xi-power coefficients."""
        f = self.fq2
        conj = (lambda x: f.conjugate(x)) if k % 2 else (lambda x: x)
        c1_coeff = f.const(host_tower._FROB_C1[k])
        c2_coeff = f.const(host_tower._FROB_C2[k])
        return jnp.stack(
            [
                conj(a[0]),
                f.mul(conj(a[1]), f.full(f.batch_shape(a[1]), c1_coeff)),
                f.mul(conj(a[2]), f.full(f.batch_shape(a[2]), c2_coeff)),
            ]
        )


class TwelfthField:
    """Fq12 over the vectorized Fq6 (reference field12.hpp)."""

    def __init__(self, fq6: SexticField):
        self.fq6 = fq6
        self.fq2 = fq6.fq2
        self.p = fq6.p

    def encode(self, values) -> jnp.ndarray:
        """List of tower fq12 values ((fq6),(fq6)) -> (2, 3, 2, 18, N)."""
        return jnp.stack([self.fq6.encode([v[i] for v in values]) for i in range(2)])

    def decode(self, a) -> list:
        c0 = self.fq6.decode(a[0])
        c1 = self.fq6.decode(a[1])
        return list(zip(c0, c1))

    def one(self, batch_shape):
        f2 = self.fq2
        one2 = f2.full(batch_shape, f2.one)
        z2 = f2.zeros(batch_shape)
        c0 = jnp.stack([one2, z2, z2])
        c1 = jnp.stack([z2, z2, z2])
        return jnp.stack([c0, c1])

    def mul(self, a, b):
        f = self.fq6
        t0 = f.mul(a[0], b[0])
        t1 = f.mul(a[1], b[1])
        c0 = f.add(t0, f.mul_by_nonresidue(t1))
        c1 = f.sub(f.mul(f.add(a[0], a[1]), f.add(b[0], b[1])), f.add(t0, t1))
        return jnp.stack([c0, c1])

    def sqr(self, a):
        f = self.fq6
        t = f.mul(a[0], a[1])
        c0 = f.sub(
            f.mul(f.add(a[0], a[1]), f.add(a[0], f.mul_by_nonresidue(a[1]))),
            f.add(t, f.mul_by_nonresidue(t)),
        )
        return jnp.stack([c0, f.add(t, t)])

    def conjugate(self, a):
        """Unitary inverse (field12.hpp:230)."""
        return jnp.stack([a[0], self.fq6.neg(a[1])])

    def invert(self, a):
        f = self.fq6
        t = f.invert(f.sub(f.sqr(a[0]), f.mul_by_nonresidue(f.sqr(a[1]))))
        return jnp.stack([f.mul(a[0], t), f.neg(f.mul(a[1], t))])

    def frobenius(self, a, k: int):
        """(field12.hpp:200-222)."""
        f6, f2 = self.fq6, self.fq2
        w_coeff = f2.const(host_tower._FROB_W[k])
        c1 = f6.frobenius(a[1], k)
        c1 = jnp.stack(
            [f2.mul(c1[i], f2.full(f2.batch_shape(c1[i]), w_coeff)) for i in range(3)]
        )
        return jnp.stack([f6.frobenius(a[0], k), c1])

    def cyclotomic_sqr(self, a):
        """Granger-Scott (field12.hpp:224), same coordinate mapping as the
        host tower."""
        f2 = self.fq2
        x0, x1, x2 = a[0]
        x3, x4, x5 = a[1]
        mul_xi = self.fq6.mul_xi

        def two(x):
            return f2.add(x, x)

        t0 = f2.sqr(x4)
        t1 = f2.sqr(x0)
        t6 = f2.sub(f2.sqr(f2.add(x4, x0)), f2.add(t0, t1))
        t2 = f2.sqr(x2)
        t3 = f2.sqr(x3)
        t7 = f2.sub(f2.sqr(f2.add(x2, x3)), f2.add(t2, t3))
        t4 = f2.sqr(x5)
        t5 = f2.sqr(x1)
        t8 = mul_xi(f2.sub(f2.sqr(f2.add(x5, x1)), f2.add(t4, t5)))
        t0 = f2.add(mul_xi(t0), t1)
        t2 = f2.add(mul_xi(t2), t3)
        t4 = f2.add(mul_xi(t4), t5)
        z0 = f2.add(two(f2.sub(t0, x0)), t0)
        z1 = f2.add(two(f2.sub(t2, x1)), t2)
        z2 = f2.add(two(f2.sub(t4, x2)), t4)
        z3 = f2.add(two(f2.add(t8, x3)), t8)
        z4 = f2.add(two(f2.add(t6, x4)), t6)
        z5 = f2.add(two(f2.add(t7, x5)), t7)
        return jnp.stack([jnp.stack([z0, z1, z2]), jnp.stack([z3, z4, z5])])

    def sparse_mul(self, a, o, vw, vv):
        """a * line where the line is the sparse element with fq6-coords
        c0 = (o, 0, vv), c1 = (0, vw, 0) (field12.hpp sparse_mul)."""
        f6, f2 = self.fq6, self.fq2
        z2 = f2.zeros(f2.batch_shape(o))
        b0 = jnp.stack([o, z2, vv])
        b1 = jnp.stack([z2, vw, z2])
        t0 = f6.mul(a[0], b0)
        t1 = f6.mul(a[1], b1)
        c0 = f6.add(t0, f6.mul_by_nonresidue(t1))
        c1 = f6.sub(
            f6.mul(f6.add(a[0], a[1]), f6.add(b0, b1)), f6.add(t0, t1)
        )
        return jnp.stack([c0, c1])
