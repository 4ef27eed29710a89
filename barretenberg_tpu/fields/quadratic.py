"""Vectorized quadratic extension field Fq2 = Fq[i]/(i^2 + 1) on device.

Reference: fields/field2.hpp (Karatsuba mul field2.hpp:23-49, norm-based
invert :146-165, conjugation frobenius :167). Element arrays carry a leading
coordinate axis: shape (2, 18, *batch); the API mirrors `Field` so the
generic group law (groups/group.py) instantiates directly over it - that is
how the device G2 is built (reference: curves/bn254/g2.hpp).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .montgomery import Field


@dataclasses.dataclass(frozen=True)
class _Params:
    name: str


class QuadraticField:
    """Field-compatible API over pairs of base-field elements."""

    def __init__(self, base: Field, name: str = "fq2"):
        self.base = base
        self.p = base.p
        self.params = _Params(name=name)
        self.one = self.const((1, 0))
        self.zero = self.const((0, 0))

    # -- encoding -------------------------------------------------------------
    def const(self, value) -> jnp.ndarray:
        """(c0, c1) int pair -> (2, 18) array."""
        c0, c1 = value if isinstance(value, tuple) else (value, 0)
        return jnp.stack([self.base.const(c0), self.base.const(c1)])

    def encode(self, values) -> jnp.ndarray:
        """List of (c0, c1) -> (2, 18, N)."""
        return jnp.stack(
            [
                self.base.encode([v[0] for v in values]),
                self.base.encode([v[1] for v in values]),
            ]
        )

    def decode(self, a) -> list:
        c0 = self.base.decode(a[0])
        c1 = self.base.decode(a[1])
        return list(zip(c0, c1))

    # -- shape helpers ----------------------------------------------------------
    @staticmethod
    def batch_shape(a) -> tuple:
        return a.shape[2:]

    def zeros(self, batch_shape) -> jnp.ndarray:
        return jnp.zeros((2, 18, *batch_shape), dtype=jnp.uint32)

    def full(self, batch_shape, scalar) -> jnp.ndarray:
        return jnp.broadcast_to(
            scalar.reshape((2, 18) + (1,) * len(batch_shape)),
            (2, 18, *batch_shape),
        ).astype(jnp.uint32)

    # -- arithmetic (field2.hpp) --------------------------------------------------
    def add(self, a, b):
        f = self.base
        return jnp.stack([f.add(a[0], b[0]), f.add(a[1], b[1])])

    def sub(self, a, b):
        f = self.base
        return jnp.stack([f.sub(a[0], b[0]), f.sub(a[1], b[1])])

    def neg(self, a):
        f = self.base
        return jnp.stack([f.neg(a[0]), f.neg(a[1])])

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        """Karatsuba over i^2 = -1 (field2.hpp:23-49)."""
        f = self.base
        t0 = f.mont_mul(a[0], b[0])
        t1 = f.mont_mul(a[1], b[1])
        c0 = f.sub(t0, t1)
        c1 = f.sub(f.mont_mul(f.add(a[0], a[1]), f.add(b[0], b[1])), f.add(t0, t1))
        return jnp.stack([c0, c1])

    mont_mul = mul

    def sqr(self, a):
        """(a0+a1)(a0-a1) + 2 a0 a1 i (field2.hpp:51-63)."""
        f = self.base
        t = f.mont_mul(a[0], a[1])
        c0 = f.mont_mul(f.add(a[0], a[1]), f.sub(a[0], a[1]))
        return jnp.stack([c0, f.add(t, t)])

    def mul_by_base(self, a, b_base):
        """Multiply by a base-field element array."""
        f = self.base
        return jnp.stack([f.mont_mul(a[0], b_base), f.mont_mul(a[1], b_base)])

    def conjugate(self, a):
        """Frobenius (field2.hpp:167)."""
        return jnp.stack([a[0], self.base.neg(a[1])])

    def invert(self, a):
        """conj(a) / norm(a) (field2.hpp:146-165). Maps 0 -> 0."""
        f = self.base
        norm = f.add(f.sqr(a[0]), f.sqr(a[1]))
        inv = f.invert(norm)
        return jnp.stack([f.mont_mul(a[0], inv), f.neg(f.mont_mul(a[1], inv))])

    def batch_invert(self, a, axis: int = 2):
        """Montgomery trick along a batch axis with fq2 products."""
        import jax

        from ..utils.scans import hillis_scan

        prefix = hillis_scan(self.mul, a, axis=axis)
        n = a.shape[axis]
        total = jax.lax.index_in_dim(prefix, n - 1, axis=axis, keepdims=False)
        total_inv = self.invert(total)
        suffix = hillis_scan(self.mul, a, axis=axis, reverse=True)
        # see montgomery.batch_invert: barrier against an XLA:TPU fusion
        # miscompile of the combined scan+combine module at large n
        prefix, suffix, total_inv = jax.lax.optimization_barrier(
            (prefix, suffix, total_inv)
        )
        ones_shape = list(a.shape)
        ones_shape[axis] = 1
        one = self.full(tuple(ones_shape[2:]), self.one)
        pre = jnp.concatenate(
            [one, jax.lax.slice_in_dim(prefix, 0, n - 1, axis=axis)], axis=axis
        )
        suf = jnp.concatenate(
            [jax.lax.slice_in_dim(suffix, 1, n, axis=axis), one], axis=axis
        )
        return self.mul(self.mul(pre, suf), jnp.expand_dims(total_inv, axis))

    def batch_invert_any(self, a):
        flat = a.reshape(2, 18, -1)
        return self.batch_invert(flat, axis=2).reshape(a.shape)

    # -- predicates ---------------------------------------------------------------
    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(0, 1))

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)
