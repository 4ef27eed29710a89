"""Register-resident limb arithmetic for Pallas kernel bodies.

Same math as fields/montgomery.py but expressed on *lists of limb rows*
(each a rank-1/2 jnp value living in vector registers / VMEM), with no
pads/reshapes - the forms Mosaic compiles well. This is the TPU analog of
the reference's register-allocated asm field kernels
(reference: fields/field_impl_asm.tcc, asm_macros.hpp): where the x64 code
chains MULX/ADCX/ADOX through 64-bit registers, we chain 15-bit limb
products through 32-bit VPU lanes.

All functions are pure and also run under plain XLA tracing (used by the
interpret path in tests).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields.params import LIMB_BITS, LIMB_MASK, NUM_LIMBS, FieldParams
from ..fields.limbs import int_to_limbs

L = NUM_LIMBS
MASK = LIMB_MASK  # python int: jnp weak-types it, avoids captured consts in pallas


class LimbField:
    """Field ops on lists of 18 limb rows (canonical form in/out)."""

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.modulus
        self.p_limbs = [int(v) for v in int_to_limbs(self.p)]
        self.np_limbs = [int(v) for v in int_to_limbs(params.nprime_int)]
        self.one_limbs = [
            int(v) for v in int_to_limbs(params.r_int % self.p)
        ]

    # -- helpers --------------------------------------------------------
    @staticmethod
    def _u(x):
        return jnp.uint32(x)

    def zero_rows(self, like):
        z = jnp.zeros_like(like)
        return [z for _ in range(L)]

    def const_rows(self, value: int, like):
        limbs = int_to_limbs((value % self.p) * (1 << 270) % self.p)
        one = jnp.ones_like(like)
        return [one * self._u(int(v)) for v in limbs]

    # -- core multiplication -------------------------------------------
    @staticmethod
    def _wide_cols(a, b):
        """37 carry-save columns of a*b; a, b lists of 18 limb rows."""
        cols = [None] * (2 * L + 1)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for i in range(L):
            ai = a[i]
            for j in range(L):
                p = ai * b[j]
                acc(i + j, p & MASK)
                acc(i + j + 1, p >> LIMB_BITS)
        cols[2 * L] = jnp.zeros_like(cols[0])
        return cols

    @staticmethod
    def _low_cols_const(a, c_limbs):
        """Columns 0..17 of a * c (c a host int-limb list), mod 2^270."""
        cols = [None] * L
        for i in range(L):
            ai = a[i]
            for j in range(L - i):
                cj = c_limbs[j]
                if cj == 0:
                    continue
                p = ai * jnp.uint32(cj)
                k = i + j
                lo = p & MASK
                cols[k] = lo if cols[k] is None else cols[k] + lo
                if k + 1 < L:
                    hi = p >> LIMB_BITS
                    cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        z = None
        for k in range(L):
            if cols[k] is None:
                if z is None:
                    z = jnp.zeros_like(a[0])
                cols[k] = z
        return cols

    @staticmethod
    def _wide_cols_const(a, c_limbs):
        """37 columns of a * c (c a host int-limb list)."""
        cols = [None] * (2 * L + 1)
        for i in range(L):
            ai = a[i]
            for j in range(L):
                cj = c_limbs[j]
                if cj == 0:
                    continue
                p = ai * jnp.uint32(cj)
                lo = p & MASK
                hi = p >> LIMB_BITS
                cols[i + j] = lo if cols[i + j] is None else cols[i + j] + lo
                cols[i + j + 1] = (
                    hi if cols[i + j + 1] is None else cols[i + j + 1] + hi
                )
        z = jnp.zeros_like(a[0])
        return [c if c is not None else z for c in cols]

    @staticmethod
    def _carry_pass(cols):
        """One relaxation pass over a column list (appends overflow col)."""
        out = []
        prev_hi = None
        for c in cols:
            lo = c & MASK
            out.append(lo if prev_hi is None else lo + prev_hi)
            prev_hi = c >> LIMB_BITS
        out.append(prev_hi)
        return out

    def _cond_sub_p(self, r):
        borrow = jnp.zeros_like(r[0])
        d = []
        for i in range(L):
            v = r[i] + self._u(LIMB_MASK + 1 - self.p_limbs[i]) - borrow
            d.append(v & MASK)
            borrow = self._u(1) - (v >> LIMB_BITS)
        ge_p = borrow == 0
        return [jnp.where(ge_p, d[i], r[i]) for i in range(L)]

    def mont_mul(self, a, b):
        t = self._carry_pass(self._wide_cols(a, b))  # 38 relaxed limbs
        m = self._carry_pass(self._low_cols_const(t[:L], self.np_limbs))[:L]
        u = self._wide_cols_const(m, self.p_limbs)
        s = [u[k] + t[k] for k in range(2 * L)] + [t[2 * L]]
        carry = jnp.zeros_like(s[0])
        for i in range(L):
            carry = (s[i] + carry) >> LIMB_BITS
        hi = s[L:]
        hi[0] = hi[0] + carry
        # final ripple to canonical 18 limbs
        out = []
        c2 = jnp.zeros_like(carry)
        for i in range(L):
            v = (hi[i] if i < len(hi) else jnp.zeros_like(c2)) + c2
            out.append(v & MASK)
            c2 = v >> LIMB_BITS
        return self._cond_sub_p(out)

    def sqr(self, a):
        return self.mont_mul(a, a)

    def mul_const(self, a, value: int):
        """a * value (a field value) via one Montgomery mul with the
        internal-Montgomery representation of value."""
        c = int_to_limbs((value % self.p) * (1 << 270) % self.p)
        t = self._carry_pass(self._wide_cols_const(a, [int(v) for v in c]))
        m = self._carry_pass(self._low_cols_const(t[:L], self.np_limbs))[:L]
        u = self._wide_cols_const(m, self.p_limbs)
        s = [u[k] + t[k] for k in range(2 * L)] + [t[2 * L]]
        carry = jnp.zeros_like(s[0])
        for i in range(L):
            carry = (s[i] + carry) >> LIMB_BITS
        hi = s[L:]
        hi[0] = hi[0] + carry
        out = []
        c2 = jnp.zeros_like(carry)
        for i in range(L):
            v = hi[i] + c2
            out.append(v & MASK)
            c2 = v >> LIMB_BITS
        return self._cond_sub_p(out)

    # -- additive ops ---------------------------------------------------
    def add(self, a, b):
        out = []
        carry = jnp.zeros_like(a[0])
        for i in range(L):
            v = a[i] + b[i] + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return self._cond_sub_p(out)

    def sub(self, a, b):
        d = []
        borrow = jnp.zeros_like(a[0])
        for i in range(L):
            v = a[i] + self._u(LIMB_MASK + 1) - b[i] - borrow
            d.append(v & MASK)
            borrow = self._u(1) - (v >> LIMB_BITS)
        under = borrow == 1
        e = []
        carry = jnp.zeros_like(borrow)
        for i in range(L):
            v = d[i] + self._u(self.p_limbs[i]) + carry
            e.append(v & MASK)
            carry = v >> LIMB_BITS
        return [jnp.where(under, e[i], d[i]) for i in range(L)]

    def neg(self, a):
        d = []
        borrow = jnp.zeros_like(a[0])
        for i in range(L):
            v = self._u(self.p_limbs[i] + LIMB_MASK + 1) - a[i] - borrow
            d.append(v & MASK)
            borrow = self._u(1) - (v >> LIMB_BITS)
        return self._cond_sub_p(d)

    def double(self, a):
        return self.add(a, a)

    # -- predicates / select -------------------------------------------
    @staticmethod
    def is_zero(a):
        acc = a[0]
        for i in range(1, L):
            acc = acc | a[i]
        return acc == 0

    @staticmethod
    def eq(a, b):
        acc = a[0] ^ b[0]
        for i in range(1, L):
            acc = acc | (a[i] ^ b[i])
        return acc == 0

    @staticmethod
    def select(mask, a, b):
        return [jnp.where(mask, a[i], b[i]) for i in range(L)]
