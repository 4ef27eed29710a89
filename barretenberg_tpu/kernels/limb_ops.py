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


H = L // 2  # Karatsuba split point (9 limbs = 135 bits, limb-aligned)
BIAS = 1 << 20  # per-column bias making the z1 subtraction non-negative


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
        # --- Karatsuba bias bookkeeping (see _wide_cols_karatsuba) -------
        # C = value added to a product by biasing its z1 columns
        self._bias_value = BIAS * sum(
            1 << (LIMB_BITS * (k + H)) for k in range(2 * (H + 1))
        )
        # both the a*b and m*p products are biased; m absorbs the m*p bias
        # via the constant K below so divisibility by 2^270 is preserved,
        # and the final result is corrected by E = -(2C)/2^270 mod p
        r_internal = 1 << 270
        c2 = self._bias_value
        self._k_limbs = [
            int(v)
            for v in int_to_limbs((-c2 * pow(self.p, -1, r_internal)) % r_internal)
        ]
        corr = (-(2 * self._bias_value) * pow(r_internal, -1, self.p)) % self.p
        self._corr_limbs = [int(v) for v in int_to_limbs(corr)]
        # normalized 10-limb halves-sum of p (for the constant Karatsuba)
        p_lo = self.p % (1 << (LIMB_BITS * H))
        p_hi = self.p >> (LIMB_BITS * H)
        sp = p_lo + p_hi
        self._p_sum_limbs = [
            (sp >> (LIMB_BITS * i)) & LIMB_MASK for i in range(H + 1)
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
    def _school_cols(a, b, base: int = 0, cols=None):
        """Grouped schoolbook columns of a*b accumulated into `cols` at
        offset `base`. Up to THREE raw 32-bit products sum exactly in
        uint32 (3 * (2^15 + 2^7)^2 < 2^32), so each group costs one
        mask+shift+2 accumulates instead of three - the main op-count
        lever over the naive per-product split."""
        La, Lb = len(a), len(b)
        if cols is None:
            cols = [None] * (base + La + Lb)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for k in range(La + Lb - 1):
            lo = max(0, k - Lb + 1)
            hi = min(La, k + 1)
            group = None
            cnt = 0
            for i in range(lo, hi):
                prod = a[i] * b[k - i]
                group = prod if group is None else group + prod
                cnt += 1
                if cnt == 3:
                    acc(base + k, group & MASK)
                    acc(base + k + 1, group >> LIMB_BITS)
                    group = None
                    cnt = 0
            if group is not None:
                acc(base + k, group & MASK)
                acc(base + k + 1, group >> LIMB_BITS)
        return cols

    @staticmethod
    def _school_cols_const(a, c_limbs, base: int = 0, cols=None):
        """Grouped schoolbook columns of a * c for a host constant limb
        list (zero limbs skipped at trace time)."""
        La, Lc = len(a), len(c_limbs)
        if cols is None:
            cols = [None] * (base + La + Lc)

        def acc(k, v):
            cols[k] = v if cols[k] is None else cols[k] + v

        for k in range(La + Lc - 1):
            lo = max(0, k - Lc + 1)
            hi = min(La, k + 1)
            group = None
            cnt = 0
            for i in range(lo, hi):
                cj = c_limbs[k - i]
                if cj == 0:
                    continue
                prod = a[i] * jnp.uint32(cj)
                group = prod if group is None else group + prod
                cnt += 1
                if cnt == 3:
                    acc(base + k, group & MASK)
                    acc(base + k + 1, group >> LIMB_BITS)
                    group = None
                    cnt = 0
            if group is not None:
                acc(base + k, group & MASK)
                acc(base + k + 1, group >> LIMB_BITS)
        return cols

    @staticmethod
    def _half_sum_norm(a):
        """a0 + a1 (halves of an 18-row operand) carry-normalized to H+1
        rows of strict 15-bit limbs (so Karatsuba mid products still pair
        by three in uint32)."""
        out = []
        carry = None
        for i in range(H):
            v = a[i] + a[i + H]
            if carry is not None:
                v = v + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        out.append(carry)
        return out

    @classmethod
    def _biased_combine(cls, z0, z2, z1s):
        """Assemble the 37 Karatsuba columns of a*b + C:
        out[k] = z0[k] + z2[k-2H] + (z1s + BIAS - z0 - z2)[k-H],
        where the per-column BIAS keeps the z1 subtraction non-negative in
        uint32 and adds the compile-time constant C (corrected after the
        Montgomery reduction, see mont_mul)."""
        out = [None] * (2 * L + 1)
        for k in range(len(z0)):
            if z0[k] is not None:
                out[k] = z0[k] if out[k] is None else out[k] + z0[k]
        for k in range(len(z2)):
            if z2[k] is not None:
                v = z2[k]
                out[2 * H + k] = v if out[2 * H + k] is None else out[2 * H + k] + v
        for j in range(2 * (H + 1)):
            t = jnp.uint32(BIAS)
            if j < len(z1s) and z1s[j] is not None:
                t = t + z1s[j]
            if j < len(z0) and z0[j] is not None:
                t = t - z0[j]
            if j < len(z2) and z2[j] is not None:
                t = t - z2[j]
            k = H + j
            out[k] = t if out[k] is None else out[k] + t
        z = jnp.zeros_like(out[0])
        return [c if c is not None else z for c in out]

    @classmethod
    def _wide_cols_k(cls, a, b):
        """37 carry-save columns of a*b + C via one-level Karatsuba
        (split at 9 limbs = 135 bits): 81+81+100 products instead of 324.
        The added constant C (bias columns) is corrected after reduction.
        The analog of the reference's asm schoolbook mul
        (field_impl_asm.tcc:169-182) restructured for VPU op count."""
        z0 = cls._school_cols(a[:H], b[:H])
        z2 = cls._school_cols(a[H:], b[H:])
        z1s = cls._school_cols(cls._half_sum_norm(a), cls._half_sum_norm(b))
        return cls._biased_combine(z0, z2, z1s)

    def _wide_cols_k_p(self, m):
        """37 columns of m*p + C (p = field modulus, host constant)."""
        p_lo = self.p_limbs[:H]
        p_hi = self.p_limbs[H:]
        z0 = self._school_cols_const(m[:H], p_lo)
        z2 = self._school_cols_const(m[H:], p_hi)
        z1s = self._school_cols_const(self._half_sum_norm(m), self._p_sum_limbs)
        return self._biased_combine(z0, z2, z1s)

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
        # Karatsuba wide product: t = a*b + C in carry-save columns
        t = self._carry_pass(self._wide_cols_k(a, b))  # 38 relaxed limbs
        # m = -(t + C)*p^-1 mod 2^270: the constant K = -C*p^-1 absorbs the
        # bias of the upcoming biased m*p product, keeping s = 0 mod 2^270
        low = self._low_cols_const(t[:L], self.np_limbs)
        low = [
            low[i] + self._u(self._k_limbs[i]) if self._k_limbs[i] else low[i]
            for i in range(L)
        ]
        m = self._carry_pass(low)[:L]
        u = self._wide_cols_k_p(m)  # m*p + C
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
        r = self._cond_sub_p(out)
        # bias correction: both products were biased by C, so the reduced
        # value is off by 2C/2^270; add E = -(2C)/2^270 mod p and renormalize
        out2 = []
        c3 = jnp.zeros_like(c2)
        for i in range(L):
            v = r[i] + self._u(self._corr_limbs[i]) + c3
            out2.append(v & MASK)
            c3 = v >> LIMB_BITS
        return self._cond_sub_p(out2)

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
