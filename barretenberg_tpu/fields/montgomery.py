"""Vectorized Montgomery prime-field arithmetic for TPU.

TPU-native design notes
-----------------------
The reference implements 4x64-bit Montgomery multiplication with MULX/ADCX
x64 assembly (reference: fields/field_impl_asm.tcc:305, asm_macros.hpp:270).
TPUs have no 64-bit scalar units; the VPU operates on 32-bit lanes. We
therefore represent a field element as **18 limbs of 15 bits stored in
uint32**, batch axis trailing (planar layout, limb axis first) so batches map
onto the 8x128 VPU lanes:

* a product of two 15-bit limbs fits a 32-bit lane with headroom even when
  limbs are slightly "relaxed" (carry-save), so no 64-bit emulation is needed;
* column accumulations of the 18x18 schoolbook product stay < 2^22 < 2^32;
* Montgomery reduction is done in one shot with m = T * (-p^-1) mod 2^270
  instead of the reference's 4 interleaved CIOS rounds - fewer data-dependent
  chains, which XLA vectorizes cleanly.

All ops keep elements in **canonical form** (< p, normalized 15-bit limbs).
The external (serialized) representation everywhere in this library is the
reference's Montgomery form with R = 2^256; internally R' = 2^270. The map
``u -> u * 2^14 mod p`` converts between them homomorphically (params.py).

Every public method is pure jnp and safe to call under jit/vmap/shard_map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import int_to_limbs, ints_to_limbs, limbs_to_int, limbs_to_ints
from .params import (
    FieldParams,
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
    R_EXTERNAL,
    R_INTERNAL,
)

L = NUM_LIMBS
WIDE = 2 * L  # columns of a full product (i + j <= 2L-2, hi spill to 2L-1)


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


class Field:
    """A prime field instance with vectorized limb arithmetic.

    Element arrays have shape ``(18, *batch)`` dtype uint32. Scalars are
    ``(18,)`` arrays and broadcast against batches.
    """

    def __init__(self, params: FieldParams):
        self.params = params
        self.p = params.modulus
        # Host-side constant limb tables (become device constants under jit).
        self._p_limbs = int_to_limbs(self.p)
        self._nprime_limbs = int_to_limbs(params.nprime_int)
        self._to_internal = int_to_limbs(
            (params.to_internal_factor * R_INTERNAL) % self.p
        )
        self._from_internal = int_to_limbs(
            (params.from_internal_factor * R_INTERNAL) % self.p
        )
        # NB: mont factors above are themselves stored in internal-Montgomery
        # form so a single mont_mul applies them.
        self.one = self.const(1)
        self.zero = self.const(0)
        self.modulus_limbs = jnp.asarray(self._p_limbs)
        self._pow_jit_cache: dict = {}

    # ------------------------------------------------------------------
    # Encoding
    # ------------------------------------------------------------------
    def const(self, value: int) -> jnp.ndarray:
        """Python int (a field *value*) -> internal-Montgomery (18,) array."""
        return jnp.asarray(int_to_limbs((value % self.p) * R_INTERNAL % self.p))

    def encode(self, values) -> jnp.ndarray:
        """List of field values -> internal-Montgomery (18, N) array."""
        vals = [(int(v) % self.p) * R_INTERNAL % self.p for v in values]
        return jnp.asarray(ints_to_limbs(vals))

    def decode(self, limbs) -> list[int]:
        """Internal-Montgomery (18, *batch) -> list of field values."""
        r_inv = self.params.r_int_inv
        return [v * r_inv % self.p for v in limbs_to_ints(np.asarray(limbs))]

    def encode_montgomery(self, raw_values) -> jnp.ndarray:
        """256-bit ints already in the reference's R=2^256 Montgomery form
        -> internal representation (multiplies by 2^14 mod p)."""
        vals = [(int(v) << 14) % self.p for v in raw_values]
        return jnp.asarray(ints_to_limbs(vals))

    def decode_montgomery(self, limbs) -> list[int]:
        """Internal representation -> reference R=2^256 Montgomery integers."""
        inv = pow(1 << 14, -1, self.p)
        return [v * inv % self.p for v in limbs_to_ints(np.asarray(limbs))]

    # ------------------------------------------------------------------
    # Shape helpers
    # ------------------------------------------------------------------
    def zeros(self, batch_shape) -> jnp.ndarray:
        return jnp.zeros((L, *batch_shape), dtype=jnp.uint32)

    @staticmethod
    def batch_shape(a) -> tuple:
        """Batch dims of an element array (everything after the limb axis).
        Extension fields override (their element arrays carry extra leading
        coordinate axes)."""
        return a.shape[1:]

    def batch_invert_any(self, a) -> jnp.ndarray:
        """batch_invert over all batch dims at once."""
        flat = a.reshape(L, -1)
        return self.batch_invert(flat).reshape(a.shape)

    def full(self, batch_shape, scalar_limbs) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.reshape(scalar_limbs, (L,) + (1,) * len(batch_shape)),
            (L, *batch_shape),
        ).astype(jnp.uint32)

    # ------------------------------------------------------------------
    # Carry machinery
    # ------------------------------------------------------------------
    @staticmethod
    def _carry_scan(g, p):
        """Kogge-Stone prefix of the carry/borrow composition
        (G, P) o (g, p) = (g | (p & G), p & P) over the limb axis (axis 0).
        Returns the INCLUSIVE carries-out per position, as uint32 in {0,1}.
        Statically unrolled (log2(18) -> 5 levels of boolean ops), so it
        fuses on TPU and stays tiny in the jitted graph - unlike a
        sequential 18-step chain (big graphs) or a lax.scan (18 serial
        micro-kernels per field op at runtime)."""
        k = g.shape[0]
        d = 1
        while d < k:
            g_prev = jnp.concatenate([jnp.zeros_like(g[:d]), g[:-d]], axis=0)
            p_prev = jnp.concatenate([jnp.zeros_like(p[:d]), p[:-d]], axis=0)
            g = g | (p & g_prev)
            p = p & p_prev
            d <<= 1
        return g

    @classmethod
    def _ripple(cls, cols, out_len: int):
        """Exact carry propagation. cols: (K, *b) relaxed columns (< 2^32).
        Returns (out_len, *b) normalized 15-bit limbs; value beyond out_len
        limbs is dropped (callers guarantee it fits). Three local
        carry-save passes squeeze limbs to <= 2^15, then one log-depth
        carry-lookahead resolves the remaining binary carries."""
        k = cols.shape[0]
        if k < out_len:
            cols = jnp.concatenate(
                [cols, jnp.zeros((out_len - k, *cols.shape[1:]), cols.dtype)]
            )
        elif k > out_len:
            cols = cols[:out_len]
        x = cols
        for _ in range(3):  # 2^32 -> 2^17 -> 2^15+e -> <= 2^15
            hi = x >> LIMB_BITS
            x = (x & LIMB_MASK) + jnp.concatenate(
                [jnp.zeros_like(hi[:1]), hi[:-1]], axis=0
            )
        g = x >> LIMB_BITS  # 1 iff limb == 2^15
        p = (x == LIMB_MASK).astype(jnp.uint32)
        carries = cls._carry_scan(g, p)
        cin = jnp.concatenate([jnp.zeros_like(carries[:1]), carries[:-1]], axis=0)
        return (x + cin) & LIMB_MASK

    def _cond_sub_p(self, a):
        """a (normalized, < 2p) -> a mod p canonical, via borrow-lookahead
        subtraction (branchless; the cmov of field_impl_asm.tcc:226)."""
        pl = jnp.asarray(self._p_limbs).astype(jnp.uint32)
        pl = pl.reshape((L,) + (1,) * (a.ndim - 1))
        g = (a < pl).astype(jnp.uint32)  # borrow generated
        pr = (a == pl).astype(jnp.uint32)  # borrow propagated
        borrows = self._carry_scan(g, pr)
        bin_ = jnp.concatenate([jnp.zeros_like(borrows[:1]), borrows[:-1]], axis=0)
        d = (a + _u32(LIMB_MASK + 1) - pl - bin_) & LIMB_MASK
        ge_p = borrows[-1] == 0  # no final borrow => a >= p
        return jnp.where(ge_p[None], d, a)

    # ------------------------------------------------------------------
    # Add / sub / neg
    # ------------------------------------------------------------------
    def add(self, a, b):
        a, b = self._materialize_broadcast(a, b)
        if a.ndim > 2:
            return self._flat2d(self.add, a, b)
        if self._pallas_ok(a) and b.shape == a.shape:
            from ..kernels import field_kernels

            return field_kernels.add(self.params, a, b)
        s = self._ripple(a + b, L)
        return self._cond_sub_p(s)

    @classmethod
    def _borrow_sub(cls, a, b):
        """Limb-wise a - b with log-depth borrow lookahead.
        Returns (difference limbs, final borrow flag array in {0,1})."""
        g = (a < b).astype(jnp.uint32)
        pr = (a == b).astype(jnp.uint32)
        borrows = cls._carry_scan(g, pr)
        bin_ = jnp.concatenate([jnp.zeros_like(borrows[:1]), borrows[:-1]], axis=0)
        d = (a + _u32(LIMB_MASK + 1) - b - bin_) & LIMB_MASK
        return d, borrows[-1]

    def sub(self, a, b):
        a, b = self._materialize_broadcast(a, b)
        if a.ndim > 2:
            return self._flat2d(self.sub, a, b)
        if self._pallas_ok(a) and b.shape == a.shape:
            from ..kernels import field_kernels

            return field_kernels.sub(self.params, a, b)
        d, borrow = self._borrow_sub(a, b)
        underflow = borrow == 1
        e = self._ripple(d + self.full(a.shape[1:], self.modulus_limbs), L)
        return jnp.where(underflow[None], e, d)

    def neg(self, a):
        if a.ndim > 2:
            return self._flat2d(self.neg, a)
        p = self.full(a.shape[1:], self.modulus_limbs)
        d, _ = self._borrow_sub(p, a)
        return self._cond_sub_p(d)  # maps a=0 -> p -> 0

    def double(self, a):
        return self.add(a, a)

    # ------------------------------------------------------------------
    # Multiplication
    # ------------------------------------------------------------------
    @staticmethod
    def _skew_sum(m):
        """Anti-diagonal sums: m (L, L, *batch) -> (2L-1, *batch) with
        out[k] = sum_i m[i, k-i]. Done with one pad+reshape ("skew") so XLA
        sees 3 cheap ops instead of L dynamic-update-slices."""
        batch = m.shape[2:]
        mp = jnp.pad(m, ((0, 0), (0, L)) + ((0, 0),) * len(batch))
        flat = mp.reshape((L * 2 * L,) + batch)
        sk = flat[: L * (2 * L - 1)].reshape((L, 2 * L - 1) + batch)
        return sk.sum(axis=0, dtype=jnp.uint32)

    @classmethod
    def _wide_product_cols(cls, a, b):
        """Full 36-column carry-save product of two limb vectors.

        a: (L, *batch), b: (L, *batch) -> (2L, *batch) columns, each < 2^21.
        Limbs may be relaxed up to ~2^15 + 2^7; 15-bit products fit uint32.

        TWO formulations, dispatched by backend at trace time:

        * TPU: explicit per-row accumulation (the schedule of the Pallas
          kernel body, kernels/limb_ops.py). The outer-product + pad/
          reshape "skew" formulation below is MISCOMPILED by XLA:TPU when
          jitted at batch >= 2^14 on v5e (shape-dependent: jit output
          differed from the op-by-op eager result; an optimization_barrier
          after the outer product did NOT fix 2^14). That silently
          corrupted every jitted XLA-path product at >= 2^14 - observed as
          wrong GLV split digits inside Pippenger, i.e. wrong >= 2^14
          PLONK commitments. The row form is also ~20% faster on TPU.
        * CPU (tests, dryruns): the compact skew formulation - it is
          correct there, and its ~15-op graph compiles an order of
          magnitude faster on XLA:CPU than the 1000-op row graph.

        On TPU the row form is only needed at batch >= 2^13 (the
        miscompile was observed at 2^14; 2^13 verified correct with skew;
        one factor-2 safety margin). Small batches - e.g. the (1,)-point
        window combines inside Pippenger - keep the compact skew graph,
        which keeps whole-program HLO counts (and so XLA compile times)
        sane.
        """
        nelems = 1
        for d in a.shape[1:]:
            nelems *= d
        if jax.default_backend() == "tpu" and nelems >= (1 << 13):
            cols: list = [None] * (2 * L)

            def acc(k, v):
                cols[k] = v if cols[k] is None else cols[k] + v

            for i in range(L):
                ai = a[i]
                for j in range(L):
                    prod = ai * b[j]
                    acc(i + j, prod & LIMB_MASK)
                    acc(i + j + 1, prod >> LIMB_BITS)
            return jnp.stack(cols)
        outer = a[:, None] * b[None, :]  # (L, L, *batch)
        lo = cls._skew_sum(outer & LIMB_MASK)  # (2L-1, *batch)
        hi = cls._skew_sum(outer >> LIMB_BITS)
        pad_cfg = ((0, 0),) * (lo.ndim - 1)
        return jnp.pad(lo, ((0, 1),) + pad_cfg) + jnp.pad(hi, ((1, 0),) + pad_cfg)

    @classmethod
    def _low_product_cols(cls, a, b_limbs_const):
        """Columns 0..L-1 of a * b (exact mod 2^270), b a host constant
        (zero limbs skipped at trace time). Same backend dispatch rationale
        as _wide_product_cols."""
        nelems = 1
        for d in a.shape[1:]:
            nelems *= d
        if jax.default_backend() != "tpu" or nelems < (1 << 13):
            batch = a.shape[1:]
            b = jnp.asarray(b_limbs_const.reshape((L,) + (1,) * len(batch)))
            return cls._wide_product_cols(
                a, jnp.broadcast_to(b, (L, *batch))
            )[:L]
        cols: list = [None] * L
        consts = [int(v) for v in b_limbs_const]
        for i in range(L):
            ai = a[i]
            for j in range(L - i):
                cj = consts[j]
                if cj == 0:
                    continue
                prod = ai * jnp.uint32(cj)
                k = i + j
                lo = prod & LIMB_MASK
                cols[k] = lo if cols[k] is None else cols[k] + lo
                if k + 1 < L:
                    hi = prod >> LIMB_BITS
                    cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        zero = jnp.zeros_like(a[0])
        return jnp.stack([c if c is not None else zero for c in cols])

    @classmethod
    def _wide_product_cols_const(cls, a, b_limbs_const):
        """All 2L columns of a * b, b a host-constant limb list (used for
        the m*p reduction product so no broadcast operand enters the
        graph - see the miscompile note on _wide_product_cols)."""
        nelems = 1
        for d in a.shape[1:]:
            nelems *= d
        if jax.default_backend() != "tpu" or nelems < (1 << 13):
            batch = a.shape[1:]
            b = jnp.asarray(
                jnp.asarray(b_limbs_const).reshape((L,) + (1,) * len(batch))
            )
            return cls._wide_product_cols(a, jnp.broadcast_to(b, (L, *batch)))
        cols: list = [None] * (2 * L)
        consts = [int(v) for v in b_limbs_const]
        for i in range(L):
            ai = a[i]
            for j in range(L):
                cj = consts[j]
                if cj == 0:
                    continue
                prod = ai * jnp.uint32(cj)
                k = i + j
                lo = prod & LIMB_MASK
                hi = prod >> LIMB_BITS
                cols[k] = lo if cols[k] is None else cols[k] + lo
                cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
        zero = jnp.zeros_like(a[0])
        return jnp.stack([c if c is not None else zero for c in cols])

    @staticmethod
    def _carry_pass(cols):
        """One relaxation pass: limbs -> < 2^15 + small carry. Value preserved."""
        lo = cols & LIMB_MASK
        hi = cols >> LIMB_BITS
        shifted = jnp.concatenate(
            [jnp.zeros_like(hi[:1]), hi], axis=0
        )  # carry into next column; top carry appended as a fresh column
        return jnp.concatenate([lo, jnp.zeros_like(lo[:1])], axis=0) + shifted

    def _pallas_ok(self, a) -> bool:
        from .. import config

        return (
            config.use_pallas()
            and a.ndim == 2
            and a.shape[1] >= config.PALLAS_MIN_BATCH
        )

    @staticmethod
    def _flat2d(op, a, b=None):
        """Run op on batch-flattened (L, prod(batch)) views, restore shape.

        XLA:TPU v5e miscompiles fused field ops on multi-axis batches at
        large sizes (observed: neg on (18, 14, 65536) produced wrong values
        on ~all lanes inside the precomputed-MSM prep graph while the same
        data as (18, 917504) was correct - the same defect class as the
        wide-product and broadcast-mul miscompiles worked around elsewhere
        in this file). Every validated hot path is 2-D, so all public ops
        canonicalize; this also routes multi-axis batches onto the Pallas
        kernels, which require 2-D."""
        shape = a.shape
        flat_a = a.reshape(shape[0], -1)
        if b is None:
            return op(flat_a).reshape(shape)
        return op(flat_a, b.reshape(shape[0], -1)).reshape(shape)

    @staticmethod
    def _materialize_broadcast(a, b):
        """Broadcast operands to a common batch shape and MATERIALIZE the
        expansion behind an optimization barrier.

        XLA:TPU miscompiles the (18, 1) -> (18, n) implicit broadcast when
        fused into the Montgomery product at n >= 2^14 (observed on v5e:
        every lane wrong for jit(mont_mul)(a, scalar_arr) at 16384+ while
        pre-materialized full-shape inputs are correct; fusion-dependent).
        Challenge scalars enter every prover phase in exactly this shape,
        so the materialization is forced centrally here."""
        if a.shape == b.shape:
            return a, b
        target = jnp.broadcast_shapes(a.shape, b.shape)
        if a.shape != target:
            a = jax.lax.optimization_barrier(jnp.broadcast_to(a, target))
        if b.shape != target:
            b = jax.lax.optimization_barrier(jnp.broadcast_to(b, target))
        return a, b

    def mont_mul(self, a, b):
        """Montgomery product a * b * 2^-270 mod p, canonical output.

        One-shot reduction (vs the reference's interleaved CIOS,
        fields/field_impl_asm.tcc:305): m = T*(-p^-1) mod 2^270, then
        (T + m*p) / 2^270, conditional subtract.
        """
        a, b = self._materialize_broadcast(a, b)
        if a.ndim > 2:
            return self._flat2d(self.mont_mul, a, b)
        if self._pallas_ok(a) and b.shape == a.shape:
            from ..kernels import field_kernels

            return field_kernels.mont_mul(self.params, a, b)
        t = self._wide_product_cols(a, b)  # (36,) cols < 2^22
        t = self._carry_pass(t)  # (37,) limbs <= 2^15 + 2^7
        m = self._low_product_cols(t[:L], self._nprime_limbs)
        m = self._carry_pass(m)[:L]  # drop overflow col: mod 2^270
        u = self._wide_product_cols_const(m, self._p_limbs)
        s = jnp.concatenate([u, jnp.zeros_like(u[:1])], axis=0) + t  # (37,)
        # Exact division by 2^270: low 18 normalized digits are zero, so only
        # the (multi-bit) carry out of column 17 survives - normalize the low
        # columns to 19 digits and take digit 18 plus its lookahead carries.
        lo_ext = self._ripple_with_carry(s[:L])
        hi = s[L:]  # (19,) columns
        hi = hi.at[0].add(lo_ext)
        r = self._ripple(hi, L)
        return self._cond_sub_p(r)

    @classmethod
    def _ripple_with_carry(cls, cols):
        """value(cols) >> (15 * len(cols)): the carry word out of the top of
        an L-column group (multi-bit; exact). Two spill columns make the
        local passes lossless for any column bound < 2^32."""
        k = cols.shape[0]
        zeros = jnp.zeros_like(cols[:1])
        x = jnp.concatenate([cols, zeros, zeros], axis=0)
        for _ in range(3):
            hi = x >> LIMB_BITS
            x = (x & LIMB_MASK) + jnp.concatenate(
                [jnp.zeros_like(hi[:1]), hi[:-1]], axis=0
            )
        g = x >> LIMB_BITS
        p = (x == LIMB_MASK).astype(jnp.uint32)
        carries = cls._carry_scan(g, p)
        cin = jnp.concatenate([jnp.zeros_like(carries[:1]), carries[:-1]], axis=0)
        digits = (x + cin) & LIMB_MASK
        return digits[k] + (digits[k + 1] << LIMB_BITS)

    def mul(self, a, b):
        return self.mont_mul(a, b)

    def sqr(self, a):
        return self.mont_mul(a, a)

    def mul_by_constant(self, a, value: int):
        """Multiply by a field *value* (host int) via one mont_mul."""
        c = self.const(value)
        return self.mont_mul(a, self.full(a.shape[1:], c))

    # ------------------------------------------------------------------
    # Montgomery form conversion (external R = 2^256 semantics)
    # ------------------------------------------------------------------
    def to_montgomery_form(self, a):
        """Matches reference __to_montgomery_form: treats input as a raw
        integer and multiplies in R=2^256. Internally: a * 2^270 relation is
        maintained by the 2^14-shift homomorphism."""
        return self.mont_mul(a, self.full(a.shape[1:], self._to_internal_raw()))

    def from_montgomery_form(self, a):
        return self.mont_mul(a, self.full(a.shape[1:], self._one_raw()))

    @functools.lru_cache(maxsize=None)
    def _to_internal_raw(self):
        # Raw integer x (encoded as limbs of x<<14) to internal mont form is
        # x * 2^270: need factor f with x*2^14 * f * 2^-270 = x * 2^270 * 2^14
        # i.e. f = 2^526 mod p... kept simple: value-level factor R_int*R_ext.
        return jnp.asarray(
            int_to_limbs((R_INTERNAL * R_EXTERNAL) % self.p)
        )

    @functools.lru_cache(maxsize=None)
    def _one_raw(self):
        # from_montgomery: multiply by 1 (raw) => encode_montgomery(1) = 2^14.
        return jnp.asarray(int_to_limbs(1 << 14))

    def to_plain(self, a):
        """Internal-Montgomery -> plain canonical limbs of the *value*
        (for bit extraction: scalar digits, wnaf, serialization)."""
        one_plain = jnp.asarray(int_to_limbs(1))
        return self.mont_mul(a, self.full(a.shape[1:], one_plain))

    # ------------------------------------------------------------------
    # Predicates
    # ------------------------------------------------------------------
    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=0)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=0)

    def select(self, mask, a, b):
        """mask (*batch,) bool: where(mask, a, b)."""
        return jnp.where(mask[None], a, b)

    # ------------------------------------------------------------------
    # Exponentiation and inversion
    # ------------------------------------------------------------------
    def pow_static(self, a, exponent: int):
        """a^exponent for a host-known integer exponent (square & multiply
        via lax.scan over the exponent bits, MSB first). Jit-compiled when
        called eagerly - an eager 254-step scan dispatches every primitive
        separately."""
        if not isinstance(a, jax.core.Tracer):
            key = (exponent, a.shape)
            fn = self._pow_jit_cache.get(key)
            if fn is None:
                fn = jax.jit(functools.partial(self._pow_static_impl, exponent=exponent))
                self._pow_jit_cache[key] = fn
            return fn(a)
        return self._pow_static_impl(a, exponent=exponent)

    def _pow_static_impl(self, a, exponent: int):
        if exponent == 0:
            return self.full(a.shape[1:], self.one)
        nbits = exponent.bit_length()
        bits = jnp.asarray(
            [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=jnp.uint32,
        )
        one = self.full(a.shape[1:], self.one)

        def body(acc, bit):
            acc = self.sqr(acc)
            acc = jnp.where(bit > 0, self.mont_mul(acc, a), acc)
            return acc, None

        # First bit is always 1: start from a to save one mul.
        acc, _ = jax.lax.scan(body, a, bits[1:])
        del one
        result = acc
        return self.select(self.is_zero(a), a, result)

    def invert(self, a):
        """Fermat inversion a^(p-2); maps 0 -> 0 (reference pow semantics,
        fields/field.hpp:345)."""
        return self.pow_static(a, self.p - 2)

    def sqrt(self, a):
        """a^((p+1)/4) - valid for p = 3 mod 4 (true for BN254 Fq, which is
        the only field the reference takes square roots in: hash_to_curve,
        groups/group.hpp:73-114). Use sqrt_host for p = 1 mod 4."""
        if self.p % 4 != 3:
            raise NotImplementedError(
                f"device sqrt requires p = 3 mod 4; use sqrt_host for {self.params.name}"
            )
        return self.pow_static(a, (self.p + 1) // 4)

    def sqrt_host(self, value: int) -> int | None:
        """Tonelli-Shanks on host ints; returns None for non-residues."""
        p = self.p
        value %= p
        if value == 0:
            return 0
        if pow(value, (p - 1) // 2, p) != 1:
            return None
        if p % 4 == 3:
            return pow(value, (p + 1) // 4, p)
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        z = 2
        while pow(z, (p - 1) // 2, p) != p - 1:
            z += 1
        m, c, t, r = s, pow(z, q, p), pow(value, q, p), pow(value, (q + 1) // 2, p)
        while t != 1:
            i, t2 = 0, t
            while t2 != 1:
                t2 = t2 * t2 % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m, c = i, b * b % p
            t, r = t * c % p, r * b % p
        return r

    def batch_invert(self, a, axis: int = 1):
        """Montgomery batch inversion along a batch axis (reference
        fields/field.hpp:503-522). Zero entries map to garbage (as reference);
        callers mask them out."""
        from ..utils.scans import hillis_scan

        mul = self.mont_mul
        prefix = hillis_scan(mul, a, axis=axis)
        n = a.shape[axis]
        total = jax.lax.index_in_dim(prefix, n - 1, axis=axis, keepdims=False)
        total_inv = self.invert(total)
        suffix = hillis_scan(mul, a, axis=axis, reverse=True)
        # optimization_barrier: without it XLA:TPU fuses the two scan loops
        # with the combine and miscompiles at n >= ~2^14 (observed: every
        # lane wrong at 16384, correct when intermediates are materialized)
        prefix, suffix, total_inv = jax.lax.optimization_barrier(
            (prefix, suffix, total_inv)
        )
        # inv_i = prefix_{i-1} * suffix_{i+1} * total_inv
        ones = jnp.broadcast_to(
            jnp.expand_dims(
                self.full(a.shape[1:axis] + a.shape[axis + 1 :], self.one),
                axis,
            ),
            jax.lax.slice_in_dim(a, 0, 1, axis=axis).shape,
        )
        pre = jnp.concatenate(
            [ones, jax.lax.slice_in_dim(prefix, 0, n - 1, axis=axis)], axis=axis
        )
        suf = jnp.concatenate(
            [jax.lax.slice_in_dim(suffix, 1, n, axis=axis), ones], axis=axis
        )
        out = mul(mul(pre, suf), jnp.expand_dims(total_inv, axis))
        return out

    # ------------------------------------------------------------------
    # Misc
    # ------------------------------------------------------------------
    def random_elements(self, n: int, rng: np.random.Generator) -> jnp.ndarray:
        """Seeded host-side sampling of canonical elements, internal form.
        (The reference uses getentropy, field.hpp:368; tests need
        reproducibility so we take an explicit numpy Generator.)"""
        vals = [int.from_bytes(rng.bytes(32), "little") % self.p for _ in range(n)]
        return self.encode(vals)

    def get_root_of_unity(self, degree: int) -> int:
        """Value of the 2^degree-th root of unity (reference
        field.hpp:487-497). Host int."""
        r = self.params.primitive_root
        for _ in range(self.params.primitive_root_log_size - degree):
            r = r * r % self.p
        return r
