"""GLV scalar splitting + signed fixed-window digits, on device.

Replaces the reference's per-scalar integer bit-twiddling
(reference: fields/field.hpp:413-485 split_into_endomorphism_scalars,
groups/wnaf.hpp:38-55 fixed_wnaf) with vectorized limb arithmetic over the
whole scalar array - the split is ~10 limb-array ops total instead of a host
loop.

split_scalars: k -> (k1, k2) with k = k1 - k2*lambda (mod r), k1,k2 < 2^128.
The Babai-rounding mulhi uses the 2^270-aligned trick:
floor(g * k / 2^256) == floor((g << 14) * k / 2^270), and 270 = 18 limbs
exactly, so the high half of the 36-column product IS the quotient.

signed_digits: c-bit windows with borrow recoding, digits in
[-2^(c-1), 2^(c-1)), so Pippenger needs only 2^(c-1) buckets and
ceil(128/c)+1 rounds instead of ceil(254/c) unsigned ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import fr
from ..fields.params import (
    GLV_B2,
    GLV_G1,
    GLV_G2,
    GLV_MINUS_B1,
    LIMB_BITS,
    LIMB_MASK,
    NUM_LIMBS,
)
from ..fields.limbs import int_to_limbs

HALF_BITS = 128
HALF_LIMBS = -(-HALF_BITS // LIMB_BITS)  # 9 limbs cover 135 bits


def _broadcast_const(value: int, batch: int) -> jnp.ndarray:
    # optimization_barrier: materialize the broadcast. XLA:TPU miscompiles
    # the (18,1)->(18,n) implicit broadcast when fused into a limb product
    # at n >= 2^14 (v5e; the same defect fields/montgomery.py
    # _materialize_broadcast guards against - _mul_full calls the raw
    # product helpers, bypassing that central barrier). Observed here as
    # wrong GLV digits ONLY when split_scalars is inlined into a larger jit:
    # the 2^14 Pippenger (and therefore every >= 2^14 PLONK commitment)
    # silently produced a wrong MSM.
    return jax.lax.optimization_barrier(
        jnp.broadcast_to(
            jnp.asarray(int_to_limbs(value))[:, None], (NUM_LIMBS, batch)
        ).astype(jnp.uint32)
    )


def _mul_full(a, b):
    """Exact 36-limb product of two 18-limb plain values (carry-propagated)."""
    cols = fr._wide_product_cols(a, b)  # (36, N) relaxed
    return fr._ripple(cols, 2 * NUM_LIMBS)


def _mask_to_128(a):
    """Keep the low 128 bits of an 18-limb value."""
    n = a.shape[1]
    keep = a[:HALF_LIMBS]
    top_mask = (1 << (HALF_BITS - (HALF_LIMBS - 1) * LIMB_BITS)) - 1  # 8 bits
    keep = keep.at[HALF_LIMBS - 1].set(keep[HALF_LIMBS - 1] & jnp.uint32(top_mask))
    return jnp.concatenate(
        [keep, jnp.zeros((NUM_LIMBS - HALF_LIMBS, n), dtype=jnp.uint32)], axis=0
    )


def split_scalars(scalars_mont: jnp.ndarray):
    """(18, N) internal-Montgomery Fr -> (k1, k2) plain canonical limb arrays,
    each < 2^128, with k = k1 - k2*lambda (mod r)."""
    n = scalars_mont.shape[1]
    barrier = jax.lax.optimization_barrier
    # The barriers below pin every stage of the split: XLA:TPU fuses these
    # limb products into surrounding graphs and miscompiles at n >= 2^14
    # (v5e; wrong GLV digits ONLY when split_scalars is inlined into a
    # larger jit such as the Pippenger impl - every >= 2^14 PLONK
    # commitment silently produced a wrong MSM). Same defect class as
    # fields/montgomery.py _materialize_broadcast.
    k = barrier(fr.to_plain(scalars_mont))

    c1 = barrier(_mul_full(k, _broadcast_const(GLV_G2 << 14, n))[NUM_LIMBS:])
    c2 = barrier(_mul_full(k, _broadcast_const(GLV_G1 << 14, n))[NUM_LIMBS:])
    # q1 = c1 * minus_b1, q2 = c2 * b2; both < 2^192, no masking needed
    q1 = barrier(_mul_full(c1, _broadcast_const(GLV_MINUS_B1, n))[:NUM_LIMBS])
    q2 = barrier(_mul_full(c2, _broadcast_const(GLV_B2, n))[:NUM_LIMBS])
    # t1 = q2 - q1 mod r (both < 2^192 < r, so one field sub suffices)
    t1 = barrier(fr.sub(q2, q1))
    # t2 = t1 * lambda + k mod r, via Montgomery with lambda<<270 folded in
    lam_enc = (fr.params.cube_root << 270) % fr.p
    t1_lam = fr.mont_mul(t1, _broadcast_const(lam_enc, n))
    t2 = barrier(fr.add(t1_lam, k))
    return _mask_to_128(t2), _mask_to_128(t1)


def _window(limbs, lo: int, c: int):
    """Extract bits [lo, lo+c) of an (18, N) limb array as (N,) uint32."""
    l0, sh = lo // LIMB_BITS, lo % LIMB_BITS
    d = limbs[l0] >> sh
    got = LIMB_BITS - sh
    j = 1
    while got < c and l0 + j < limbs.shape[0]:
        d = d | (limbs[l0 + j] << got)
        got += LIMB_BITS
        j += 1
    return d & jnp.uint32((1 << c) - 1)


def signed_digits_full(value, c: int, nbits: int = 254) -> jnp.ndarray:
    """(18, N) plain canonical value -> (rounds, N) int32 signed window
    digits over the FULL scalar width, LSB window first (used by the
    arbitrary-base windowed scalar mul, groups/group.py)."""
    nwin = -(-nbits // c)
    half_val = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    carry = jnp.zeros(value.shape[1], dtype=jnp.uint32)
    out = []
    for r in range(nwin):
        v = _window(value, r * c, c) + carry
        borrow = v >= half_val
        d = jnp.where(
            borrow,
            v.astype(jnp.int32) - full.astype(jnp.int32),
            v.astype(jnp.int32),
        )
        carry = borrow.astype(jnp.uint32)
        out.append(d)
    out.append(carry.astype(jnp.int32))
    return jnp.stack(out)


def signed_digits(half, c: int) -> jnp.ndarray:
    """(18, N) plain value < 2^128 -> (rounds, N) int32 signed window digits,
    LSB window first; digits in [-2^(c-1), 2^(c-1)]."""
    nwin = -(-HALF_BITS // c)
    half_val = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)
    carry = jnp.zeros(half.shape[1], dtype=jnp.uint32)
    out = []
    for r in range(nwin):
        v = _window(half, r * c, c) + carry
        borrow = v >= half_val
        d = jnp.where(borrow, v.astype(jnp.int32) - full.astype(jnp.int32), v.astype(jnp.int32))
        carry = borrow.astype(jnp.uint32)
        out.append(d)
    out.append(carry.astype(jnp.int32))  # final carry digit
    return jnp.stack(out)
