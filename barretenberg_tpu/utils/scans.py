"""Loop-based parallel scans.

jax.lax.associative_scan UNROLLS ~2*log2(n) instances of the combine
function into the compiled graph. With an 18-limb Montgomery multiply as
the combiner that is thousands of HLO ops per instance - the dominant XLA
compile cost of round 2 (the 2^19 twiddle-table scan alone compiled for
minutes through the remote-TPU tunnel). These Hillis-Steele formulations
keep exactly ONE combiner instance inside a lax.fori_loop body; they do
n*log(n) work instead of associative_scan's 2n, which is irrelevant here -
every caller is HBM-bound, not FLOP-bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hillis_scan(mul_fn, a: jnp.ndarray, axis: int, reverse: bool = False):
    """Inclusive prefix (suffix if reverse) product along `axis`.
    Semantics match jax.lax.associative_scan(mul_fn, a, axis, reverse)."""
    n = a.shape[axis]
    if n == 1:
        return a
    steps = (n - 1).bit_length()
    shape = [1] * a.ndim
    shape[axis] = n
    j = jnp.arange(n, dtype=jnp.int32).reshape(shape)

    def step(i, x):
        d = jnp.int32(1) << i
        shifted = jnp.roll(x, -d if reverse else d, axis=axis)
        valid = (j < n - d) if reverse else (j >= d)
        return jnp.where(valid, mul_fn(x, shifted), x)

    return jax.lax.fori_loop(0, steps, step, a)


def affine_scan(mul_fn, add_fn, m: jnp.ndarray, b: jnp.ndarray, axis: int):
    """Inclusive scan of the affine recurrence d_i = m_i * d_{i-1} + b_i
    (d_0 = b_0): returns the d array. Combine rule (earlier f, later s):
    (m, b) = (m_s * m_f, m_s * b_f + b_s) - the Kate synthetic-division
    linear recurrence (reference polynomial_arithmetic.cpp:562-591)."""
    n = m.shape[axis]
    if n == 1:
        return b
    steps = (n - 1).bit_length()
    shape = [1] * m.ndim
    shape[axis] = n
    j = jnp.arange(n, dtype=jnp.int32).reshape(shape)

    def step(i, carry):
        mm, bb = carry
        d = jnp.int32(1) << i
        pm = jnp.roll(mm, d, axis=axis)
        pb = jnp.roll(bb, d, axis=axis)
        valid = j >= d
        nm = mul_fn(mm, pm)
        nb = add_fn(mul_fn(mm, pb), bb)
        return (jnp.where(valid, nm, mm), jnp.where(valid, nb, bb))

    _, d_out = jax.lax.fori_loop(0, steps, step, (m, b))
    return d_out
