"""Small-batch MSM: per-lane double-and-add + tree reduction.

The oracle-grade path (reference analog: g1::group_exponentiation_inner +
accumulation, used by test_scalar_multiplication.cpp:72 as the slow check).
For small N the bucketed Pippenger's sort/scan machinery costs more than it
saves - in compile time and in launch latency - so the prover dispatches
here below MSM_PIPPENGER_THRESHOLD points.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..groups import AffinePoints, JacobianPoints
from ..groups.g1 import g1
from .pippenger import SCALAR_BITS, pippenger, scalar_digits

MSM_PIPPENGER_THRESHOLD = 4096


@jax.jit
def naive_msm(scalars_mont: jnp.ndarray, points: AffinePoints) -> JacobianPoints:
    """sum_i scalars[i] * points[i] as one vectorized double-and-add over all
    lanes (254 steps), then a log-depth tree sum across lanes. Returns a
    JacobianPoints batch of shape (1,)."""
    bits = scalar_digits(scalars_mont, 1)  # (254, N) LSB-first
    bits = bits[::-1]  # MSB-first for scalar_mul_bits
    per_point = g1.scalar_mul_bits(points, bits)

    # tree reduction across the batch axis (pad to a power of two)
    n = per_point.x.shape[1]
    size = 1
    while size < n:
        size <<= 1
    if size != n:
        pad = g1.infinity((size - n,))
        per_point = JacobianPoints(
            jnp.concatenate([per_point.x, pad.x], axis=1),
            jnp.concatenate([per_point.y, pad.y], axis=1),
            jnp.concatenate([per_point.z, pad.z], axis=1),
            jnp.concatenate([per_point.inf, pad.inf], axis=0),
        )
    while size > 1:
        half = size // 2
        lo = JacobianPoints(
            per_point.x[:, :half], per_point.y[:, :half],
            per_point.z[:, :half], per_point.inf[:half],
        )
        hi = JacobianPoints(
            per_point.x[:, half:], per_point.y[:, half:],
            per_point.z[:, half:], per_point.inf[half:],
        )
        per_point = g1.add(lo, hi)
        size = half
    return per_point


def msm(scalars_mont: jnp.ndarray, points: AffinePoints) -> JacobianPoints:
    """Size-dispatching MSM (the analog of the reference's bucket-width
    heuristics, scalar_multiplication.cpp:21-81, extended downward)."""
    n = scalars_mont.shape[1]
    if n < MSM_PIPPENGER_THRESHOLD:
        return naive_msm(scalars_mont, points)
    return pippenger(scalars_mont, points)


@functools.partial(jax.jit, static_argnames=("c", "block", "use_pippenger"))
def _batched_msm_impl(scalars_b, px, py, pinf, c, block, use_pippenger):
    from .pippenger import _pippenger_impl

    points = AffinePoints(px, py, pinf)
    if use_pippenger:
        fn = lambda s: _pippenger_impl.__wrapped__(s, points, c, block)  # noqa: E731
    else:
        fn = lambda s: naive_msm.__wrapped__(s, points)  # noqa: E731
    return jax.vmap(fn)(scalars_b)


def batched_msm(scalars_list, points: AffinePoints) -> JacobianPoints:
    """B MSMs over the same point set as one device call (the reference's
    batched_scalar_multiplications rationale, scalar_multiplication.cpp:
    650-772: the prover commits wire/quotient groups together). Returns a
    JacobianPoints batch of shape (B,)."""
    from .pippenger import optimal_window

    b = len(scalars_list)
    stacked = jnp.stack(scalars_list)  # (B, 18, n)
    n = stacked.shape[2]
    use_pip = n >= MSM_PIPPENGER_THRESHOLD
    c = optimal_window(n) if use_pip else 0
    block = min(128, max(16, 2 * n)) if use_pip else 0
    out = _batched_msm_impl(
        stacked, points.x, points.y, points.inf, c, block, use_pip
    )
    # vmap output coords: (B, 18, 1) -> (18, B)
    return JacobianPoints(
        out.x[:, :, 0].T, out.y[:, :, 0].T, out.z[:, :, 0].T, out.inf[:, 0]
    )
