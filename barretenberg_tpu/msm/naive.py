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
    return g1.tree_sum(per_point)


def msm(scalars_mont: jnp.ndarray, points: AffinePoints) -> JacobianPoints:
    """Size-dispatching MSM (the analog of the reference's bucket-width
    heuristics, scalar_multiplication.cpp:21-81, extended downward)."""
    n = scalars_mont.shape[1]
    if n < MSM_PIPPENGER_THRESHOLD:
        return naive_msm(scalars_mont, points)
    return pippenger(scalars_mont, points)


@functools.partial(jax.jit, static_argnames=("b",))
def _batched_naive_impl(scalars_cat, px, py, pinf, b):
    """B MSMs via ONE concatenated double-and-add sweep: per-point products
    over (18, B*n) lanes, then a per-group tree reduction. Reuses the
    unbatched kernel structure - vmapping the scan instead made XLA compile
    times explode."""
    n = scalars_cat.shape[1] // b
    points = AffinePoints(
        jnp.tile(px, (1, b)), jnp.tile(py, (1, b)), jnp.tile(pinf, b)
    )
    bits = scalar_digits(scalars_cat, 1)[::-1]
    per_point = g1.scalar_mul_bits(points, bits)
    # (18, B, n) -> tree-sum the n axis per group
    pts = JacobianPoints(
        per_point.x.reshape(18, b, n),
        per_point.y.reshape(18, b, n),
        per_point.z.reshape(18, b, n),
        per_point.inf.reshape(b, n),
    )
    out = g1.tree_sum(pts)
    return JacobianPoints(
        out.x[:, :, 0], out.y[:, :, 0], out.z[:, :, 0], out.inf[:, 0]
    )


def batched_msm(scalars_list, points: AffinePoints) -> JacobianPoints:
    """B MSMs over the same point set (the reference's
    batched_scalar_multiplications rationale, scalar_multiplication.cpp:
    650-772: the prover commits wire/quotient groups together). Small sizes
    fuse into one concatenated device call; large sizes reuse the single
    compiled Pippenger graph per group. Returns a (B,) JacobianPoints batch.
    """
    b = len(scalars_list)
    n = scalars_list[0].shape[1]
    if n < MSM_PIPPENGER_THRESHOLD:
        cat = jnp.concatenate(scalars_list, axis=1)
        return _batched_naive_impl(cat, points.x, points.y, points.inf, b)
    outs = [pippenger(s, points) for s in scalars_list]
    return JacobianPoints(
        jnp.concatenate([o.x for o in outs], axis=1),
        jnp.concatenate([o.y for o in outs], axis=1),
        jnp.concatenate([o.z for o in outs], axis=1),
        jnp.concatenate([o.inf for o in outs], axis=0),
    )
