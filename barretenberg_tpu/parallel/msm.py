"""Mesh-sharded multi-scalar multiplication.

The DP axis of this workload (SURVEY.md section 7): points and scalars are
contiguously sharded over the mesh, each device runs a chip-local MSM over
its shard (the same sort+segment-scan Pippenger as single-chip), and the
per-device partial sums - one Jacobian point each - are combined with an
all_gather plus a log-depth local tree add. This mirrors the reference's
thread-batched MSM (reference: curves/bn254/scalar_multiplication.cpp:650-772:
per-thread sub-Pippenger, then tree add + batch_normalize) with chips in
place of OpenMP threads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..groups import AffinePoints, JacobianPoints
from ..groups.g1 import g1
from ..msm.naive import MSM_PIPPENGER_THRESHOLD, naive_msm
from ..msm.pippenger import pippenger

shard_map = jax.shard_map


def _tree_add(points: JacobianPoints, size: int) -> JacobianPoints:
    """Log-depth pairwise reduction of a (size,) batch to (1,) - one
    compiled group-add instance (g1.tree_sum) regardless of size."""
    del size
    return g1.tree_sum(points)


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name"))
def sharded_msm_batched(
    scalars_b: jnp.ndarray,
    points: AffinePoints,
    mesh,
    axis_name: str = "shards",
) -> JacobianPoints:
    """B MSMs over the same point set, points sharded over the mesh: ONE
    shard_map call (the mesh analog of batched_scalar_multiplications,
    scalar_multiplication.cpp:650-772, which the round-2 prover degraded
    to a Python loop of single sharded MSMs).

    scalars_b: (18, B, N) internal-Montgomery Fr. Returns a replicated
    (B,)-batch of Jacobian points.
    """
    d = mesh.shape[axis_name]
    _, b, n = scalars_b.shape
    if n % d:
        raise ValueError(f"MSM size {n} not divisible by {d} devices")

    def local_fn(s, px, py, pinf):
        local_n = s.shape[2]
        pts = AffinePoints(px, py, pinf)
        # full per-shard Pippenger, vmapped over the B scalar sets: ONE
        # traced graph (not B inlined copies), so the compiled size stays
        # constant while each batch gets the O(n/log n) kernel - the mesh
        # analog of the per-thread sub-Pippengers in
        # batched_scalar_multiplications (scalar_multiplication.cpp:650-772).
        if local_n < MSM_PIPPENGER_THRESHOLD:
            one = lambda s2: naive_msm(s2, pts)
        else:
            one = lambda s2: pippenger(s2, pts)
        vp = jax.vmap(one, in_axes=1)(s)  # leading batch axis b
        part = JacobianPoints(
            jnp.moveaxis(vp.x, 0, 1),  # (18, b, 1)
            jnp.moveaxis(vp.y, 0, 1),
            jnp.moveaxis(vp.z, 0, 1),
            vp.inf,  # (b, 1)
        )
        gx = jax.lax.all_gather(part.x, axis_name, axis=2, tiled=True)
        gy = jax.lax.all_gather(part.y, axis_name, axis=2, tiled=True)
        gz = jax.lax.all_gather(part.z, axis_name, axis=2, tiled=True)
        ginf = jax.lax.all_gather(part.inf, axis_name, axis=1, tiled=True)
        total = g1.tree_sum(JacobianPoints(gx, gy, gz, ginf))  # (18, b, 1)
        return JacobianPoints(
            total.x[:, :, 0], total.y[:, :, 0], total.z[:, :, 0],
            total.inf[:, 0],
        )

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, None, axis_name),
            P(None, axis_name),
            P(None, axis_name),
            P(axis_name),
        ),
        out_specs=JacobianPoints(
            P(None, None), P(None, None), P(None, None), P(None)
        ),
        check_vma=False,
    )
    return fn(scalars_b, points.x, points.y, points.inf)


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name"))
def sharded_msm(
    scalars_mont: jnp.ndarray,
    points: AffinePoints,
    mesh,
    axis_name: str = "shards",
) -> JacobianPoints:
    """sum_i scalars[i] * points[i] over the mesh -> replicated (1,) batch.

    scalars_mont: (18, N) internal-Montgomery Fr; points: affine batch (N).
    N must divide evenly over the mesh axis; callers pad with infinity/zero.
    """
    d = mesh.shape[axis_name]
    n = scalars_mont.shape[1]
    if n % d:
        raise ValueError(f"MSM size {n} not divisible by {d} devices")
    local_n = n // d

    def local_fn(s, px, py, pinf):
        pts = AffinePoints(px, py, pinf)
        if local_n < MSM_PIPPENGER_THRESHOLD:
            part = naive_msm(s, pts)
        else:
            part = pippenger(s, pts)
        # gather the D one-point partials and tree-add locally (replicated)
        gx = jax.lax.all_gather(part.x, axis_name, axis=1, tiled=True)
        gy = jax.lax.all_gather(part.y, axis_name, axis=1, tiled=True)
        gz = jax.lax.all_gather(part.z, axis_name, axis=1, tiled=True)
        ginf = jax.lax.all_gather(part.inf, axis_name, axis=0, tiled=True)
        return _tree_add(JacobianPoints(gx, gy, gz, ginf), d)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(None, axis_name),
            P(None, axis_name),
            P(None, axis_name),
            P(axis_name),
        ),
        out_specs=JacobianPoints(P(None, None), P(None, None), P(None, None), P(None)),
        # constants built inside (infinity accumulators, digit tables) are
        # unvarying; skip the varying-manual-axes strictness check
        check_vma=False,
    )
    return fn(scalars_mont, points.x, points.y, points.inf)
