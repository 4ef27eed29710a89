"""Pippenger MSM vs naive oracle (reference:
test/test_scalar_multiplication.cpp:72-271 pattern: every fast-path variant
is checked against naive accumulation).

All tests share one (n, c, block) configuration so the CPU test run compiles
the MSM graph exactly once (cached in .jax_cache thereafter).
"""

import numpy as np
import pytest

from barretenberg_tpu.fields import fr
from barretenberg_tpu.groups.g1 import (
    jacobian_to_host,
    points_to_host,
    random_affine_points,
)
from barretenberg_tpu.msm import pippenger
from barretenberg_tpu.utils import host_curve

N, C, BLOCK = 64, 8, 16


@pytest.fixture(scope="module")
def points():
    return random_affine_points(N, np.random.default_rng(21))


def run(points, scalars):
    res = jacobian_to_host(pippenger(fr.encode(scalars), points, c=C, block=BLOCK))
    return res[0]


def test_pippenger_vs_oracle(points):
    rng = np.random.default_rng(31)
    scalars = [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]
    assert run(points, scalars) == host_curve.g1_msm(points_to_host(points), scalars)


def test_pippenger_edge_scalars(points):
    rng = np.random.default_rng(32)
    scalars = [0, 1, fr.p - 1, 2, 3, 0, fr.p - 1, 1] + [
        int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N - 8)
    ]
    assert run(points, scalars) == host_curve.g1_msm(points_to_host(points), scalars)


def test_pippenger_all_zero(points):
    res = pippenger(fr.encode([0] * N), points, c=C, block=BLOCK)
    assert bool(res.inf.all())


def test_pippenger_low_memory_matches(points):
    from barretenberg_tpu.msm.pippenger import pippenger_low_memory

    rng = np.random.default_rng(33)
    scalars = [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]
    res = jacobian_to_host(
        pippenger_low_memory(fr.encode(scalars), points, chunk=16, c=C)
    )[0]
    assert res == host_curve.g1_msm(points_to_host(points), scalars)


def test_pippenger_precomputed_matches(points):
    from barretenberg_tpu.msm.pippenger import (
        generate_pippenger_point_table,
        pippenger_precomputed,
    )

    rng = np.random.default_rng(34)
    scalars = [0, 1, fr.p - 1] + [
        int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N - 3)
    ]
    table = generate_pippenger_point_table(points, c=C)
    res = jacobian_to_host(
        pippenger_precomputed(fr.encode(scalars), table, block=BLOCK)
    )[0]
    assert res == host_curve.g1_msm(points_to_host(points), scalars)


def test_fused_matches_per_round(points):
    """The small-batch fused schedule (all rounds in one segment scan,
    msm/pippenger.py::_pippenger_fused_impl) and the per-round path must
    agree bit-for-bit; `run` above exercises fused (the N<=FUSED_MAX_N
    default) against the host oracle, this pins the two device paths to
    each other including edge scalars."""
    rng = np.random.default_rng(36)
    scalars = [0, 1, fr.p - 1, 2] + [
        int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N - 4)
    ]
    enc = fr.encode(scalars)
    fused = jacobian_to_host(pippenger(enc, points, c=C, block=BLOCK, fused=True))
    per_round = jacobian_to_host(
        pippenger(enc, points, c=C, block=BLOCK, fused=False)
    )
    assert fused == per_round


def test_batched_msm_matches(points):
    from barretenberg_tpu.msm import batched_msm

    rng = np.random.default_rng(35)
    groups = [
        [int.from_bytes(rng.bytes(32), "little") % fr.p for _ in range(N)]
        for _ in range(3)
    ]
    res = batched_msm([fr.encode(g) for g in groups], points)
    got = jacobian_to_host(res)
    want = [host_curve.g1_msm(points_to_host(points), g) for g in groups]
    assert got == want
