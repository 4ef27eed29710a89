"""Pallas kernel coverage via interpret mode.

The Pallas kernels are the TPU performance path (the analog of the
reference's asm field backend, fields/field_impl_asm.tcc); CI runs them in
interpret mode on CPU and checks exact parity against the XLA path - the
reference's fast-vs-portable oracle pattern (DISABLE_SHENANIGANS,
field.hpp:527-531)."""

import jax.numpy as jnp
import numpy as np
import pytest

from barretenberg_tpu import config
from barretenberg_tpu.fields import fq, fr
from barretenberg_tpu.groups import JacobianPoints
from barretenberg_tpu.groups.g1 import g1, random_affine_points

N = 1024  # one full pallas tile


@pytest.fixture(autouse=True)
def interpret_mode():
    config.set_use_pallas(True)
    config.set_pallas_interpret(True)
    yield
    config.set_use_pallas(None)
    config.set_pallas_interpret(False)


def _xla_only():
    """Context: force the XLA path for oracle computation."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        config.set_use_pallas(False)
        try:
            yield
        finally:
            config.set_use_pallas(True)

    return ctx()


class TestFieldKernels:
    @pytest.mark.parametrize("field", [fq, fr], ids=["fq", "fr"])
    def test_mont_mul_add_sub_parity(self, field):
        rng = np.random.default_rng(5)
        a = field.random_elements(N, rng)
        b = field.random_elements(N, rng)
        got_mul = field.mont_mul(a, b)
        got_add = field.add(a, b)
        got_sub = field.sub(a, b)
        with _xla_only():
            want_mul = field.mont_mul(a, b)
            want_add = field.add(a, b)
            want_sub = field.sub(a, b)
        assert jnp.array_equal(got_mul, want_mul)
        assert jnp.array_equal(got_add, want_add)
        assert jnp.array_equal(got_sub, want_sub)

    def test_edge_values(self):
        vals_a = [0, 1, fq.p - 1, fq.p - 1] + [7] * (N - 4)
        vals_b = [0, 1, fq.p - 1, 1] + [9] * (N - 4)
        a, b = fq.encode(vals_a), fq.encode(vals_b)
        got = fq.decode(fq.mont_mul(a, b))
        assert got[:4] == [0, 1, (fq.p - 1) ** 2 % fq.p, fq.p - 1]


class TestPointKernels:
    def test_dbl_add_mixed_add_parity(self):
        rng = np.random.default_rng(6)
        pts_a = random_affine_points(N, rng)
        pts_b = random_affine_points(N, rng)
        # exercise infinity lanes and the P==Q doubling case
        pts_b = pts_b._replace(inf=pts_b.inf.at[0].set(True))
        pts_b = pts_b._replace(
            x=pts_b.x.at[:, 1].set(pts_a.x[:, 1]),
            y=pts_b.y.at[:, 1].set(pts_a.y[:, 1]),
        )
        ja = g1.to_jacobian(pts_a)
        jb = g1.to_jacobian(pts_b)
        got_dbl = g1.dbl(ja)
        got_add = g1.add(ja, jb)
        got_mixed = g1.mixed_add(ja, pts_b)
        with _xla_only():
            want_dbl = g1.dbl(ja)
            want_add = g1.add(ja, jb)
            want_mixed = g1.mixed_add(ja, pts_b)
        for got, want in (
            (got_dbl, want_dbl),
            (got_add, want_add),
            (got_mixed, want_mixed),
        ):
            assert jnp.array_equal(got.x, want.x)
            assert jnp.array_equal(got.y, want.y)
            assert jnp.array_equal(got.z, want.z)
            assert jnp.array_equal(got.inf, want.inf)
