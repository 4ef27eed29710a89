"""Mesh-sharded radix-2 FFT over Fr: Bailey/4-step decomposition.

Replaces the reference's thread-partitioned butterfly ranges
(reference: polynomials/polynomial_arithmetic.cpp:129-264) with the
transpose-based formulation that fits a device mesh (SURVEY.md section 7):

  N = N1 * N2, input x in natural order, contiguously sharded over D devices.
    1. all_to_all -> shard over columns n2 (each device holds all rows n1);
    2. local length-N1 FFTs over n1 (vectorized over the local n2 columns);
    3. twiddle by w_N^(k1 * n2);
    4. all_to_all -> shard over k1;
    5. local length-N2 FFTs over n2;
    6. all_to_all + local transpose -> natural order, contiguously sharded.

Only the three all_to_alls cross chips; every butterfly is chip-local. This
is the SP/CP analog for this workload: the scaling dimension is polynomial
degree, exchanged across the mesh between local FFT phases.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fields import fr
from ..polynomials.domain import EvaluationDomain, get_domain

shard_map = jax.shard_map


def _fft_local(x: jnp.ndarray, domain: EvaluationDomain, inverse: bool):
    """Batched DIT FFT along the last axis. x: (18, B, n) -> (18, B, n).
    One fori_loop'd stage kernel (polynomials/fft.fft_stages)."""
    n = domain.size
    if n == 1:
        return x
    table = domain.inverse_twiddles if inverse else domain.twiddles
    x = jnp.take(x, domain.bit_reverse_indices, axis=2)
    from ..polynomials.fft import fft_stages

    return fft_stages(x, table, domain.log2_size)


def _split_sizes(n: int, d: int) -> tuple[int, int]:
    """Balanced N1*N2 = n with both divisible by d."""
    log_n = n.bit_length() - 1
    log_d = d.bit_length() - 1
    log_n1 = max(log_d, (log_n + 1) // 2)
    n1 = 1 << log_n1
    n2 = n // n1
    if n1 % d or n2 % d:
        raise ValueError(f"FFT size {n} not shardable over {d} devices")
    return n1, n2


@functools.partial(
    jax.jit,
    static_argnames=("size", "mesh", "axis_name", "inverse", "coset", "constant"),
)
def _sharded_fft_impl(
    coeffs: jnp.ndarray,
    size: int,
    mesh,
    axis_name: str,
    inverse: bool,
    coset: bool,
    constant: int | None,
):
    n = size
    d = mesh.shape[axis_name]
    n1, n2 = _split_sizes(n, d)
    domain = get_domain(n)
    dom1 = get_domain(n1)
    dom2 = get_domain(n2)

    # Host-int scale folded into the coset/constant pre/post scaling, matching
    # the wrapper semantics in polynomials/fft.py.
    pre_value = 1 if (inverse or constant is None) else constant
    post_value = 1
    if inverse:
        post_value = domain.domain_inverse
        if constant is not None:
            post_value = post_value * constant % fr.p

    def local_fn(x):
        # x: (18, n/d) contiguous chunk of natural-order coefficients
        axis_idx = jax.lax.axis_index(axis_name)
        if coset and not inverse:
            chunk = jax.lax.dynamic_slice_in_dim(
                domain.coset_scale, axis_idx * (n // d), n // d, axis=1
            )
            if pre_value != 1:
                chunk = fr.mul_by_constant(chunk, pre_value)
            x = fr.mont_mul(x, chunk)
        elif pre_value != 1:
            x = fr.mul_by_constant(x, pre_value)
        # view as rows of the (N1, N2) matrix: n = n2 + N2*n1 -> x[n1, n2]
        x = x.reshape(18, n1 // d, n2)
        # shard over n2 instead (all rows local)
        x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
        # local FFT over n1 for each of our n2 columns
        x = jnp.swapaxes(x, 1, 2)  # (18, n2/d, n1)
        x = _fft_local(x, dom1, inverse)
        x = jnp.swapaxes(x, 1, 2)  # (18, n1, n2/d) -> Y[k1, n2]
        # twiddle w_N^(+-k1*n2) via the two-level sqrt-size tables (no
        # full-N table replication; VERDICT r2 weak #6)
        k1 = jnp.arange(n1, dtype=jnp.uint32)[:, None]
        n2_idx = axis_idx * (n2 // d) + jnp.arange(n2 // d, dtype=jnp.uint32)[None, :]
        e = (k1 * n2_idx) % jnp.uint32(n)
        x = fr.mont_mul(x, domain.power_lookup(e, inverse=inverse))
        # shard over k1
        x = jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)
        # (18, n1/d, n2): local FFT over n2 -> Z[k1, k2]
        x = _fft_local(x, dom2, inverse)
        # back to natural order X[k1 + N1*k2], contiguously sharded over k2
        x = jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)
        # (18, n1, n2/d) -> transpose -> flat chunk over k = k1 + N1*k2
        x = jnp.swapaxes(x, 1, 2).reshape(18, n // d)
        if post_value != 1:
            x = fr.mul_by_constant(x, post_value)
        if coset and inverse:
            chunk = jax.lax.dynamic_slice_in_dim(
                domain.coset_scale_inverse, axis_idx * (n // d), n // d, axis=1
            )
            x = fr.mont_mul(x, chunk)
        return x

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(None, axis_name),
        check_vma=False,
    )
    return fn(coeffs)


def _warm(n: int, d: int, inverse: bool, coset: bool) -> None:
    """Materialize all domain tables outside any trace (see
    EvaluationDomain.warm_tables)."""
    n1, n2 = _split_sizes(n, d)
    for sz in (n, n1, n2):
        get_domain(sz).warm_tables(inverse=inverse, coset=coset)
    dom = get_domain(n)
    _ = dom.two_level_tables_inverse if inverse else dom.two_level_tables


def sharded_fft(coeffs, mesh, axis_name: str = "shards", constant: int | None = None):
    """Forward FFT of natural-order coefficients sharded over the mesh.
    coeffs: (18, N) Fr limb array (global view under jit)."""
    _warm(coeffs.shape[1], mesh.shape[axis_name], False, False)
    return _sharded_fft_impl(
        coeffs, coeffs.shape[1], mesh, axis_name, False, False, constant
    )


def sharded_ifft(evals, mesh, axis_name: str = "shards", constant: int | None = None):
    _warm(evals.shape[1], mesh.shape[axis_name], True, False)
    return _sharded_fft_impl(
        evals, evals.shape[1], mesh, axis_name, True, False, constant
    )


def sharded_coset_fft(
    coeffs,
    mesh,
    axis_name: str = "shards",
    inverse: bool = False,
    constant: int | None = None,
):
    """Coset FFT/IFFT (polynomial_arithmetic.cpp:283 semantics) on the mesh."""
    _warm(coeffs.shape[1], mesh.shape[axis_name], inverse, True)
    return _sharded_fft_impl(
        coeffs, coeffs.shape[1], mesh, axis_name, inverse, True, constant
    )
