"""Radix-2 FFT over Fr, vectorized for TPU.

Replaces the reference's thread-partitioned butterfly loops
(reference: polynomial_arithmetic.cpp:129-264 fft_inner_parallel) with
whole-array stage transforms: bit-reverse gather once, then log2(n) stages
of reshaped butterflies. Twiddles for stage s are a strided slice of the
domain's single power table.

Every public entry point is jit-compiled per (domain, variant) - domains are
singletons (get_domain), so they are valid static arguments, and the host-int
scale constants are encoded to (18, 1) arrays so a new constant does not
trigger a recompile.

Conventions match the reference exactly: fft evaluates coefficients at
successive powers of the domain root (DIT, natural-order output); ifft uses
the inverse root and folds in 1/n; coset transforms pre/post-scale by the
multiplicative generator (polynomial_arithmetic.cpp:266-315).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import fr
from .domain import EvaluationDomain


def _use_bailey(domain: EvaluationDomain) -> bool:
    """Two-level (Bailey) FFT with the fused Pallas butterfly kernel: the
    performance path on TPU for sizes where the lane blocks tile (n1 and n2
    both >= 128, i.e. n >= 2^14)."""
    from .. import config

    return domain.size >= (1 << 14) and (
        config.use_pallas() or config.pallas_interpret()
    )


def _level_fft(x: jnp.ndarray, tws, bitrev) -> jnp.ndarray:
    """Radix-2 DIT FFT of length m along axis 1 of x (18, m, nb), one fused
    Pallas pass per stage (kernels/butterfly.py). Every butterfly moves
    blocks of nb >= 128 contiguous lanes, so there are no gathers or
    lane-granular rolls (the round-3 stage loop paid 3 HBM passes per stage
    for exactly those)."""
    from .. import config
    from ..kernels.butterfly import butterfly_stage

    interpret = config.pallas_interpret()
    _, m, nb = x.shape
    x = jnp.take(x, bitrev, axis=1)
    for s in range(m.bit_length() - 1):
        h = 1 << s
        x5 = x.reshape(18, m // (2 * h), 2, h, nb)
        x5 = butterfly_stage(fr.params, x5, tws[s], interpret)
        x = x5.reshape(18, m, nb)
    return x


def _bailey_core(coeffs: jnp.ndarray, domain: EvaluationDomain, inverse: bool):
    """n = n1*n2 two-level decomposition:
    X[k1 + n1*k2] = sum_i2 w_n2^(i2 k2) [ w_n^(i2 k1) sum_i1 A[i1][i2]
    w_n1^(i1 k1) ] for A[i1][i2] = coeffs[i1*n2 + i2]; the second-level
    output lands in natural order, so no final transpose. Matches the
    reference's evaluation convention (polynomial_arithmetic.cpp:129-264)."""
    bt = domain.bailey_tables(inverse)
    n1, n2 = bt["n1"], bt["n2"]
    x = coeffs.reshape(18, n1, n2)
    x = _level_fft(x, bt["tws1"], bt["bitrev1"])  # over i1
    x = fr.mont_mul(x.reshape(18, -1), bt["tmid"]).reshape(18, n1, n2)
    x = jnp.swapaxes(x, 1, 2)  # (18, n2, n1)
    x = _level_fft(x, bt["tws2"], bt["bitrev2"])  # over i2
    return x.reshape(18, domain.size)


def _fft_core(coeffs: jnp.ndarray, domain: EvaluationDomain, inverse: bool):
    """DIT radix-2 core as ONE lax.fori_loop over the log2(n) stages.

    The loop body is stage-generic: for position j at stage s (butterfly
    half-width h = 2^s) the partner values x[j+h] / x[j-h] are brought in
    with lane rotations, the twiddle w^((j mod h) * n/2^(s+1)) is one gather
    from the domain's single power table, and lo/hi results merge with a
    parity select. This keeps exactly ONE Montgomery-mul instance in the
    compiled graph regardless of n - the previous Python-unrolled stages
    compiled 20 separate mul graphs at n=2^20 (52s XLA compile on TPU,
    BENCH_DETAILS r2); structurally this is the same butterfly schedule as
    the reference's flattened loop (polynomial_arithmetic.cpp:180-260).
    """
    n = domain.size
    assert coeffs.shape == (coeffs.shape[0], n)
    if _use_bailey(domain):
        return _bailey_core(coeffs, domain, inverse)
    x = jnp.take(coeffs, domain.bit_reverse_indices, axis=1)
    if n == 1:
        return x
    table = domain.inverse_twiddles if inverse else domain.twiddles
    return fft_stages(x, table, domain.log2_size)


def fft_stages(x: jnp.ndarray, table: jnp.ndarray, log2n: int) -> jnp.ndarray:
    """The stage loop, batch-generic: x (18, *batch, n) already in
    bit-reversed order; table (18, n/2) twiddle powers. Shared by the
    single-chip core and the mesh FFT's local transforms."""
    n = x.shape[-1]
    j = jnp.arange(n, dtype=jnp.int32)
    lead = (1,) * (x.ndim - 2)

    def stage(s, x):
        half = jnp.int32(1) << s
        within = j & (half - 1)
        exp = within << (log2n - 1 - s)  # (j mod h) * (n >> (s+1)) < n/2
        tw = jnp.take(table, exp, axis=1).reshape((x.shape[0],) + lead + (n,))
        x_up = jnp.roll(x, -half, axis=-1)  # x[j + half] at position j
        x_dn = jnp.roll(x, half, axis=-1)  # x[j - half] at position j
        is_hi = ((j >> s) & 1) == 1
        # one mul serves both halves: w*x[j+h] at lo lanes, w*x[j] at hi
        t = fr.mont_mul(jnp.where(is_hi, x, x_up), tw)
        lo = fr.add(x, t)
        hi = fr.sub(x_dn, t)
        return jnp.where(is_hi, hi, lo)

    return jax.lax.fori_loop(0, log2n, stage, x)


@functools.partial(
    jax.jit, static_argnames=("inverse", "coset", "apply_scale")
)
def _fft_jit(
    coeffs,
    scale,
    domain: EvaluationDomain,
    inverse: bool,
    coset: bool,
    apply_scale: bool,
):
    """scale: (18, 1) internal-Montgomery multiplier folded in pre (forward)
    or post (inverse)."""
    if not inverse:
        if coset:
            coeffs = fr.mont_mul(coeffs, domain.coset_scale)
        if apply_scale:
            coeffs = fr.mont_mul(coeffs, scale)
        return _fft_core(coeffs, domain, inverse=False)
    out = _fft_core(coeffs, domain, inverse=True)
    if apply_scale:
        out = fr.mont_mul(out, scale)
    if coset:
        out = fr.mont_mul(out, domain.coset_scale_inverse)
    return out


def _dispatch(coeffs, domain, inverse: bool, coset: bool, value: int | None):
    domain.warm_tables(inverse=inverse, coset=coset)
    if _use_bailey(domain):
        # tables must exist eagerly - built under trace they would be cached
        # as tracers (and recomputed inside every FFT graph)
        domain.bailey_tables(inverse)
    if inverse:
        scale_val = domain.domain_inverse * (value if value is not None else 1) % fr.p
    else:
        scale_val = (value if value is not None else 1) % fr.p
    apply_scale = scale_val != 1
    scale = fr.encode([scale_val])
    return _fft_jit(coeffs, scale, domain, inverse, coset, apply_scale)


def fft(coeffs, domain: EvaluationDomain):
    return _dispatch(coeffs, domain, False, False, None)


def ifft(evals, domain: EvaluationDomain):
    return _dispatch(evals, domain, True, False, None)


def ifft_with_constant(evals, domain: EvaluationDomain, value: int):
    return _dispatch(evals, domain, True, False, value)


def fft_with_constant(coeffs, domain: EvaluationDomain, value: int):
    return _dispatch(coeffs, domain, False, False, value)


def coset_fft(coeffs, domain: EvaluationDomain):
    """Evaluate at the coset g*<omega> (polynomial_arithmetic.cpp:283)."""
    return _dispatch(coeffs, domain, False, True, None)


def coset_fft_with_constant(coeffs, domain: EvaluationDomain, value: int):
    return _dispatch(coeffs, domain, False, True, value)


def coset_ifft(evals, domain: EvaluationDomain):
    return _dispatch(evals, domain, True, True, None)
