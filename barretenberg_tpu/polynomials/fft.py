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


def _fft_core(coeffs: jnp.ndarray, domain: EvaluationDomain, inverse: bool):
    n = domain.size
    assert coeffs.shape == (coeffs.shape[0], n)
    x = jnp.take(coeffs, domain.bit_reverse_indices, axis=1)
    table = domain.inverse_twiddles if inverse else domain.twiddles
    for s in range(domain.log2_size):
        m = 2 << s
        half = m >> 1
        tw = table[:, :: max(1, n // m)][:, :half]
        u = x.reshape(18, n // m, m)[:, :, :half].reshape(18, n // 2)
        v = x.reshape(18, n // m, m)[:, :, half:].reshape(18, n // 2)
        if s == 0:
            t = v  # twiddle is 1 for the first stage
        else:
            tw_full = jnp.tile(tw, (1, n // m))
            t = fr.mont_mul(v, tw_full)
        lo = fr.add(u, t)
        hi = fr.sub(u, t)
        x = jnp.concatenate(
            [
                lo.reshape(18, n // m, half),
                hi.reshape(18, n // m, half),
            ],
            axis=2,
        ).reshape(18, n)
    return x


@functools.partial(
    jax.jit, static_argnames=("domain", "inverse", "coset", "apply_scale")
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
