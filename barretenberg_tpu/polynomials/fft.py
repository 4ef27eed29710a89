"""Radix-2 FFT over Fr, vectorized for TPU.

Replaces the reference's thread-partitioned butterfly loops
(reference: polynomial_arithmetic.cpp:129-264 fft_inner_parallel) with
whole-array stage transforms: bit-reverse gather once, then log2(n) stages
of reshaped butterflies where the multiply/add/sub run as Pallas limb
kernels across all lanes. Twiddles for stage s are a strided slice of the
domain's single power table.

Conventions match the reference exactly: fft evaluates coefficients at
successive powers of the domain root (DIT, natural-order output); ifft uses
the inverse root and folds in 1/n; coset transforms pre/post-scale by the
multiplicative generator (polynomial_arithmetic.cpp:266-315).
"""

from __future__ import annotations

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


def fft(coeffs, domain: EvaluationDomain):
    return _fft_core(coeffs, domain, inverse=False)


def ifft(evals, domain: EvaluationDomain):
    out = _fft_core(evals, domain, inverse=True)
    return fr.mul_by_constant(out, domain.domain_inverse)


def ifft_with_constant(evals, domain: EvaluationDomain, value: int):
    out = _fft_core(evals, domain, inverse=True)
    return fr.mul_by_constant(out, domain.domain_inverse * value % fr.p)


def fft_with_constant(coeffs, domain: EvaluationDomain, value: int):
    return _fft_core(fr.mul_by_constant(coeffs, value), domain, inverse=False)


def coset_fft(coeffs, domain: EvaluationDomain):
    """Evaluate at the coset g*<omega> (polynomial_arithmetic.cpp:283)."""
    return fft(fr.mont_mul(coeffs, domain.coset_scale), domain)


def coset_fft_with_constant(coeffs, domain: EvaluationDomain, value: int):
    scaled = fr.mul_by_constant(fr.mont_mul(coeffs, domain.coset_scale), value)
    return fft(scaled, domain)


def coset_ifft(evals, domain: EvaluationDomain):
    return fr.mont_mul(ifft(evals, domain), domain.coset_scale_inverse)
