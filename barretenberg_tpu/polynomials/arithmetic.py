"""PLONK polynomial operations over Fr (reference:
polynomials/polynomial_arithmetic.{hpp,cpp}).

Everything operates on (18, n) limb arrays (coefficient or evaluation form)
on device; small scalar results come back as host ints via fr.decode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..fields import fr
from .domain import EvaluationDomain


def _tree_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum field elements along the batch axis -> (18, 1)."""
    n = x.shape[1]
    while n > 1:
        if n % 2:
            x = jnp.concatenate([x, fr.encode([0])], axis=1)
            n += 1
        x = fr.add(x[:, : n // 2], x[:, n // 2 :])
        n //= 2
    return x


@jax.jit
def _powers_table_jit(z_arr: jnp.ndarray, n_like: jnp.ndarray) -> jnp.ndarray:
    """(18, n) table of z^k from a (18, 1) z array (one associative scan;
    shape taken from n_like)."""
    from ..utils.scans import hillis_scan

    n = n_like.shape[1]
    one = fr.full((1,), fr.one)
    zs = jnp.concatenate([one, jnp.broadcast_to(z_arr, (18, n - 1))], axis=1)
    return hillis_scan(fr.mont_mul, zs, axis=1)


def powers_of(value: int, n: int) -> jnp.ndarray:
    """(18, n) table of value^k (host-known base), as ONE jitted scan.
    (The previous eager log-doubling loop cost ~15 eager field ops; an
    eager mont_mul is hundreds of individually-dispatched primitives
    through the remote tunnel - seconds per op.)"""
    if n == 1:
        return fr.encode([1])
    return _powers_table_jit(
        fr.encode([value % fr.p]), jnp.zeros((1, n), dtype=jnp.uint32)
    )


@jax.jit
def _evaluate_jit(coeffs: jnp.ndarray, z_arr: jnp.ndarray) -> jnp.ndarray:
    zp = _powers_table_jit(z_arr, coeffs)
    return _tree_sum(fr.mont_mul(coeffs, zp))


def evaluate(coeffs: jnp.ndarray, z: int) -> int:
    """P(z) for a host-known z; returns the value as a host int.
    (reference: multithreaded Horner, polynomial_arithmetic.cpp:337-373 -
    here a power-table inner product, which maps to lanes, compiled as ONE
    jitted dispatch per polynomial length.)"""
    return fr.decode(_evaluate_jit(coeffs, fr.encode([z % fr.p])))[0]


def evaluate_device(coeffs: jnp.ndarray, zpow: jnp.ndarray) -> jnp.ndarray:
    """P(z) given a precomputed z-power table; stays on device, (18, 1)."""
    return _tree_sum(fr.mont_mul(coeffs, zpow))


def compute_lagrange_polynomial_fft(
    src_domain: EvaluationDomain, target_domain: EvaluationDomain
) -> jnp.ndarray:
    """Evaluations of L_1(X) = (X^n - 1)/(n (X - 1)) over the *coset* of the
    target domain (reference: polynomial_arithmetic.cpp:381-476)."""
    n_t = target_domain.size
    coset = target_domain.coset_root_vector()  # g * w'^i
    denom = fr.sub(coset, fr.full((n_t,), fr.one))
    denom_inv = fr.batch_invert(denom)
    # numerator (X^n - 1)/n has period target/src
    period = n_t // src_domain.size
    g = fr.params.multiplicative_generator
    wt = target_domain.root
    num_vals = []
    for i in range(period):
        x = g * pow(wt, i, fr.p) % fr.p
        num_vals.append(
            (pow(x, src_domain.size, fr.p) - 1) * src_domain.domain_inverse % fr.p
        )
    # values repeat every `period` entries (i mod period)
    num = jnp.tile(fr.encode(num_vals), (1, n_t // period))
    return fr.mont_mul(denom_inv, num)


def divide_by_pseudo_vanishing_polynomial(
    evals: jnp.ndarray,
    src_domain: EvaluationDomain,
    target_domain: EvaluationDomain,
) -> jnp.ndarray:
    """In coset-evaluation form, divide by
    Z_H*(X) = (X^n - 1)/(X - w^{n-1})  (reference:
    polynomial_arithmetic.cpp:478-560): multiply by (X - w^{n-1}) and by
    1/(X^n - 1), all evaluated on the target coset."""
    n_t = target_domain.size
    period = n_t // src_domain.size
    g = fr.params.multiplicative_generator
    wt = target_domain.root
    inv_vals = []
    for i in range(period):
        x = g * pow(wt, i, fr.p) % fr.p
        inv_vals.append(pow(pow(x, src_domain.size, fr.p) - 1, -1, fr.p))
    inv_tiled = jnp.tile(fr.encode(inv_vals), (1, n_t // period))
    coset = target_domain.coset_root_vector()
    numerator = fr.sub(
        coset, fr.full((n_t,), fr.const(src_domain.root_inverse))
    )
    return fr.mont_mul(fr.mont_mul(evals, inv_tiled), numerator)


def compute_kate_opening_coefficients(
    coeffs: jnp.ndarray, z: int
) -> tuple[jnp.ndarray, int]:
    """W(X) = (F(X) - F(z))/(X - z) by the reference's forward recurrence
    d_i = (c_i - d_{i-1}) * (-1/z)  (polynomial_arithmetic.cpp:562-591),
    parallelized as an associative scan of affine maps. Returns (W, F(z))."""
    n = coeffs.shape[1]
    f = evaluate(coeffs, z)
    w = (-pow(z, -1, fr.p)) % fr.p  # -1/z
    c0 = fr.decode(coeffs[:, :1])[0]
    b0 = (c0 - f) * w % fr.p
    # b_i = w * c_i (i >= 1); m_i = -w. d_i = m_i d_{i-1} + b_i.
    b = fr.mul_by_constant(coeffs, w)
    b = jnp.concatenate([fr.encode([b0]), b[:, 1:]], axis=1)
    m = fr.full((n,), fr.const((-w) % fr.p))
    m = jnp.concatenate([fr.encode([1]), m[:, 1:]], axis=1)
    from ..utils.scans import affine_scan

    d = affine_scan(fr.mont_mul, fr.add, m, b, axis=1)
    return d, f


class LagrangeEvaluations(NamedTuple):
    vanishing_poly: int  # Z_H*(z)
    l_1: int
    l_n_minus_1: int


def get_lagrange_evaluations(z: int, domain: EvaluationDomain) -> LagrangeEvaluations:
    """Z_H*(z), L_1(z), L_{n-1}(z) on host ints (reference:
    polynomial_arithmetic.cpp:594-626)."""
    p = fr.p
    z %= p
    z_pow = pow(z, domain.size, p)
    numerator = (z_pow - 1) % p
    d0 = (z - domain.root_inverse) % p
    d1 = (z - 1) % p
    d2 = (z * domain.root % p * domain.root - 1) % p
    vanishing = numerator * pow(d0, -1, p) % p
    scaled = numerator * domain.domain_inverse % p
    return LagrangeEvaluations(
        vanishing_poly=vanishing,
        l_1=scaled * pow(d1, -1, p) % p,
        l_n_minus_1=scaled * pow(d2, -1, p) % p,
    )


def compress_fft(evals: jnp.ndarray, factor_log2: int) -> jnp.ndarray:
    """Evaluations on a 2^k domain -> evaluations on the 2^(k-j) subdomain
    (every 2^j-th point; reference polynomial_arithmetic.cpp:629-639)."""
    return evals[:, :: 1 << factor_log2]


def shrink_evaluation_domain(coeffs: jnp.ndarray, new_size: int) -> jnp.ndarray:
    """Truncate a coefficient array to a smaller power-of-two domain
    (reference polynomial.cpp:330-346; valid when the high coefficients are
    zero - the caller's responsibility, as in the reference)."""
    return coeffs[:, :new_size]
