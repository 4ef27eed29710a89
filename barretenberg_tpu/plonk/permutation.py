"""Sigma permutation polynomials in Lagrange base, on device.

Reference: waffle/proof_system/permutation.hpp:13-89. The reference walks the
mapping with a branchy per-element root lookup + conditional negate; here the
whole polynomial is one gather from the domain's root-of-unity table followed
by a masked multiply with the coset shifts {1, k1, k2}.

Mapping encoding (composer_base.hpp:72-77): low 28 bits = gate index,
bits 30/31 = wire column (0 left, 1 right, 2 output).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import fr
from ..polynomials.domain import EvaluationDomain

WIRE_MASK = (1 << 29) - 1


def compute_permutation_lagrange_base(
    mapping: np.ndarray, domain: EvaluationDomain
) -> jnp.ndarray:
    """mapping: uint32 (n,) host array -> (18, n) sigma evaluations."""
    mapping = np.asarray(mapping, dtype=np.uint64)
    idx = (mapping & WIRE_MASK).astype(np.int32)
    col = (mapping >> 30).astype(np.int32)
    # jnp.take clips out-of-range indices, which would silently map a
    # malformed col==3 to the k2 shift; fail loudly on the host instead.
    if not (col <= 2).all():
        raise ValueError("malformed sigma mapping: wire column > 2")
    if not (idx < domain.size).all():
        raise ValueError("malformed sigma mapping: gate index out of range")

    roots = domain.root_vector()  # (18, n) table of w^k
    sigma = jnp.take(roots, jnp.asarray(idx), axis=1)

    k1 = fr.params.multiplicative_generator
    k2 = fr.params.alternate_multiplicative_generator
    # Per-lane coset shift: 1, k1 or k2 - one gather from a 3-entry device
    # table (a host-side bigint encode of all n shift values cost ~0.2s per
    # sigma at 2^14)
    shift_table = fr.encode([1, k1, k2])  # (18, 3)
    shifts = jnp.take(shift_table, jnp.asarray(col), axis=1)
    return fr.mont_mul(sigma, shifts)
