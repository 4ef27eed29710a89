"""BN254 G2 instantiation on device (reference: curves/bn254/g2.hpp).

Twist curve y^2 = x^3 + b' over Fq2, b' = 3/(9+i) (the twist_coeff_b of
curves/bn254/fq2.hpp:10-15, derived here rather than transcribed). The
generic mask-merged group law (groups/group.py) instantiates directly over
the vectorized Fq2 (fields/quadratic.py); USE_ENDOMORPHISM is false for G2
(g2.hpp:12), matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import fq
from ..fields.params import FQ_MODULUS
from ..fields.quadratic import QuadraticField
from ..utils import host_curve
from .group import AffinePoints, Curve, JacobianPoints

P = FQ_MODULUS

fq2 = QuadraticField(fq)


def _fq2_inv(a):
    t = pow(a[0] * a[0] + a[1] * a[1], -1, P)
    return (a[0] * t % P, -a[1] * t % P)


def _fq2_mul(a, b):
    return ((a[0] * b[0] - a[1] * b[1]) % P, (a[0] * b[1] + a[1] * b[0]) % P)


TWIST_B = _fq2_mul((3, 0), _fq2_inv((9, 1)))

g2 = Curve(fq2, b_value=TWIST_B, generator_xy=host_curve.G2_GENERATOR)


def g2_points_to_host(p: AffinePoints) -> list:
    xs = fq2.decode(p.x)
    ys = fq2.decode(p.y)
    infs = np.asarray(p.inf)
    return [None if i else (x, y) for x, y, i in zip(xs, ys, infs)]


def g2_jacobian_to_host(p: JacobianPoints) -> list:
    return g2_points_to_host(g2.batch_normalize(p))


def g2_host_to_affine(pts: list) -> AffinePoints:
    xs = [(0, 0) if pt is None else pt[0] for pt in pts]
    ys = [(0, 0) if pt is None else pt[1] for pt in pts]
    inf = jnp.asarray([pt is None for pt in pts], dtype=bool)
    return AffinePoints(fq2.encode(xs), fq2.encode(ys), inf)
