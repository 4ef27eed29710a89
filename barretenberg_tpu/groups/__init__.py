from .group import AffinePoints, Curve, JacobianPoints
from .g1 import g1

__all__ = ["AffinePoints", "Curve", "JacobianPoints", "g1"]
