from .pippenger import pippenger, scalar_digits

__all__ = ["pippenger", "scalar_digits"]
