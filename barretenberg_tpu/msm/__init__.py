from .naive import MSM_PIPPENGER_THRESHOLD, msm, naive_msm
from .pippenger import pippenger, scalar_digits

__all__ = [
    "MSM_PIPPENGER_THRESHOLD",
    "msm",
    "naive_msm",
    "pippenger",
    "scalar_digits",
]
