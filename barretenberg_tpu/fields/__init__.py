"""Prime-field arithmetic: vectorized TPU limb kernels + parameters.

Layers mirror the reference's fields/ directory (field.hpp, field2.hpp, ...)
but are re-designed for TPU: planar 18x15-bit limb vectors in uint32 lanes.
"""

from .params import FQ_PARAMS, FR_PARAMS, FieldParams
from .montgomery import Field

fq = Field(FQ_PARAMS)
fr = Field(FR_PARAMS)

__all__ = ["Field", "FieldParams", "FQ_PARAMS", "FR_PARAMS", "fq", "fr"]
