from .domain import EvaluationDomain, get_domain
from . import fft, arithmetic

__all__ = ["EvaluationDomain", "get_domain", "fft", "arithmetic"]
