from .base import AddTriple, ComposerBase, MulTriple, PolyTriple  # noqa: F401
from .standard import StandardComposer  # noqa: F401
