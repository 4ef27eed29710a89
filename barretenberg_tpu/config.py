"""Runtime configuration: Pallas kernel dispatch.

The library has two execution paths for the hot limb kernels:
  * pure-XLA (fields/montgomery.py) - runs everywhere, used as the oracle
    and for small batches;
  * Pallas TPU kernels (kernels/) - register-resident limb chains, the
    performance path (the analog of the reference's asm field backend vs
    its DISABLE_SHENANIGANS portable fallback, field.hpp:527-531).

Default: Pallas on TPU backends, XLA elsewhere. Override with
`set_use_pallas(True/False)` or BARRETENBERG_TPU_PALLAS=0/1.
"""

from __future__ import annotations

import os

import jax

_override: bool | None = None
if "BARRETENBERG_TPU_PALLAS" in os.environ:
    _override = os.environ["BARRETENBERG_TPU_PALLAS"] not in ("0", "false", "")

# Batches smaller than this stay on the XLA path (kernel launch not worth it).
PALLAS_MIN_BATCH = 256


_interpret = False


def set_use_pallas(value: bool | None) -> None:
    global _override
    _override = value


def set_pallas_interpret(value: bool) -> None:
    """Run Pallas kernels in interpret mode (CPU emulation) - used by CI to
    cover the kernel code paths without TPU hardware."""
    global _interpret
    _interpret = value


def pallas_interpret() -> bool:
    return _interpret


def use_pallas() -> bool:
    if _override is not None:
        return _override
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing failure
        return False
