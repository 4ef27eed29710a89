"""Limb-vector <-> integer conversions for the TPU field representation.

A field-element *vector* is a ``uint32`` array of shape ``(NUM_LIMBS, *batch)``
holding base-2^15 limbs, least-significant limb first ("planar" layout: the
limb axis leads so the batch axis lands on TPU vector lanes).

The reference stores elements as 4x64-bit little-endian limb structs
(reference: fields/field.hpp:19-22); helpers here convert both ways so the
reference test vectors can be used verbatim.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from .params import LIMB_BITS, LIMB_MASK, NUM_LIMBS

__all__ = [
    "int_to_limbs",
    "limbs_to_int",
    "ints_to_limbs",
    "limbs_to_ints",
    "u64x4_to_int",
    "int_to_u64x4",
]


def int_to_limbs(value: int) -> np.ndarray:
    """One integer -> (NUM_LIMBS,) uint32 base-2^15 limbs."""
    return ints_to_limbs([value])[:, 0]


def limbs_to_int(limbs) -> int:
    """(NUM_LIMBS,) limb array (possibly relaxed/overflowed) -> integer."""
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(arr))


def ints_to_limbs(values: Sequence[int]) -> np.ndarray:
    """Batch of integers -> (NUM_LIMBS, N) uint32 limbs."""
    out = np.empty((NUM_LIMBS, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        v = int(v)
        for i in range(NUM_LIMBS):
            out[i, j] = v & LIMB_MASK
            v >>= LIMB_BITS
        if v:
            raise ValueError("value does not fit in 270 bits")
    return out


def limbs_to_ints(limbs) -> list[int]:
    """(NUM_LIMBS, N) limb array -> list of N integers."""
    arr = np.asarray(limbs, dtype=np.uint64)
    arr = arr.reshape(NUM_LIMBS, -1)
    n = arr.shape[1]
    return [
        sum(int(arr[i, j]) << (LIMB_BITS * i) for i in range(NUM_LIMBS))
        for j in range(n)
    ]


def u64x4_to_int(limbs64: Iterable[int]) -> int:
    """Reference-style {d0,d1,d2,d3} little-endian u64 limbs -> integer."""
    limbs64 = list(limbs64)
    assert len(limbs64) == 4
    return sum(int(v) << (64 * i) for i, v in enumerate(limbs64))


def int_to_u64x4(value: int) -> tuple[int, int, int, int]:
    m = (1 << 64) - 1
    return (value & m, (value >> 64) & m, (value >> 128) & m, (value >> 192) & m)
