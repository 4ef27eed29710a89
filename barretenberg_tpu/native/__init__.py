"""Native (C) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; host-sequential runtime pieces (the
Fiat-Shamir Keccak sponge) are C, compiled once into a cached shared object
on first import. Falls back gracefully (callers keep their pure-Python
implementations) if no C compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "keccak.c")
_SO = os.path.join(_DIR, "_keccak.so")

_lib = None


def _build() -> bool:
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False


def get_keccak():
    """Returns a callable keccak256(data: bytes) -> bytes backed by the C
    library, or None if unavailable."""
    global _lib
    if _lib is None:
        if not _build():
            return None
        try:
            _lib = ctypes.CDLL(_SO)
            _lib.keccak256.argtypes = [
                ctypes.c_char_p,
                ctypes.c_uint64,
                ctypes.c_char_p,
            ]
            _lib.keccak256.restype = None
        except OSError:
            return None

    def keccak256_native(data: bytes) -> bytes:
        out = ctypes.create_string_buffer(32)
        _lib.keccak256(data, len(data), out)
        return out.raw

    return keccak256_native
