"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np


def default_mesh(n_devices: int | None = None, axis_name: str = "shards"):
    """1-D mesh over the first n_devices (all by default). MSM points and
    FFT positions shard over this single axis; it rides ICI within a pod."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.sharding.Mesh(np.array(devs[:n_devices]), (axis_name,))
