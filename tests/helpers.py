"""Shared test utilities."""

import numpy as np

from barretenberg_tpu.fields import fq, fr


def rng(seed=1234):
    return np.random.default_rng(seed)


def random_values(field, n, seed=1234):
    r = rng(seed)
    return [int.from_bytes(r.bytes(32), "little") % field.p for _ in range(n)]
