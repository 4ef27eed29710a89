#!/usr/bin/env python
"""Pippenger bucket-width sweep on the real TPU (the analog of the
reference's measured b=15/18/21 schedule, scalar_multiplication.cpp:21-81).

Runs the MSM at 2^16 and 2^20 across window widths c, records pipelined
per-point timings into BENCH_DETAILS.json under "msm_window_sweep", and is
the citation for msm/pippenger.py::optimal_window.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

import bench
from barretenberg_tpu.fields import fr
from barretenberg_tpu.groups.g1 import g1
from barretenberg_tpu.msm.pippenger import pippenger


def _fetch(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(slice(0, 1),) * leaf.ndim])


def sweep(log_n: int, cs, out: dict) -> None:
    n = 1 << log_n
    srs = bench.get_srs(n)
    points = g1.take_affine(srs.monomials, jnp.arange(n))
    rng = np.random.default_rng(3)
    scalar_sets = [fr.random_elements(n, rng) for _ in range(4)]
    rows = {}
    for c in cs:
        t0 = time.perf_counter()
        _fetch(pippenger(scalar_sets[0], points, c=c))
        compile_s = time.perf_counter() - t0
        _fetch(pippenger(scalar_sets[1], points, c=c))
        t0 = time.perf_counter()
        r = None
        for s in scalar_sets:
            r = pippenger(s, points, c=c)
        _fetch(r)
        us = (time.perf_counter() - t0) / len(scalar_sets) / n * 1e6
        rows[f"c{c}"] = {"us_per_point": round(us, 3), "compile_s": round(compile_s, 1)}
        print(f"2^{log_n} c={c}: {us:.3f} us/pt (compile {compile_s:.0f}s)", flush=True)
        out[f"msm_2e{log_n}"] = rows
        _flush(out)


def _flush(out: dict) -> None:
    path = os.path.join(REPO, "BENCH_DETAILS.json")
    with open(path) as f:
        d = json.load(f)
    d["msm_window_sweep"] = out
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def main() -> int:
    out: dict = {}
    sweep(16, (8, 10, 12, 13, 14, 16), out)
    sweep(20, (10, 12, 13, 14), out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
