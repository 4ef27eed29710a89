#!/usr/bin/env python
"""Cross-backend MSM correctness probe.

Runs the commitment-path MSM variants on deterministic inputs at a given
size and prints the affine results + on-curve status, so CPU and TPU runs
can be diffed to locate shape-dependent breakage.

  python tools/debug_msm.py --log-n 16 --backend tpu
  python tools/debug_msm.py --log-n 16 --backend cpu
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=16)
    ap.add_argument("--backend", required=True, choices=["cpu", "tpu"])
    ap.add_argument("--variants", default="plain,precomp")
    args = ap.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from barretenberg_tpu.fields import fq, fr
    from barretenberg_tpu.groups.g1 import g1
    from barretenberg_tpu.srs.reference_string import ReferenceString
    from barretenberg_tpu.utils import host_curve

    n = 1 << args.log_n
    srs = ReferenceString.load(
        os.path.join(REPO, ".srs_cache", f"srs_{n}.dat"), n
    )
    points = g1.take_affine(srs.monomials, jnp.arange(n))
    rng = np.random.default_rng(12345)
    scalars = fr.random_elements(n, rng)

    def report(name, jac):
        aff = g1.batch_normalize(jac)
        x = fq.decode(aff.x)[0]
        y = fq.decode(aff.y)[0]
        ok = host_curve.g1_is_on_curve((x, y))
        print(f"{name}: on_curve={ok} x={x:#x} y={y:#x}", flush=True)

    variants = args.variants.split(",")
    if "plain" in variants:
        from barretenberg_tpu.msm.pippenger import pippenger

        t0 = time.time()
        report("pippenger", pippenger(scalars, points))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)
    if "precomp" in variants:
        from barretenberg_tpu.msm.pippenger import pippenger_precomputed

        t0 = time.time()
        table = srs.pippenger_table(n)
        report("pippenger_precomputed", pippenger_precomputed(scalars, table))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)
    if "lowmem" in variants:
        from barretenberg_tpu.msm.pippenger import pippenger_low_memory

        t0 = time.time()
        report("pippenger_low_memory", pippenger_low_memory(scalars, points))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)
    if "naive" in variants:
        from barretenberg_tpu.msm.naive import msm_naive

        t0 = time.time()
        report("naive", msm_naive(scalars, points))
        print(f"  ({time.time() - t0:.1f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
