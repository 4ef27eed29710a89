#!/usr/bin/env python
"""Small-batch MSM schedule sweep (VERDICT r4 item 7).

Measures the commitment-MSM variants at small n on the real chip with
dependent-chain timing (per-call tunnel round trips amortized away), to pick
the small-n dispatch schedule the way the reference picks bucket widths
(scalar_multiplication.cpp:21-81 is a measured table).

  python tools/msm_schedule.py --sizes 12,13,14 --variants naive,pip8,pip10,precomp
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12,13,14")
    ap.add_argument("--variants", default="naive,pip8,pip10,pip12,precomp")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from barretenberg_tpu.fields import fq, fr
    from barretenberg_tpu.groups.g1 import g1
    from barretenberg_tpu.msm.naive import naive_msm
    from barretenberg_tpu.msm.pippenger import pippenger, pippenger_precomputed
    from barretenberg_tpu.srs.reference_string import ReferenceString
    from barretenberg_tpu.utils import host_curve

    results = {}
    for log_n in [int(s) for s in args.sizes.split(",")]:
        n = 1 << log_n
        srs_path = os.path.join(REPO, ".srs_cache", f"srs_{n}.dat")
        if os.path.exists(srs_path):
            srs = ReferenceString.load(srs_path, n)
        else:
            srs = ReferenceString.generate(n, 0xA11CE)
        points = g1.take_affine(srs.monomials, jnp.arange(n))
        rng = np.random.default_rng(5)
        scalar_sets = [fr.random_elements(n, rng) for _ in range(args.iters)]

        variants = {}
        for v in args.variants.split(","):
            if v == "naive":
                variants[v] = lambda s: naive_msm(s, points)
            elif v.startswith("pip"):
                c = int(v[3:])
                variants[v] = lambda s, c=c: pippenger(s, points, c=c)
            elif v == "precomp":
                table = srs.pippenger_table(n)
                variants[v] = lambda s, t=table: pippenger_precomputed(s, t)

        expected = None
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out0 = fn(scalar_sets[0])
            aff = g1.batch_normalize(out0)
            pt = (fq.decode(aff.x)[0], fq.decode(aff.y)[0])
            first = time.perf_counter() - t0
            ok = host_curve.g1_is_on_curve(pt)
            if expected is None:
                expected = pt
            agree = pt == expected
            # warm steady-state: back-to-back dispatches, one final fetch
            fn(scalar_sets[1])
            t0 = time.perf_counter()
            out = None
            for s in scalar_sets:
                out = fn(s)
            np.asarray(out.x[:1, :1])
            per = (time.perf_counter() - t0) / len(scalar_sets)
            results[f"2e{log_n}_{name}"] = {
                "wall_s": round(per, 5),
                "us_per_point": round(per / n * 1e6, 3),
                "compile_s": round(first, 1),
                "on_curve": ok,
                "agrees": agree,
            }
            print(json.dumps({f"2e{log_n}_{name}": results[f"2e{log_n}_{name}"]}), flush=True)
    out_path = os.path.join(REPO, "tools", "msm_schedule_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
