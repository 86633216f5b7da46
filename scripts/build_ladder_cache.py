"""CPU-only prepass: build the production-precision iterative ladders for
the breaching PT grid points into the ladder cache directory.

The production SA build (N=1e6, tol=1e-4, max_pn=1000 — run_pt_gpu.sbatch
:30-40) costs many CPU-minutes per grid point and touches no TPU, so it can
run while the chip serves the RWM parity batch.  Afterwards
`scripts/pt_production_points.py` finds every ladder cached and only the
fast (seconds-scale) 500k-iteration PT runs hit the chip.

One JSON file per cache key => safe to run several workers:
  python scripts/build_ladder_cache.py --shard 0/2 &
  python scripts/build_ladder_cache.py --shard 1/2 &
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

CACHE_DIR = os.path.join(REPO, "data", "ladder_cache")
AVG_DIR = os.path.join(REPO, "data", "ref_averaged")

PROD = dict(n_samples=1000000, tolerance=0.0001, max_pn_steps=1000,
            fail_tol_factor=1.0)


def worklist():
    from pt_production_points import POINTS
    import parity_vs_reference as pvr
    items = []
    for fam, pts in POINTS.items():
        avg = [a for a in glob.glob(os.path.join(AVG_DIR, "*.json"))
               if os.path.basename(a).startswith(fam + "_seeds")]
        assert len(avg) == 1, (fam, avg)
        ref = json.load(open(avg[0]))
        grid = ref["swap_acceptance_rates_range"][::3]
        for rank, i in enumerate(pts):
            key = pvr.ladder_cache_key(ref, grid[i], seed=i, **PROD)
            items.append((rank, fam, i, float(grid[i]), ref, key))
    # breadth-first over families (every family's worst/lowest-rate point
    # first, then the seconds, ...) so a time-bounded build fixes the most
    # impactful point of EVERY family before any family's full set
    items.sort(key=lambda it: it[0])
    return [it[1:] for it in items]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--shard", default="0/1", help="k/n worker split")
    p.add_argument("--list", action="store_true")
    args = p.parse_args(argv)
    k, n = map(int, args.shard.split("/"))

    import jax
    jax.config.update("jax_platforms", "cpu")
    import parity_vs_reference as pvr

    items = worklist()
    for j, (fam, i, rate, ref, key) in enumerate(items):
        done = os.path.exists(os.path.join(CACHE_DIR, key + ".json"))
        if args.list:
            print(f"[{j}] {fam} pt{i} rate={rate:.4f} "
                  f"{'CACHED' if done else 'todo'}")
            continue
        if j % n != k or done:
            continue
        t0 = time.time()
        lad = pvr.cached_ladder(CACHE_DIR, ref, rate, seed=i, **PROD)
        print(f"[{j}] {fam} pt{i} rate={rate:.4f} T={len(lad)} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
