"""Measure the Pallas normal-draw implementations on the headline workload.

Round-3 verdict item 4: Laplace PT hits ~2.55B MH steps/s vs Normal's
~1.36B on identical targets, implicating the Box-Muller draw
(log+sqrt+sin+cos per normal pair) as the throughput ceiling.  This script
times the BENCH headline (PT, 30-d FullRosenbrock, 10 rungs) with each
candidate draw:

  bm            Box-Muller, both outputs used (current default)
  icdf          inverse CDF via the Giles single-precision erfinv
                polynomial: 1 log + 1 sqrt + ~18 FMA, no trig, no division
  lax_erfinv    inverse CDF via jax.lax.erf_inv (Mosaic's own lowering)
  fake_uniform  variance-matched uniform — NOT a normal; its time is the
                kernel's roofline with a near-free draw, so
                (t_impl - t_fake) is each real draw's transcendental cost

Each impl runs in its OWN subprocess: the kernels read
pallas_rwm.NORMAL_IMPL at trace time, and an in-process switch would be
masked by the jit cache.

Exactness gate for any impl promoted to default: moment + KS tests against
threefry normals (tests/test_pallas_kernels.py::test_normal_impl_*, and the
invariance check in the bench smoke gate).

Usage:  python scripts/bench_normal_impl.py [--quick] [--out FILE]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# persistent compile cache: the integer-heavy fastlog kernel costs ~450s of
# Mosaic compile; cache it across child processes / retries
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

IMPLS = ("bm", "icdf", "icdf_fastlog", "lax_erfinv", "fake_uniform")


def child(impl: str, chains: int, iters: int):
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import pallas_rwm
    pallas_rwm.NORMAL_IMPL = impl
    from rwm_pt_tpu.kernels.pallas_pt import run_pt_pallas
    from rwm_pt_tpu.targets import FullRosenbrock
    from rwm_pt_tpu.utils import force

    dim, T = 30, 10
    target = FullRosenbrock.create(dim)
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    key = jax.random.key(0)

    def one(k):
        return force(run_pt_pallas(target, k, betas,
                                   base_variance=0.5 ** 2 / dim,
                                   num_chains=chains, num_iterations=iters,
                                   burn_in=0, swap_every=100))

    t0 = time.time()
    res = one(key)
    first = time.time() - t0
    times = []
    for rep in (1, 2, 3):
        t0 = time.time()
        res = one(jax.random.fold_in(key, rep))
        times.append(time.time() - t0)
    best = min(times)
    out = {"impl": impl,
           "mh_steps_per_s": iters * T * chains / best,
           "best_s": round(best, 4),
           "rep_times_s": [round(t, 4) for t in times],
           "first_s": round(first, 2),
           "swap_acc": round(float(res.swap_acceptance_rate.mean()), 4),
           "cold_esjd": round(float(res.cold_esjd.mean()), 5),
           "mh_acc": round(float(res.acceptance_rate.mean()), 4)}
    print(json.dumps(out))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--impl", choices=IMPLS, default=None,
                    help="run only this impl (in-process; used by the "
                         "subprocess children)")
    ap.add_argument("--chains", type=int, default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args(argv)
    chains = args.chains or (1024 if args.quick else 65536)
    iters = args.iters or (200 if args.quick else 2000)

    if args.impl:
        child(args.impl, chains, iters)
        return

    rows = []
    for impl in IMPLS:
        cmd = [sys.executable, os.path.abspath(__file__), "--impl", impl,
               "--chains", str(chains), "--iters", str(iters)]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                           cwd=REPO)
        if r.returncode:
            print(f"{impl}: FAILED\n{r.stderr[-1500:]}", file=sys.stderr)
            rows.append({"impl": impl, "error": r.stderr[-300:]})
            continue
        row = json.loads(r.stdout.strip().splitlines()[-1])
        rows.append(row)
        print(f"{impl:14s} {row['mh_steps_per_s'] / 1e9:6.3f} B MH steps/s "
              f"(best {row['best_s']}s, reps {row['rep_times_s']}, "
              f"mh_acc {row['mh_acc']})", flush=True)
    ok = [r for r in rows if "mh_steps_per_s" in r]
    fake = next((r for r in ok if r["impl"] == "fake_uniform"), None)
    summary = {"workload": {"dim": 30, "T": 10, "chains": chains,
                            "iters": iters},
               "rows": rows}
    if fake:
        summary["draw_cost_share"] = {
            r["impl"]: round(1.0 - r["mh_steps_per_s"]
                             / fake["mh_steps_per_s"], 3)
            for r in ok if r["impl"] != "fake_uniform"}
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
    if args.out:
        json.dump(summary, open(args.out, "w"), indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
