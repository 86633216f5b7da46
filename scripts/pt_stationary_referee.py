"""Exact stationary verdicts for the flagged PT parity rows.

For every grid point of the PT families still carrying footnote (e)/(p)
defenses with instrumented z_MC > 2 (docs/PARITY_MATRIX.md), compute the
EXACT stationary swap-acceptance of OUR realized ladder with
scripts/pt_stationary_swap.py (quadrature/FFT, no sampling) and referee the
three quantities:

    stat  = exact stationary value of the realized ladder   (ground truth)
    ours  = our 512-replica protocol value  (parity_r*/ row)
    ref   = the reference's committed seed-averaged value

Verdict classes (mirrors the RWM stationary referee, footnote (n)/(o)):
    ours == stat  and  ref != stat   -> the flagged delta is the committed
        campaign's LADDER-REALIZATION offset (its SA build realized a
        different ladder), not a kernel-semantics delta on our side.
        The ensemble (scripts/pt_ladder_ensemble.py) then places the
        committed value inside the production-build realization
        distribution.
    ref == stat != ours              -> semantics bug on our side (investigate!)

Reference quantity certified: swap rule
/root/reference/algorithms/pt_rwm_gpu_optimized.py:36-48 under the
sequential sweep :594-633 at the realized ladders.

Usage:
    python scripts/pt_stationary_referee.py [--families RC30_500k,...]
    writes data/pt_stationary_referee.json
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import pt_stationary_swap as ss  # noqa: E402

CACHE = os.path.join(REPO, "data", "ladder_cache")
OUT = os.path.join(REPO, "data", "pt_stationary_referee.json")

STD = dict(n_samples=50000, tolerance=0.005, max_pn_steps=100,
           fail_tol_factor=3.0)
PROD = dict(n_samples=1000000, tolerance=0.0001, max_pn_steps=1000,
            fail_tol_factor=1.0)

# family -> (short, target, dim); every non-excluded grid point is refereed
FAMILIES = {
    "RoughCarpet_PT_GPU_dim10_200000iters": ("RoughCarpet", 10),
    "RoughCarpet_PT_GPU_dim30_200000iters": ("RoughCarpet", 30),
    "RoughCarpet_PT_GPU_dim10_500000iters": ("RoughCarpet", 10),
    "RoughCarpet_PT_GPU_dim30_500000iters": ("RoughCarpet", 30),
    "RoughCarpet_PT_GPU_dim20_200000iters": ("RoughCarpet", 20),
    "ThreeMixture_PT_GPU_dim20_500000iters": ("ThreeMixture", 20),
    "MultivariateNormal_PT_GPU_dim20_500000iters": ("MultivariateNormal", 20),
    # round-2 probe family: whole grid ran at the production ladder flags
    # (its rows predate the per-point ladder_precision tags)
    "RoughCarpet_PT_GPU_dim20_500000iters_production": ("RoughCarpet", 20),
}


def row_file(family):
    hits = glob.glob(os.path.join(REPO, "data", "parity_r*",
                                  family + ".json"))
    assert hits, family
    return sorted(hits)[-1]


def ladder_key(target, dim, rate, seed, prec):
    return (f"{target}_d{dim}_pt_gpu_rate{float(rate):.10g}"
            f"_N{prec['n_samples']}_tol{prec['tolerance']:.10g}"
            f"_pn{prec['max_pn_steps']}_fail{prec['fail_tol_factor']:.10g}"
            f"_seed{seed}")


def load_or_build_ladder(target, dim, rate, seed, prec):
    key = ladder_key(target, dim, rate, seed, prec)
    path = os.path.join(CACHE, key + ".json")
    if os.path.exists(path):
        return json.load(open(path)), key, True
    # std-precision builds are cheap; build on the JAX CPU backend
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from rwm_pt_tpu.ladders import construct_iterative_ladder
    from rwm_pt_tpu.targets import get_target_distribution
    tgt = get_target_distribution(target, dim, variant="pt_gpu")
    lad = [float(b) for b in construct_iterative_ladder(
        tgt, target_swap_acceptance_rate=float(rate),
        N_samples_swap_est=prec["n_samples"], tolerance=prec["tolerance"],
        max_pn_adjustment_steps=prec["max_pn_steps"],
        convergence_failure_tolerance_factor=prec["fail_tol_factor"],
        seed=seed)]
    tmp = path + f".tmp{os.getpid()}"
    json.dump(lad, open(tmp, "w"))
    os.replace(tmp, path)
    return lad, key, False


def referee_family(family, refine_worst=True):
    target, dim = FAMILIES[family]
    data = json.load(open(row_file(family)))
    nC = data["protocol"]["num_chains"]
    points = []
    for i, row in enumerate(data["rows"]):
        rate = row["target_rate"]
        if row["T"] <= 2:
            # degenerate ladder ([1, beta_min]): the recorded values are the
            # `excl` accounting artifact, not kernel estimates — not refereed
            print(f"  [{family} pt{i}] degenerate ladder (T={row['T']}) "
                  f"— SKIP")
            continue
        prec = STD
        lp = row.get("ladder_precision")
        if lp and lp.get("N_samples_swap_est") == PROD["n_samples"]:
            prec = PROD
        if family.endswith("_production"):
            prec = PROD
        try:
            ladder, key, cached = load_or_build_ladder(target, dim, rate, i,
                                                       prec)
        except Exception as e:  # ladder unavailable (e.g. degenerate)
            print(f"  [{family} pt{i}] ladder unavailable: {e}")
            continue
        if len(ladder) != row["T"]:
            print(f"  [{family} pt{i}] cache T={len(ladder)} != row "
                  f"T={row['T']} — SKIP (different realization)")
            continue
        t0 = time.time()
        res = ss.ladder_accept(target, dim, ladder, refine=refine_worst)
        stat = res["mean"]
        se = row.get("acc_se")
        sd_mc = se * np.sqrt(nC) if se else None
        pt = {
            "family": family, "idx": i, "target_rate": rate, "T": len(ladder),
            "ladder_key": key, "ladder_precision": prec,
            "stat": stat, "grid_err": res.get("grid_err"),
            "per_pair": res["per_pair"],
            "ours": row["our_acc"], "ours_se": se,
            "ref": row["ref_acc"],
            "ref_seed_std": row.get("ref_acc_seed_std"),
            "ours_minus_stat": row["our_acc"] - stat,
            "ref_minus_stat": row["ref_acc"] - stat,
            "z_ours_vs_stat": (abs(row["our_acc"] - stat) / se
                               if se else None),
            "z_ref_vs_stat_sdmc": (abs(row["ref_acc"] - stat) / sd_mc
                                   if sd_mc else None),
            "elapsed_s": round(time.time() - t0, 1),
        }
        points.append(pt)
        zs = (f"z_ours={pt['z_ours_vs_stat']:.2f}"
              if pt["z_ours_vs_stat"] is not None else "z_ours=n/a")
        print(f"  [{family} pt{i}] rate={rate:.4f} T={len(ladder)} "
              f"stat={stat:.5f} ours={row['our_acc']:.5f} "
              f"ref={row['ref_acc']:.5f} "
              f"(ours-stat={pt['ours_minus_stat']:+.5f} {zs}, "
              f"ref-stat={pt['ref_minus_stat']:+.5f}) "
              f"[{pt['elapsed_s']}s]", flush=True)
    return points


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", default=None,
                   help="comma-separated family substrings to run")
    p.add_argument("--no-refine", action="store_true")
    args = p.parse_args(argv)
    fams = list(FAMILIES)
    if args.families:
        subs = args.families.split(",")
        fams = [f for f in fams if any(s in f for s in subs)]
    existing = []
    if os.path.exists(OUT):
        existing = json.load(open(OUT))["points"]
    out = [pt for pt in existing
           if pt["family"] not in fams]
    for fam in fams:
        print(f"== {fam}")
        out.extend(referee_family(fam, refine_worst=not args.no_refine))
    json.dump({"points": out,
               "method": "scripts/pt_stationary_swap.py (exact FFT "
                         "quadrature of the stationary swap rule at the "
                         "realized ladder)"},
              open(OUT, "w"), indent=1)
    print(f"wrote {OUT} ({len(out)} points)")


if __name__ == "__main__":
    main()
