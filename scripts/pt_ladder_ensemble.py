"""Construction-realization ensembles for the flagged PT grid points
(VERDICT r4 #2: upgrade footnote (e) from a 3-seed anecdote to a
distribution).

For each flagged (target, dim, target_rate) the instrument samples the
realized-ladder distribution of the SAME construction the committed
campaign ran (reference pt_rwm_gpu_optimized.py:283-426 at that campaign's
precision flags — run_pt_gpu.sbatch:30-40 production flags for the 500k
campaigns, the experiment defaults for the 200k ones):

* N_F32 independent seeds of the true-f32 build
  (`construct_iterative_ladder_device` on the TPU — seconds per build);
* N_BF16 seeds of the SAME build with a quantized-matmul estimator
  (`matmul_precision="bfloat16"`) — the analogue of the committed
  campaign's TF32 torch estimator (rwm_gpu_optimized.py:148-151 enables
  TF32), sampling the *platform* axis of construction variability that
  footnote (e) demonstrated with torch-CPU re-runs.

Each realized ladder is then scored with the EXACT stationary
swap-acceptance (scripts/pt_stationary_swap.py) — no protocol runs needed;
the stationary referee shows protocol values sit within ~7e-4 of
stationary at 200k-500k iters.  The summary places the committed value and
our value inside the realization distribution.

Stages (run build on the TPU, stat on CPU):
  python scripts/pt_ladder_ensemble.py --stage build
  JAX_PLATFORMS=cpu python scripts/pt_ladder_ensemble.py --stage stat
Writes data/ladder_ensemble/*.json and data/pt_ladder_ensemble.json.
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

ENS_DIR = os.path.join(REPO, "data", "ladder_ensemble")
OUT = os.path.join(REPO, "data", "pt_ladder_ensemble.json")

STD = dict(n_samples=50000, tolerance=0.005, max_pn_steps=100,
           fail_tol_factor=3.0)
PROD = dict(n_samples=1000000, tolerance=0.0001, max_pn_steps=1000,
            fail_tol_factor=1.0)

N_F32 = 16
N_BF16 = 4
SEED0 = 1000

# family -> (target, dim, flagged grid indices)
FLAGGED = {
    "RoughCarpet_PT_GPU_dim10_200000iters": ("RoughCarpet", 10, [8]),
    "RoughCarpet_PT_GPU_dim30_200000iters": ("RoughCarpet", 30, [6]),
    "RoughCarpet_PT_GPU_dim20_200000iters": ("RoughCarpet", 20, [8]),
    "RoughCarpet_PT_GPU_dim10_500000iters": ("RoughCarpet", 10, [6, 9]),
    "RoughCarpet_PT_GPU_dim30_500000iters": ("RoughCarpet", 30,
                                             [5, 6, 7, 8, 9]),
    "RoughCarpet_PT_GPU_dim20_500000iters_production": ("RoughCarpet", 20,
                                                        [2, 3, 4]),
    "ThreeMixture_PT_GPU_dim20_500000iters": ("ThreeMixture", 20, [8, 9]),
    "MultivariateNormal_PT_GPU_dim20_500000iters": ("MultivariateNormal", 20,
                                                    [6]),
}


def campaign_precision(family):
    return PROD if "500000iters" in family else STD


def row_file(family):
    hits = glob.glob(os.path.join(REPO, "data", "parity_r*",
                                  family + ".json"))
    assert hits, family
    return sorted(hits)[-1]


def worklist():
    items = []
    for fam, (target, dim, idxs) in FLAGGED.items():
        data = json.load(open(row_file(fam)))
        prec = campaign_precision(fam)
        for i in idxs:
            row = data["rows"][i]
            items.append(dict(family=fam, idx=i, target=target, dim=dim,
                              rate=float(row["target_rate"]), prec=prec,
                              ref_acc=row["ref_acc"], our_acc=row["our_acc"],
                              our_T=row["T"],
                              ref_seed_std=row.get("ref_acc_seed_std"),
                              acc_se=row.get("acc_se")))
    return items


def member_key(it, seed, mprec):
    p = it["prec"]
    return (f"{it['target']}_d{it['dim']}_rate{it['rate']:.10g}"
            f"_N{p['n_samples']}_tol{p['tolerance']:.10g}"
            f"_pn{p['max_pn_steps']}_fail{p['fail_tol_factor']:.10g}"
            f"_{mprec}_seed{seed}")


def stage_build():
    from rwm_pt_tpu.ladders.ladders import construct_iterative_ladder_device
    from rwm_pt_tpu.targets import get_target_distribution

    os.makedirs(ENS_DIR, exist_ok=True)
    targets = {}
    for it in worklist():
        tkey = (it["target"], it["dim"])
        if tkey not in targets:
            targets[tkey] = get_target_distribution(
                it["target"], it["dim"], variant="pt_gpu")
        tgt = targets[tkey]
        for mprec, n_m in (("float32", N_F32), ("bfloat16", N_BF16)):
            for m in range(n_m):
                seed = SEED0 + m
                key = member_key(it, seed, mprec)
                path = os.path.join(ENS_DIR, key + ".json")
                if os.path.exists(path):
                    continue
                t0 = time.time()
                p = it["prec"]
                lad = construct_iterative_ladder_device(
                    tgt, target_swap_acceptance_rate=it["rate"],
                    N_samples_swap_est=p["n_samples"],
                    tolerance=p["tolerance"],
                    max_pn_adjustment_steps=p["max_pn_steps"],
                    convergence_failure_tolerance_factor=p[
                        "fail_tol_factor"],
                    seed=seed, matmul_precision=mprec)
                tmp = path + f".tmp{os.getpid()}"
                json.dump(lad, open(tmp, "w"))
                os.replace(tmp, path)
                print(f"{key}: T={len(lad)} ({time.time() - t0:.1f}s)",
                      flush=True)


def stage_stat():
    import pt_stationary_swap as ss

    summary = []
    for it in worklist():
        members = []
        for mprec, n_m in (("float32", N_F32), ("bfloat16", N_BF16)):
            for m in range(n_m):
                seed = SEED0 + m
                key = member_key(it, seed, mprec)
                path = os.path.join(ENS_DIR, key + ".json")
                if not os.path.exists(path):
                    continue
                lad = json.load(open(path))
                t0 = time.time()
                # Coarser grids than the referee's (n_z 2^18 vs 2^21,
                # n_cap 2^20 vs 2^23): measured delta vs the referee grid is
                # < 4e-7 on the worst case (RoughCarpet d30 T=15), ~1e4x
                # below the ~3e-3 offsets being resolved, at ~15x the speed.
                res = ss.ladder_accept(it["target"], it["dim"], lad,
                                       n_z=1 << 18, n_cap=1 << 20)
                members.append(dict(seed=seed, matmul_precision=mprec,
                                    T=len(lad), betas=lad,
                                    stat=res["mean"]))
                print(f"  {key}: T={len(lad)} stat={res['mean']:.5f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        stats_f32 = np.array([m["stat"] for m in members
                              if m["matmul_precision"] == "float32"])
        stats_all = np.array([m["stat"] for m in members])
        ref = it["ref_acc"]
        row = dict(it, members=members)
        del row["prec"]
        row["precision_flags"] = it["prec"]
        if len(stats_all):
            row["stat_f32_mean"] = float(stats_f32.mean())
            row["stat_f32_std"] = float(stats_f32.std())
            row["stat_all_min"] = float(stats_all.min())
            row["stat_all_max"] = float(stats_all.max())
            row["T_values"] = sorted({m["T"] for m in members})
            row["ref_inside_envelope"] = bool(
                stats_all.min() - 1e-4 <= ref <= stats_all.max() + 1e-4)
            row["ref_dist_to_nearest"] = float(
                np.min(np.abs(stats_all - ref)))
            row["ref_quantile_all"] = float(np.mean(stats_all <= ref))
        summary.append(row)
        print(f"{it['family']} pt{it['idx']} rate={it['rate']:.4f}: "
              f"ref={ref:.4f} ours={it['our_acc']:.4f} "
              f"ens[{row.get('stat_all_min', float('nan')):.4f},"
              f"{row.get('stat_all_max', float('nan')):.4f}] "
              f"T={row.get('T_values')} "
              f"ref_inside={row.get('ref_inside_envelope')}", flush=True)
    json.dump({"summary": summary,
               "n_f32": N_F32, "n_bf16": N_BF16,
               "method": "device SA rebuilds scored by exact stationary "
                         "swap acceptance (pt_stationary_swap.py)"},
              open(OUT, "w"), indent=1)
    print(f"wrote {OUT}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=("build", "stat"), required=True)
    args = p.parse_args(argv)
    if args.stage == "build":
        stage_build()
    else:
        stage_stat()


if __name__ == "__main__":
    main()
