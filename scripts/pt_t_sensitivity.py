"""Rung-count sensitivity of the recorded PT swap rate (exact).

The SA ladder construction's discrete outcome is the rung count T: a build
that stops one candidate earlier/later realizes T∓1 before appending
beta_min (reference pt_rwm_gpu_optimized.py:385-422).  For each flagged
parity point this computes, with the exact stationary machinery
(scripts/pt_stationary_swap.py):

  * stat(T)   — our realized ladder;
  * stat(T+1) — our ladder with one idealized extra SA rung: beta+ chosen
    by bisection so the exact stationary pair acceptance
    a(beta_last_interior, beta+) equals the target rate (the acceptance
    condition every SA-accepted rung satisfies to tolerance);
  * stat(T-1) — our ladder with the last interior rung removed.

|stat(T±1) − stat(T)| is the per-rung construction sensitivity da/dT — the
yardstick against which the committed-vs-ours offsets (+0.003..+0.009) are
judged in docs/PARITY_MATRIX.md footnote (q).

Writes data/pt_t_sensitivity.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import pt_stationary_swap as ss  # noqa: E402

REF = os.path.join(REPO, "data", "pt_stationary_referee.json")
OUT = os.path.join(REPO, "data", "pt_t_sensitivity.json")

FLAGGED = [
    ("RoughCarpet_PT_GPU_dim10_200000iters", [8]),
    ("RoughCarpet_PT_GPU_dim30_200000iters", [6]),
    ("RoughCarpet_PT_GPU_dim10_500000iters", [6, 9]),
    ("RoughCarpet_PT_GPU_dim30_500000iters", [5, 6, 7, 8, 9]),
    ("RoughCarpet_PT_GPU_dim20_200000iters", [8]),
    ("ThreeMixture_PT_GPU_dim20_500000iters", [8, 9]),
    ("MultivariateNormal_PT_GPU_dim20_500000iters", [6]),
]


def next_sa_rung(target, dim, beta_prev, rate, lo_floor=1e-4):
    """beta+ < beta_prev with exact stationary pair acceptance == rate
    (bisection; a(beta_prev, b) is monotone increasing in b)."""
    # Grids as in pt_ladder_ensemble.py stage_stat: measured delta vs the
    # referee's full grids < 4e-7 on the worst case, ~15x faster.
    lo, hi = lo_floor, beta_prev * 0.999
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        a = ss.pair_accept(target, dim, beta_prev, mid,
                           n_z=1 << 18, n_cap=1 << 20)
        if a < rate:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def main():
    ref = json.load(open(REF))["points"]
    out = []
    for fam, idxs in FLAGGED:
        for i in idxs:
            p = next(x for x in ref if x["family"] == fam and x["idx"] == i)
            target = ("MultivariateNormal" if "MultivariateNormal" in fam
                      else "ThreeMixture" if "ThreeMixture" in fam
                      else "RoughCarpet")
            dim = int(fam.split("dim")[1].split("_")[0])
            betas = p["betas"] if "betas" in p else None
            if betas is None:
                lad = json.load(open(os.path.join(
                    REPO, "data", "ladder_cache", p["ladder_key"] + ".json")))
            else:
                lad = betas
            rate = p["target_rate"]
            t0 = time.time()
            base = p["stat"]
            # T+1: idealized extra SA rung between the last interior rung
            # and the appended beta_min
            bplus = next_sa_rung(target, dim, lad[-2], rate)
            if bplus > lad[-1] * 1.000001:
                lad_plus = lad[:-1] + [bplus, lad[-1]]
                stat_plus = ss.ladder_accept(
                    target, dim, lad_plus,
                    n_z=1 << 18, n_cap=1 << 20)["mean"]
            else:
                # The next SA rung falls at/below the appended beta_min —
                # the construction would have stopped (reference
                # pt_rwm_gpu_optimized.py:385-422 rejects beta* <= beta_min),
                # so a T+1 outcome is only reachable via a shifted whole
                # ladder; the ensemble instrument measures that empirically.
                stat_plus = None
            # T-1: last interior rung removed
            lad_minus = lad[:-2] + [lad[-1]]
            stat_minus = ss.ladder_accept(target, dim, lad_minus,
                                          n_z=1 << 18, n_cap=1 << 20)["mean"]
            row = dict(family=fam, idx=i, target_rate=rate, T=len(lad),
                       stat=base, stat_plus=stat_plus,
                       stat_minus=stat_minus,
                       dstat_plus=(None if stat_plus is None
                                   else stat_plus - base),
                       dstat_minus=stat_minus - base,
                       ref_minus_stat=p["ref_minus_stat"],
                       elapsed_s=round(time.time() - t0, 1))
            out.append(row)
            plus_txt = ("T+1 unrealizable (next SA rung < beta_min)"
                        if stat_plus is None else
                        f"T+1={stat_plus:.5f} ({row['dstat_plus']:+.5f})")
            print(f"{fam} pt{i}: stat(T={len(lad)})={base:.5f} "
                  f"{plus_txt} "
                  f"T-1={stat_minus:.5f} ({row['dstat_minus']:+.5f}) "
                  f"vs ref-stat={p['ref_minus_stat']:+.5f} "
                  f"[{row['elapsed_s']}s]", flush=True)
    json.dump({"rows": out}, open(OUT, "w"), indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
