"""Capture the REFERENCE's own realized production ladders (torch-CPU) at
the footnote-(e) probe points, for exact stationary scoring.

Round 3 re-ran the reference's PT pipeline at RoughCarpet d20 rates
0.4155/0.3141 (production flags, torch-CPU, seeds 101-103) and recorded the
achieved swap rates + rung counts (data/ref_fresh_seeds.json `fresh_seed_pt`)
but not the realized beta ladders.  This captures the ladders themselves —
running the reference's own `_construct_iterative_ladder`
(pt_rwm_gpu_optimized.py:283-426) — so scripts/pt_stationary_swap.py can
certify the closing identity of footnote (q): every implementation's
protocol value equals the exact stationary functional of ITS OWN realized
ladder, leaving construction realization as the only degree of freedom.

Writes data/ref_fresh_ladders.json.  Costs ~30-60 CPU-min per (rate, seed)
at production precision — run in the background.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference")

OUT = os.path.join(REPO, "data", "ref_fresh_ladders.json")

POINTS = [  # (rate, seeds) — matches data/ref_fresh_seeds.json fresh_seed_pt
    (0.4155172414, [101, 102]),
    (0.314137931, [101, 102]),
]


def main():
    import torch

    from algorithms.pt_rwm_gpu_optimized import \
        ParallelTemperingRWM_GPU_Optimized
    from target_distributions.multimodal_torch import \
        RoughCarpetDistributionTorch

    out = {}
    if os.path.exists(OUT):
        out = json.load(open(OUT))
    # the PT experiment factory's constants: modes +-15, weights .5/.3/.2
    # (experiment_pt_GPU.py:34-47)
    target = RoughCarpetDistributionTorch(
        dim=20, scaling=False, mode_centers=[-15.0, 0.0, 15.0],
        mode_weights=[0.5, 0.3, 0.2], device="cpu")
    for rate, seeds in POINTS:
        for seed in seeds:
            key = f"RoughCarpet_d20_rate{rate:.10g}_seed{seed}"
            if key in out:
                print(f"{key}: cached T={len(out[key])}")
                continue
            torch.manual_seed(seed)
            t0 = time.time()
            algo = ParallelTemperingRWM_GPU_Optimized(
                dim=20, var=2.38 ** 2 / 20, target_dist=target,
                iterative_temp_spacing=True, swap_acceptance_rate=rate,
                N_samples_swap_est=1000000, iterative_tolerance=0.0001,
                iterative_max_pn_steps=1000, iterative_fail_tol_factor=1.0,
                device="cpu", pre_allocate_steps=None)
            ladder = [float(b) for b in algo.beta_ladder]
            out[key] = ladder
            tmp = OUT + f".tmp{os.getpid()}"
            json.dump(out, open(tmp, "w"), indent=1)
            os.replace(tmp, OUT)
            print(f"{key}: T={len(ladder)} ({time.time() - t0:.0f}s) "
                  f"{[round(b, 4) for b in ladder]}", flush=True)


if __name__ == "__main__":
    main()
