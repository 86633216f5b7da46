"""Re-run breaching grid points of the 500k-iteration PT families at the
reference's PRODUCTION ladder precision, merging in place.

The 500k-iteration PT campaigns were produced by `run_pt_gpu.sbatch`
(reference :30-40): `--N_samples_swap_est 1000000 --iterative_tolerance
0.0001 --iterative_max_pn_steps 1000 --iterative_fail_tol_factor 1`.  The
round-3 batch first covered them at the matrix's standard precision
(N=5e4 / tol=5e-3), which diverges exactly where ladder construction is
precision-sensitive: at the extreme-low target rates the cheap build
converges to a dense ladder whose final appended-β_min pair swaps at ~1
(inflating the mean swap rate), while the production build fails the strict
tolerance and stops at a sparse ladder — the regime the committed data is
in.  This driver re-runs only the points whose standard-precision rows
breach z≤2 (plus the rate-0.01 points), at production precision, and
merges them into the family summaries via
`parity_vs_reference.py --points --merge_into`.

Resumable: a point already carrying a production `ladder_precision` row tag
is skipped.

Usage: python scripts/pt_production_points.py [--list]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import subprocess  # noqa: E402

OUT_DIR = os.path.join(REPO, "data", "parity_r3")
AVG_DIR = os.path.join(REPO, "data", "ref_averaged")

# family -> standard-precision points to redo (indices into the stride-3
# grid; chosen = all z>2 points plus every rate-0.01 / adjacent low-rate
# point, from the audit of the standard-precision rows)
POINTS = {
    # 200k campaign whose low-rate points breach: same precision question
    "MultivariateNormal_PT_GPU_dim10_200000iters": [0, 2],
    "MultivariateNormal_PT_GPU_dim20_500000iters": [0, 1],
    "MultivariateNormal_PT_GPU_dim30_500000iters": [0, 1, 2, 3],
    "RoughCarpet_PT_GPU_dim10_500000iters": [0, 1, 6, 9],
    "RoughCarpet_PT_GPU_dim30_500000iters": [0, 1, 2, 3, 5, 6, 7, 8, 9],
    "ThreeMixture_PT_GPU_dim10_500000iters": [0, 1, 2],
    "ThreeMixture_PT_GPU_dim20_500000iters": [0, 1, 8, 9],
}

PROD = ["--N_samples_swap_est", "1000000",
        "--iterative_tolerance", "0.0001",
        "--iterative_max_pn_steps", "1000",
        "--iterative_fail_tol_factor", "1"]


def todo(fam, pts):
    """Points not yet carrying a production row tag."""
    path = os.path.join(OUT_DIR, fam + ".json")
    s = json.load(open(path))
    out = []
    for i in pts:
        lp = s["rows"][i].get("ladder_precision")
        if not (isinstance(lp, dict)
                and lp.get("N_samples_swap_est") == 1000000):
            out.append(i)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--list", action="store_true")
    p.add_argument("--family", action="append", default=None)
    args = p.parse_args(argv)

    for fam, pts in POINTS.items():
        if args.family and fam not in args.family:
            continue
        left = todo(fam, pts)
        if args.list:
            print(f"{fam}: {len(left)}/{len(pts)} points to do {left}")
            continue
        if not left:
            continue
        avg = [a for a in glob.glob(os.path.join(AVG_DIR, "*.json"))
               if os.path.basename(a).startswith(fam + "_seeds")]
        assert len(avg) == 1, (fam, avg)
        print(f"== {fam}: production points {left} ==", flush=True)
        # one point per SUBPROCESS: a TPU device fault poisons the client
        # for the rest of that process, so isolate each point
        for i in left:
            cmd = [sys.executable,
                   os.path.join(REPO, "scripts", "parity_vs_reference.py"),
                   "--ref_file", avg[0], "--match_protocol",
                   "--stride", "3", "--points", str(i),
                   "--ladder_device", "cpu",
                   "--ladder_cache",
                   os.path.join(REPO, "data", "ladder_cache"),
                   "--merge_into", os.path.join(OUT_DIR, fam + ".json")
                   ] + PROD
            rc = subprocess.call(cmd)
            if rc != 0:
                print(f"    point {i} FAILED (rc={rc}); continuing",
                      flush=True)


if __name__ == "__main__":
    main()
