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

# family -> grid points to redo at PRODUCTION ladder precision (indices
# into the stride-3 grid): the low-target-rate points, where the
# standard-precision construction artifact (dense ladder + appended-β_min
# hot pair) dominates the delta.
POINTS = {
    # impact order (worst unexplained z first).  The rate-0.01 (pt0)
    # points were initially excluded on cost grounds (their production SA
    # build fails the strict tolerance and grinds 30-90 CPU-minutes per
    # point); round 4 builds those ladders too
    # (scripts/build_rate001_ladders.py), replacing the std build's
    # dense-ladder artifact values — the production build lands in the
    # sparse/degenerate regime the committed campaign is in (footnote (p)),
    # and degenerate T<=2 realizations get excluded by the matrix
    # (`excl` text).
    "MultivariateNormal_PT_GPU_dim20_500000iters": [0, 1],
    # d30/500k: ALL flagged points at production precision — the std+acc_se
    # rerun of its mid/high-rate points realized different cheap ladders
    # (e.g. T=14 vs the original T=15 at rate 0.4155, moving the achieved
    # rate by 0.009 between two std builds of the SAME target/rate), so for
    # this family only the production construction the committed campaign
    # actually used is apples-to-apples.
    "MultivariateNormal_PT_GPU_dim30_500000iters": [1, 3, 2, 8, 6, 7, 9],
    "RoughCarpet_PT_GPU_dim30_500000iters": [0, 1, 2, 3],
    "ThreeMixture_PT_GPU_dim20_500000iters": [0, 1],
    "ThreeMixture_PT_GPU_dim10_500000iters": [0, 2, 1],
    "MultivariateNormal_PT_GPU_dim10_200000iters": [0, 2],
    "RoughCarpet_PT_GPU_dim10_500000iters": [0, 1],
    }

# family -> mid-grid z>2 points re-run at STANDARD precision purely to
# record the per-replica acc_se, which feeds the honest-z (z_MC) column;
# the small mid-grid offsets are the footnote-(e) ladder-realization
# mechanism.  NOTE: the SA build's rung count T is a discrete,
# stream-sensitive outcome, so a std rerun may realize a DIFFERENT ladder
# than the committed row (measured: T=14 vs T=15 at the same target/rate);
# parity_vs_reference.py --merge_into therefore attaches acc_se only (no
# row replacement) whenever the rerun's T mismatches the committed row's.
STD_POINTS = {
    # impact order: families whose committed-bar pass additionally needs
    # the honest-z denominator at mid-grid points come first; the
    # RoughCarpet families (already root-caused, footnote (e)) last
    "ThreeMixture_PT_GPU_dim20_500000iters": [8, 9],
    "MultivariateNormal_PT_GPU_dim20_500000iters": [6],
    "MultivariateNormal_PT_GPU_dim30_500000iters": [6, 7, 8, 9],
    "ThreeMixture_PT_GPU_dim10_500000iters": [7],
    "RoughCarpet_PT_GPU_dim10_500000iters": [6, 9],
    "RoughCarpet_PT_GPU_dim30_500000iters": [5, 6, 7, 8, 9],
    "RoughCarpet_PT_GPU_dim10_200000iters": [8],
    "RoughCarpet_PT_GPU_dim20_200000iters": [8],
    "RoughCarpet_PT_GPU_dim30_200000iters": [6],
}
STD = ["--N_samples_swap_est", "50000",
       "--iterative_tolerance", "0.005",
       "--iterative_max_pn_steps", "100",
       "--iterative_fail_tol_factor", "3.0"]

PROD = ["--N_samples_swap_est", "1000000",
        "--iterative_tolerance", "0.0001",
        "--iterative_max_pn_steps", "1000",
        "--iterative_fail_tol_factor", "1"]


def fam_path(fam):
    for d in (OUT_DIR, os.path.join(REPO, "data", "parity_r2")):
        p = os.path.join(d, fam + ".json")
        if os.path.exists(p):
            return p
    raise FileNotFoundError(fam)


def todo(fam, pts, production=True):
    """Points not yet re-run (production tag / recorded acc_se)."""
    s = json.load(open(fam_path(fam)))
    out = []
    for i in pts:
        lp = s["rows"][i].get("ladder_precision")
        done = (isinstance(lp, dict)
                and lp.get("N_samples_swap_est") == 1000000) if production \
            else "acc_se" in s["rows"][i]
        if not done:
            out.append(i)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--list", action="store_true")
    p.add_argument("--family", action="append", default=None)
    p.add_argument("--std_only", action="store_true",
                   help="run only the cheap std+acc_se points (no "
                        "production-ladder dependency)")
    p.add_argument("--production_only", action="store_true")
    args = p.parse_args(argv)

    work = ([(f, p, True) for f, p in POINTS.items()]
            + [(f, p, False) for f, p in STD_POINTS.items()])
    if args.std_only:
        work = [w for w in work if not w[2]]
    if args.production_only:
        work = [w for w in work if w[2]]
    for fam, pts, production in work:
        if args.family and fam not in args.family:
            continue
        left = todo(fam, pts, production)
        kind = "production" if production else "std+acc_se"
        if args.list:
            print(f"{fam}: {len(left)}/{len(pts)} {kind} points to do {left}")
            continue
        if not left:
            continue
        avg = [a for a in glob.glob(os.path.join(AVG_DIR, "*.json"))
               if os.path.basename(a).startswith(fam + "_seeds")]
        assert len(avg) == 1, (fam, avg)
        print(f"== {fam}: {kind} points {left} ==", flush=True)
        # one family per SUBPROCESS: a TPU device fault poisons the client,
        # so families stay isolated, but points within a family share one
        # process — one TPU init, and the persistent compile cache
        # (parity_vs_reference.py header) serves repeat (dim, T) shapes
        cmd = [sys.executable,
               os.path.join(REPO, "scripts", "parity_vs_reference.py"),
               "--ref_file", avg[0], "--match_protocol",
               "--stride", "3",
               "--points", ",".join(str(i) for i in left),
               "--ladder_device", "cpu",
               "--ladder_cache",
               os.path.join(REPO, "data", "ladder_cache"),
               "--merge_into", fam_path(fam)
               ] + (PROD if production else STD)
        try:
            # hard timeout: the tunnel intermittently HANGS device calls
            # (not just faults); a hung family must not eat the batch.
            # 500k x 512-chain PT runs take 30-90 s plus compile; production
            # ladders come from the cache.
            rc = subprocess.call(cmd, timeout=300 + 600 * len(left))
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc != 0:
            print(f"    points {left} FAILED (rc={rc}); continuing",
                  flush=True)


if __name__ == "__main__":
    main()
