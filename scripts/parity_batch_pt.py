"""Cover the remaining committed reference PT sweep families.

Every uncovered PT family is the sibling campaign (other iteration count)
of a family already in the matrix, so these run at the matrix's standard
precision (stride 3 → 10 of 30 grid points, 50k-sample ladder estimator,
tol 5e-3) like the round-2 standard rows; the production-precision
cross-checks for each target live in the `_production` rows.

Usage:  python scripts/parity_batch_pt.py [--list] [--stride 3]
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

_spec = importlib.util.spec_from_file_location(
    "parity_batch", os.path.join(REPO, "scripts", "parity_batch.py"))
pb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pb)


def queue():
    fams = pb.list_families()
    cov = pb.covered()
    q = []
    for fam, files in sorted(fams.items()):
        try:
            meta = pb.parse_family(fam, files[0])
        except ValueError:
            continue
        if meta["is_pt"] and meta["iters"] >= pb.MIN_ITERS and fam not in cov:
            q.append((meta, files))
    q.sort(key=lambda mf: mf[0]["iters"])
    return q


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--list", action="store_true")
    p.add_argument("--stride", type=int, default=3)
    p.add_argument("--num_chains", type=int, default=512)
    args = p.parse_args(argv)

    q = queue()
    print(f"{len(q)} uncovered PT families queued")
    if args.list:
        for meta, files in q:
            print(f"  {meta['family']} ({len(files)} seeds, {meta['iters']})")
        return

    import glob

    from parity_vs_reference import main as pvr_main
    for meta, files in q:
        fam = meta["family"]
        out = os.path.join(pb.OUT_DIR, fam + ".json")
        if os.path.exists(out):
            continue
        pb.averaged_curve(fam, files)          # cache the averaged ref file
        # averaged filename embeds the seed list; find it by family prefix
        avg = [a for a in glob.glob(os.path.join(pb.AVG_DIR, "*.json"))
               if os.path.basename(a).startswith(fam + "_seeds")]
        assert len(avg) == 1, (fam, avg)
        print(f"== {fam} ==", flush=True)
        pvr_main(["--ref_file", avg[0], "--match_protocol",
                  "--stride", str(args.stride),
                  "--num_chains", str(args.num_chains),
                  "--out", out])


if __name__ == "__main__":
    main()
