"""Batch protocol-matched parity sweeps for EVERY committed reference RWM
sweep family.

Round 2's matrix (docs/PARITY_MATRIX.md) covered 25 representative families;
the reference's data/ actually contains ~150 sweep families (every
target x proposal x dim x iteration-count campaign, 5-40 seeds each).  This
driver closes the gap: it enumerates all reference RWM families not yet
covered, seed-averages each (analysis/average_seeds.py), re-runs the sweep
under the reference's exact protocol, and writes per-family summaries in the
parity_vs_reference.py schema so scripts/summarize_parity.py can merge
everything into one matrix.

TPU-first mechanics (this is what makes ~120 families tractable in hours):

* The whole 40-point grid runs as ONE XLA program per family:
  ``vmap(run_rwm)`` over the stacked proposal pytree + per-point keys.  One
  compile, one dispatch, two scalar-array fetches per family — instead of 40
  sequential runs with per-point device->host syncs over the TPU tunnel.
* "Scaled" targets (MultivariateNormalScaled / RoughCarpetScaled /
  ThreeMixtureScaled) draw their per-coordinate scaling factors from the
  GLOBAL torch RNG at construction time, BEFORE any manual_seed
  (/root/reference/experiment_RWM_GPU.py:200 constructs the target;
  interfaces/simulation_gpu.py:143-148 seeds afterwards) — so every
  reference seed-job sampled a DIFFERENT random target realization
  c ~ U(0.02, 1.98)^d.  The faithful comparison is therefore an ensemble:
  we vmap additionally over R realizations (seeded draws from the same law)
  and compare ensemble means; the reference's across-seed spread at these
  families honestly includes realization variance (unlike its collapsed
  increment streams, PARITY_MATRIX.md caveat (d)).
* HybridRosenbrock files record only ``dim``; (n1, n2) is not recoverable
  (1 + n2(n1-1) = dim has several solutions, and the committed sbatch shows
  a different setting than the argparse default).  ``--hybrid_forensics``
  scores every candidate (n1, n2) on a strided sweep and the full run uses
  the best-matching one; all candidate scores are recorded in the summary.

Usage:
  python scripts/parity_batch.py --list            # show the work queue
  python scripts/parity_batch.py                   # run everything (TPU)
  python scripts/parity_batch.py --family FullRosenbrock_RWM_GPU_dim10_100000iters
  python scripts/parity_batch.py --cpu --smoke     # tiny harness check
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/data"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AVG_DIR = os.path.join(REPO, "data", "ref_averaged")
OUT_DIR = os.path.join(REPO, "data", "parity_r3")
COVERED_DIRS = (os.path.join(REPO, "data", "parity_r2"), OUT_DIR)

# families to skip: sub-10k-iteration smoke artifacts
MIN_ITERS = 10_000
# max chain-steps per device call: one XLA execution lasting minutes dies
# with UNAVAILABLE over the tunnel, so big sweeps are split along the grid
CHUNK_BUDGET = 2.5e9

# (n1, n2) candidates per committed HybridRosenbrock dim: all integer
# solutions of 1 + n2(n1-1) = dim with 2 <= n1 <= 16, n2 >= 1
def hybrid_candidates(dim):
    c = [(n1, (dim - 1) // (n1 - 1)) for n1 in range(2, 17)
         if (dim - 1) % (n1 - 1) == 0]
    if dim <= 32 and (dim, 1) not in c:
        c.append((dim, 1))        # single-block solution
    return c


def list_families():
    """All reference sweep families -> {family: [seed files]}."""
    fams = collections.defaultdict(list)
    for f in sorted(glob.glob(os.path.join(REF_DATA, "*.json"))):
        b = os.path.basename(f)[:-5]
        if "averaged" in b or "single_run" in b:
            continue
        fams[re.sub(r"_seed\d+", "", b)].append(f)
    return dict(fams)


def covered():
    out = set()
    for d in COVERED_DIRS:
        for p in glob.glob(os.path.join(d, "*.json")):
            out.add(os.path.basename(p)[:-5].replace("_production", ""))
    return out


def parse_family(fam, sample_file):
    """Family metadata: schema handles three generations of reference files
    (CPU experiment_RWM.py, pre-proposal experiment_RWM_GPU.py, current)."""
    d = json.load(open(sample_file))
    meta = {"family": fam, "is_pt": "swap_acceptance_rates_range" in d}
    m = re.match(r"(?P<target>[A-Za-z]+?)(?:_(?P<prop>Normal|Laplace|UniformRadius))?"
                 r"_(?P<alg>RWM_GPU|PT_GPU|RWM|PTrwm)_dim(?P<dim>\d+)_"
                 r"(?:seed\d+_)?(?P<iters>\d+)iters", fam)
    if not m:
        raise ValueError(f"unparseable family name: {fam}")
    meta["target"] = d.get("target_distribution") or m.group("target")
    meta["proposal"] = d.get("proposal_distribution") or m.group("prop") or "Normal"
    meta["dim"] = int(d.get("dimension") or m.group("dim"))
    meta["iters"] = int(d.get("num_iterations") or m.group("iters"))
    meta["alg"] = m.group("alg")
    # which reference factory built the target (registry.py docstring):
    # GPU campaigns -> experiment_RWM_GPU.py constants; CPU campaign
    # (alg == 'RWM') -> the numpy classes' +-15 constants
    meta["variant"] = "cpu" if meta["alg"] == "RWM" else "rwm_gpu"
    # CPU campaign: burn_in=0 and acceptance over all steps
    # (interfaces/simulation.py:23, experiment_RWM.py:57-67); GPU campaign:
    # burn_in 1000 (experiment_*_GPU.py run_study default)
    meta["burn_in"] = 0 if meta["alg"] == "RWM" else 1000
    meta["scaled"] = meta["target"].endswith("Scaled")
    return meta


def averaged_curve(fam, files):
    """Seed-average the family into data/ref_averaged (cached)."""
    from rwm_pt_tpu.analysis.average_seeds import (average_experiment_data,
                                                   generate_output_filename)
    seeds = sorted(int(m.group(1)) for f in files
                   if (m := re.search(r"seed(\d+)", os.path.basename(f))))
    out_name = generate_output_filename(fam, seeds)
    out_path = os.path.join(AVG_DIR, out_name)
    if os.path.exists(out_path):
        return json.load(open(out_path))
    avg = average_experiment_data(files)
    os.makedirs(AVG_DIR, exist_ok=True)
    json.dump(avg, open(out_path, "w"), indent=2)
    return avg


def _make_target(meta, seed, hybrid_n1n2=None, scaling_law="coord", **kw):
    from rwm_pt_tpu.targets import get_target_distribution
    kwargs = dict(kw)
    if meta["target"] == "HybridRosenbrock":
        n1, n2 = hybrid_n1n2
        kwargs.update(n1=n1, n2=n2)
    if meta["scaled"]:
        kwargs.update(seed=seed)
        if scaling_law == "inv":
            # legacy era (the 100k/300k-iter ThreeMixtureScaled campaigns):
            # coordinates scaled by s = 1/U(0.02, 1.98) — the inverse of
            # today's torch class (multimodal_torch.py:80-90).  Recovered
            # forensically: this law reproduces the committed acceptance
            # curves at d=20/30/50 across both campaigns to ~realization
            # noise, while today's law is off by up to 0.46 acceptance.
            rng = np.random.default_rng(seed)
            kwargs.update(
                scaling_factors=1.0 / rng.uniform(0.02, 1.98, meta["dim"]))
        if meta["variant"] == "cpu" and meta["target"] == "ThreeMixtureScaled":
            # CPU numpy classes scale the COVARIANCE, not the coordinates:
            # covs *= v with v ~ U(1e-6, 2) (multimodal.py:26-29).
            # N(x | mu, diag(v)) = prod(c) N(x c | mu c, I) with c = 1/sqrt(v),
            # so it maps exactly onto the coordinate-scaled model with
            # explicit factors c and centers mu*c.
            dim = meta["dim"]
            v = np.random.default_rng(seed).uniform(1e-6, 2.0, dim)
            c = 1.0 / np.sqrt(v)
            off = 15.0  # CPU ThreeMixture modes +-15*e1 (multimodal.py:19-25)
            mu = np.array([[-off] + [0.0] * (dim - 1), [0.0] * dim,
                           [off] + [0.0] * (dim - 1)])
            kwargs.update(scaling_factors=c, mode_centers=(mu * c).tolist())
    return get_target_distribution(meta["target"], meta["dim"],
                                   variant=meta["variant"], **kwargs)


def _make_props(meta, grid):
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.proposals import (LaplaceProposal, NormalProposal,
                                      UniformRadiusProposal)
    dim = meta["dim"]
    mk = {
        "Normal": lambda s: NormalProposal.create(dim, float(s) ** 2 / dim),
        "Laplace": lambda s: LaplaceProposal.create(dim, float(s) ** 2 / dim),
        "UniformRadius": lambda s: UniformRadiusProposal.create(dim, float(s)),
    }[meta["proposal"]]
    props = [mk(s) for s in grid]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *props)


def run_family(meta, ref, num_chains=512, realizations=16, seed=0,
               stride=1, hybrid_n1n2=None, scaling_law="coord"):
    """One vmapped protocol-matched sweep.  Returns parity rows."""
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_rwm

    grid = np.asarray(ref.get("var_value_range")
                      or ref["scale_param_range"])[::stride]
    G = len(grid)
    R = realizations if meta["scaled"] else 1
    C = max(128, (num_chains // R) // 128 * 128)
    num_iters, burn_in = meta["iters"], meta["burn_in"]

    targets = [_make_target(meta, 1000 + r, hybrid_n1n2, scaling_law)
               for r in range(R)]
    tb = (jax.tree.map(lambda *xs: jnp.stack(xs), *targets) if R > 1
          else targets[0])
    props = _make_props(meta, grid)
    base = jax.random.key(seed)
    keys = jax.vmap(lambda i: jax.vmap(lambda j: jax.random.fold_in(
        jax.random.fold_in(base, i), j))(jnp.arange(G)))(jnp.arange(R))

    def one(tgt, prop, key):
        res = run_rwm(tgt, prop, key, num_chains=C,
                      num_iterations=num_iters, burn_in=burn_in)
        # per-point on-device reduction: 4 scalars per grid point cross the
        # tunnel instead of per-chain arrays
        return (jnp.mean(res.acceptance_rate), jnp.std(res.acceptance_rate),
                jnp.mean(res.esjd), jnp.std(res.esjd))

    over_grid = jax.vmap(one, in_axes=(None, 0, 0))

    # Chunk the grid so no single device call runs for minutes: the largest
    # families (1e6 iters x 40 grid points, or 16-realization scaled sweeps)
    # repeatedly die with UNAVAILABLE device errors over the tunnel when run
    # as one XLA program, while the same work split into shorter calls
    # survives.  Budget ~2.5e9 chain-steps per call.
    work_per_pt = num_iters * C * R * max(1, meta["dim"] // 10)
    n_chunks = max(1, -(-G * work_per_pt // int(CHUNK_BUDGET)))
    csize = -(-G // n_chunks)

    def chunked(call):
        """call(lo, hi) -> 4-tuple over grid slice; concat over chunks."""
        outs = [jax.block_until_ready(call(lo, min(lo + csize, G)))
                for lo in range(0, G, csize)]
        return [np.concatenate([np.asarray(o[i]) for o in outs], axis=-1)
                for i in range(4)]

    if R > 1:
        fn = jax.jit(jax.vmap(over_grid, in_axes=(0, None, 0)))
        acc, acc_sd, esjd, esjd_sd = chunked(
            lambda lo, hi: fn(tb, jax.tree.map(lambda x: x[lo:hi], props),
                              keys[:, lo:hi]))
        acc_np, esjd_np = np.asarray(acc), np.asarray(esjd)
        our_acc, our_esjd = acc_np.mean(0), esjd_np.mean(0)
        # ensemble spread across target realizations (the analog of the
        # reference's across-seed spread at scaled families), plus the
        # min-max band: a single-realization reference curve should lie
        # inside it
        our_acc_real_sd = acc_np.std(0, ddof=1)
        our_acc_band = (acc_np.min(0), acc_np.max(0))
        acc_se = our_acc_real_sd / R ** 0.5
    else:
        fn = jax.jit(over_grid)
        acc, acc_sd, esjd, esjd_sd = chunked(
            lambda lo, hi: fn(tb, jax.tree.map(lambda x: x[lo:hi], props),
                              keys[0, lo:hi]))
        our_acc, our_esjd = np.asarray(acc), np.asarray(esjd)
        acc_se = np.asarray(acc_sd) / C ** 0.5
        our_acc_real_sd = None
        our_acc_band = None

    ref_acc = np.asarray(ref["acceptance_rates"])[::stride]
    ref_esjd = np.asarray(ref["expected_squared_jump_distances"])[::stride]
    n_avg = ref.get("num_files_averaged", 1)
    acc_std = ref.get("acceptance_rates_seed_std")
    acc_std = (np.asarray(acc_std)[::stride] if acc_std is not None
               else [None] * G)

    rows = []
    for i in range(G):
        row = {"scale": float(grid[i]), "ref_acc": float(ref_acc[i]),
               "our_acc": float(our_acc[i]), "ref_esjd": float(ref_esjd[i]),
               "our_esjd": float(our_esjd[i]), "acc_se": float(acc_se[i])}
        if acc_std[i] is not None:
            row["ref_acc_se"] = float(acc_std[i]) / n_avg ** 0.5
            row["ref_acc_seed_std"] = float(acc_std[i])
        if our_acc_real_sd is not None:
            row["our_acc_realization_std"] = float(our_acc_real_sd[i])
            row["our_acc_realization_band"] = [float(our_acc_band[0][i]),
                                               float(our_acc_band[1][i])]
        rows.append(row)
    return rows, {"num_chains": C, "realizations": R}


def summarize(meta, ref, rows, extra, t0, protocol_matched=True):
    ours_acc = np.array([r["our_acc"] for r in rows])
    ref_acc = np.array([r["ref_acc"] for r in rows])
    ours_e = np.array([r["our_esjd"] for r in rows])
    ref_e = np.array([r["ref_esjd"] for r in rows])
    s = {
        "ref_file": meta["family"] + ".json",
        "algorithm": "PT" if meta["is_pt"] else "RWM",
        "engine": "scan-vmapped",
        "protocol": {"num_iters": meta["iters"], "burn_in": meta["burn_in"],
                     "num_chains": extra["num_chains"],
                     "target_realizations": extra["realizations"],
                     "matched": protocol_matched},
        "variant": meta["variant"],
        "num_ref_seeds": ref.get("num_files_averaged", 1),
        "max_abs_acc_diff": float(np.max(np.abs(ours_acc - ref_acc))),
        "esjd_curve_corr": float(np.corrcoef(ours_e, ref_e)[0, 1]),
        "ref_optimum_at": float(
            [r["scale"] for r in rows][int(np.argmax(ref_e))]),
        "our_optimum_at": float(
            [r["scale"] for r in rows][int(np.argmax(ours_e))]),
        "ref_acc_at_ref_optimum": float(ref_acc[int(np.argmax(ref_e))]),
        "our_acc_at_our_optimum": float(ours_acc[int(np.argmax(ours_e))]),
        "elapsed_s": time.time() - t0,
        "rows": rows,
    }
    for k in ("hybrid_n1n2", "hybrid_scores", "variant_scan",
              "scaling_scan"):
        if k in extra:
            s[k] = extra[k]
    spreads = np.array([r.get("ref_acc_seed_std", 0) or 0 for r in rows])
    if np.all(spreads > 0):
        z = np.abs(ours_acc - ref_acc) / spreads
        s["max_acc_z_vs_seed_spread"] = float(np.max(z))
        s["rows_beyond_2sd"] = int(np.sum(z > 2.0))
    return s


def hybrid_forensics(meta, ref, num_chains, seed):
    """Score every (n1, n2) candidate on a strided sweep; best = argmin of
    max|delta acc|.  The committed files don't record (n1, n2)."""
    scores = {}
    for cand in hybrid_candidates(meta["dim"]):
        rows, _ = run_family(meta, ref, num_chains=num_chains,
                             seed=seed, stride=4, hybrid_n1n2=cand)
        d = max(abs(r["our_acc"] - r["ref_acc"]) for r in rows)
        scores[f"{cand[0]},{cand[1]}"] = round(d, 5)
        print(f"    hybrid candidate n1={cand[0]:2d} n2={cand[1]:2d}: "
              f"max|dacc| {d:.4f}", flush=True)
    best = min(scores, key=scores.get)
    n1, n2 = map(int, best.split(","))
    return (n1, n2), scores


def scaling_scan(meta, ref, num_chains, seed):
    """Scaled multimodal campaigns predating the proposal-era files used a
    different (inverted) coordinate-scaling law; score both on a strided
    sweep (see _make_target's "inv" branch for the evidence)."""
    scores = {}
    for law in ("coord", "inv"):
        rows, _ = run_family(meta, ref, num_chains=num_chains, seed=seed,
                             stride=4, scaling_law=law)
        d = max(abs(r["our_acc"] - r["ref_acc"]) for r in rows)
        scores[law] = round(d, 5)
        print(f"    scaling law {law}: max|dacc| {d:.4f}", flush=True)
    best = min(scores, key=scores.get)
    return best, scores


def variant_scan(meta, ref, num_chains, seed):
    """For pre-proposal-era multimodal campaigns the factory constants are
    not recorded; score both candidate constant sets on a strided sweep."""
    scores = {}
    for variant in ("rwm_gpu", "pt_gpu"):
        m2 = dict(meta, variant=variant)
        rows, _ = run_family(m2, ref, num_chains=num_chains, seed=seed,
                             stride=4)
        d = max(abs(r["our_acc"] - r["ref_acc"]) for r in rows)
        scores[variant] = round(d, 5)
        print(f"    variant {variant}: max|dacc| {d:.4f}", flush=True)
    best = min(scores, key=scores.get)
    return best, scores


def work_queue(fams, cov, only=None):
    """Uncovered RWM families, highest-value first: never-checked target
    families, then the rest cheapest-first."""
    q = []
    for fam, files in fams.items():
        if fam in cov or (only and fam not in only):
            continue
        try:
            meta = parse_family(fam, files[0])
        except ValueError:
            print(f"  skipping unparseable: {fam}")
            continue
        if meta["iters"] < MIN_ITERS or meta["is_pt"]:
            continue
        q.append((meta, files))
    new_targets = ("FullRosenbrock", "HybridRosenbrock",
                   "MultivariateNormalScaled", "RoughCarpetScaled",
                   "ThreeMixtureScaled")
    q.sort(key=lambda mf: (0 if mf[0]["target"] in new_targets else 1,
                           mf[0]["iters"], mf[0]["family"]))
    return q


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--list", action="store_true")
    p.add_argument("--family", action="append", default=None,
                   help="run only these families (repeatable)")
    p.add_argument("--num_chains", type=int, default=512)
    p.add_argument("--realizations", type=int, default=16,
                   help="target realizations for Scaled families")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes to smoke-test the harness")
    p.add_argument("--out_dir", default=None,
                   help="override output dir (smoke runs default to /tmp)")
    args = p.parse_args(argv)
    global OUT_DIR
    if args.out_dir:
        OUT_DIR = args.out_dir
    elif args.smoke:
        OUT_DIR = "/tmp/parity_smoke"

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    fams = list_families()
    q = work_queue(fams, covered(), only=args.family)
    print(f"{len(q)} uncovered RWM families queued")
    if args.list:
        for meta, files in q:
            print(f"  {meta['family']}  ({len(files)} seeds, "
                  f"{meta['iters']} iters, variant={meta['variant']}"
                  f"{', scaled' if meta['scaled'] else ''})")
        return

    os.makedirs(OUT_DIR, exist_ok=True)
    done = 0
    failed = []
    consec_fail = 0
    for meta, files in q[:args.limit]:
        fam = meta["family"]
        out_path = os.path.join(OUT_DIR, fam + ".json")
        if os.path.exists(out_path):
            continue
        t0 = time.time()
        ref = averaged_curve(fam, files)
        if args.smoke:
            meta = dict(meta, iters=200)
        print(f"[{done + 1}] {fam}: {len(files)} seeds, {meta['iters']} iters"
              f" x {args.num_chains} chains, variant={meta['variant']}",
              flush=True)
        extra_fields = {}
        hybrid = None
        law = "coord"
        if (meta["scaled"] and meta["alg"] == "RWM_GPU"
                and "proposal_distribution" not in ref):
            law, lscores = scaling_scan(meta, ref, args.num_chains, args.seed)
            extra_fields["scaling_scan"] = lscores
        if meta["target"] == "HybridRosenbrock":
            hybrid, scores = hybrid_forensics(meta, ref, args.num_chains,
                                              args.seed)
            extra_fields["hybrid_n1n2"] = list(hybrid)
            extra_fields["hybrid_scores"] = scores
        # pre-proposal-era multimodal campaigns: constants not recorded
        if (meta["target"].startswith(("ThreeMixture", "RoughCarpet"))
                and meta["alg"] == "RWM_GPU"
                and "proposal_distribution" not in ref):
            best, scores = variant_scan(meta, ref, args.num_chains, args.seed)
            meta = dict(meta, variant=best)
            extra_fields["variant_scan"] = scores
        try:
            rows, extra = run_family(meta, ref, num_chains=args.num_chains,
                                     realizations=args.realizations,
                                     seed=args.seed, hybrid_n1n2=hybrid,
                                     scaling_law=law)
        except Exception as e:  # transient TPU device faults: skip, retry later
            failed.append(fam)
            consec_fail += 1
            print(f"    FAILED ({type(e).__name__}): {e}"[:300], flush=True)
            # a device error usually poisons the process's TPU client: after
            # two consecutive failures, bail out and let the outer runner
            # retry in a fresh process after a backoff
            if consec_fail >= 2:
                print("=== consecutive device failures; aborting pass ===",
                      flush=True)
                break
            time.sleep(30)
            continue
        consec_fail = 0
        extra.update(extra_fields)
        s = summarize(meta, ref, rows, extra, t0,
                      protocol_matched=not args.smoke)
        json.dump(s, open(out_path, "w"), indent=2)
        done += 1
        print(f"    max|dacc|={s['max_abs_acc_diff']:.4f} "
              f"z={s.get('max_acc_z_vs_seed_spread', float('nan')):.1f} "
              f"corr={s['esjd_curve_corr']:.3f}  ({s['elapsed_s']:.0f}s)",
              flush=True)
    print(f"done: {done} families -> {OUT_DIR}"
          + (f"; FAILED: {failed}" if failed else ""))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
