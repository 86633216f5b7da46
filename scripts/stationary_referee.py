"""Stationary referee for flagged parity-matrix rows.

For each family whose worst grid points breach both z bars, measure the
EXACT stationary acceptance rate at those points: chains initialized from
the target's exact sampler are in equilibrium at step 0, so the measured
acceptance is the kernel's true stationary value — protocol-free ground
truth that both the reference's committed value and our protocol-matched
value approach as their (shared) origin-init transient dies.

Verdict per point:
  * ours ≈ stationary ≠ ref  -> reference-side transient / legacy-init
    artifact (footnote (b)/(d) class)
  * ref ≈ stationary ≠ ours  -> semantics bug on our side (investigate!)
  * neither                  -> both runs transient-dominated at this
    iteration count (footnote (c) class)

Usage:
  python scripts/stationary_referee.py [--families f1,f2] [--cpu]
  writes data/stationary_referee.json
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "parity_batch", os.path.join(REPO, "scripts", "parity_batch.py"))
pb = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pb)

# flagged families (breach both z bars, no (a)/(b)/(e) note, not awaiting
# the PT production-point reruns) -> number of worst points to referee
FLAGGED = [
    "EvenRosenbrock_RWM_GPU_dim30_100000iters",
    "HybridRosenbrock_Normal_RWM_GPU_dim5_1000000iters",
    "NealFunnel_Normal_RWM_GPU_dim30_1000000iters",
    "NealFunnel_RWM_GPU_dim10_300000iters",
    "ThreeMixture_RWM_dim10_100000iters",
    "ThreeMixture_RWM_dim5_100000iters",
    "ThreeMixture_Normal_RWM_GPU_dim2_200000iters",
    "RoughCarpet_Normal_RWM_GPU_dim2_200000iters",
    "Hypercube_Normal_RWM_GPU_dim2_200000iters",
    "Hypercube_Normal_RWM_GPU_dim2_300000iters",
    "Hypercube_Normal_RWM_GPU_dim20_200000iters",
    "Hypercube_Normal_RWM_GPU_dim30_200000iters",
    "Hypercube_RWM_GPU_dim100_300000iters",
    "IIDBeta_Normal_RWM_GPU_dim2_100000iters",
    "IIDBeta_Normal_RWM_GPU_dim5_100000iters",
    "IIDGamma_Normal_RWM_GPU_dim5_100000iters",
    "MultivariateNormal_UniformRadius_RWM_GPU_dim5_200000iters",
    "EvenRosenbrock_RWM_GPU_dim30_1000000iters",
    "RoughCarpet_Normal_RWM_GPU_dim20_200000iters",
]
TOP_POINTS = 3


def worst_points(summary):
    """Indices of the TOP_POINTS rows by z (fallback |Δacc|)."""
    rows = summary["rows"]

    def score(r):
        d = abs(r["our_acc"] - r["ref_acc"])
        sd = r.get("ref_acc_seed_std") or 0
        return d / sd if sd else d

    order = sorted(range(len(rows)), key=lambda i: -score(rows[i]))
    return sorted(order[:TOP_POINTS])


def funnel_exact_sample(target, key, n):
    import jax
    import jax.numpy as jnp
    kv, kz = jax.random.split(key)
    v = (target.mu_v
         + jnp.sqrt(target.sigma_v_sq) * jax.random.normal(kv, (n,)))
    z = (target.mu_z + jnp.exp(v[:, None] / 2.0)
         * jax.random.normal(kz, (n, target.dim - 1)))
    return jnp.concatenate([v[:, None], z], axis=1)


def referee_family(fam, num_chains, num_iters, burn_in, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rwm_pt_tpu.kernels import run_rwm

    summary = json.load(open(os.path.join(pb.OUT_DIR, fam + ".json")))
    files = pb.list_families()[fam]
    meta = pb.parse_family(fam, files[0])
    if "hybrid_n1n2" in summary:
        hybrid = tuple(summary["hybrid_n1n2"])
    else:
        hybrid = None
    meta = dict(meta, variant=summary.get("variant", meta["variant"]))
    target = pb._make_target(meta, 1000, hybrid, "coord")
    pts = worst_points(summary)
    rows = summary["rows"]
    grid = [rows[i]["scale"] for i in pts]
    props = pb._make_props(dict(meta), np.asarray(grid))

    if meta["target"] == "NealFunnel":
        def sampler(k, n):
            return funnel_exact_sample(target, k, n)
    else:
        def sampler(k, n):
            return target.direct_sample(k, n)

    key = jax.random.key(seed)

    def one(prop, k):
        x0 = sampler(jax.random.fold_in(k, 0xE0), num_chains).T
        res = run_rwm(target, prop, k, num_chains=num_chains,
                      num_iterations=num_iters, burn_in=burn_in,
                      init_states=x0)
        return (jnp.mean(res.acceptance_rate),
                jnp.std(res.acceptance_rate))

    fn = jax.jit(jax.vmap(one, in_axes=(0, 0)))
    keys = jax.vmap(lambda j: jax.random.fold_in(key, j))(
        jnp.arange(len(pts)))
    acc, acc_sd = jax.block_until_ready(fn(props, keys))
    acc = np.asarray(acc)
    se = np.asarray(acc_sd) / num_chains ** 0.5

    out = []
    for j, i in enumerate(pts):
        r = rows[i]
        st, s = float(acc[j]), float(se[j])
        d_ref, d_ours = r["ref_acc"] - st, r["our_acc"] - st
        verdict = ("ours=stationary" if abs(d_ours) <= max(3 * s, 0.003)
                   else "ref=stationary" if abs(d_ref) <= max(3 * s, 0.003)
                   else "both-transient")
        out.append({"point": i, "scale": r["scale"],
                    "ref_acc": r["ref_acc"], "our_acc": r["our_acc"],
                    "stationary_acc": st, "stationary_se": s,
                    "verdict": verdict})
        print(f"  pt{i} scale={r['scale']:.4g}: ref={r['ref_acc']:.4f} "
              f"ours={r['our_acc']:.4f} stationary={st:.4f}±{s:.4f} "
              f"-> {verdict}", flush=True)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--families", type=str, default=None)
    p.add_argument("--num_chains", type=int, default=4096)
    p.add_argument("--num_iters", type=int, default=20000)
    p.add_argument("--burn_in", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="data/stationary_referee.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    fams = args.families.split(",") if args.families else FLAGGED
    results = json.load(open(args.out)) if os.path.exists(args.out) else {}
    for fam in fams:
        if fam in results:
            continue
        print(f"== {fam}", flush=True)
        t0 = time.time()
        try:
            results[fam] = referee_family(fam, args.num_chains,
                                          args.num_iters, args.burn_in,
                                          args.seed)
        except NotImplementedError as e:
            print(f"  no exact sampler: {e}", flush=True)
            results[fam] = {"error": "no exact sampler"}
        print(f"  ({time.time() - t0:.0f}s)", flush=True)
        json.dump(results, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
