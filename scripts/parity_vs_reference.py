"""Statistical parity check against the reference's committed sweep results.

Re-runs the exact sweep grid recorded in a reference ``data/*.json`` file
(produced by experiment_RWM_GPU.py / experiment_pt_GPU.py) with this
framework's kernels and compares the acceptance-rate and ESJD curves.

Parity is *statistical* (SURVEY.md §7 "RNG parity"): torch-Philox vs
JAX-threefry streams can never agree bitwise, but acceptance rate and ESJD at
a given scale parameter are expectations — with ``--num_chains`` independent
chains the MC error of our estimate shrinks as 1/sqrt(chains·iters), so the
curves must coincide within a few MC standard errors wherever the reference's
own single-seed estimate is converged.

Usage:
  python scripts/parity_vs_reference.py \
      --ref_file /root/reference/data/Hypercube_RWM_GPU_dim10_100000iters_seed7.json \
      --num_iters 20000 --num_chains 512 [--stride 4] [--out data/parity.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_rwm_parity(ref, num_iters, num_chains, burn_in, stride, seed):
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_rwm
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import get_target_distribution

    dim = ref["dimension"]
    target = get_target_distribution(ref["target_distribution"], dim)
    # two reference schema generations ('var_value_range' older,
    # 'scale_param_range' newer); both store the *scale parameter* v with
    # proposal variance = v^2/dim (experiment_RWM.py:52,
    # experiment_RWM_GPU.py:218)
    grid = (ref.get("var_value_range") or ref["scale_param_range"])[::stride]
    variances = [s ** 2 / dim for s in grid]
    ref_acc = ref["acceptance_rates"][::stride]
    ref_esjd = ref["expected_squared_jump_distances"][::stride]
    key = jax.random.key(seed)

    rows = []
    for i, (var, ra, re) in enumerate(zip(variances, ref_acc, ref_esjd)):
        prop = NormalProposal.create(dim, float(var))
        res = jax.block_until_ready(
            run_rwm(target, prop, jax.random.fold_in(key, i),
                    num_chains=num_chains, num_iterations=num_iters,
                    burn_in=burn_in))
        acc = float(jnp.mean(res.acceptance_rate))
        esjd = float(jnp.mean(res.esjd))
        # MC standard error of our acceptance estimate (per-chain estimates
        # are iid); reference single-chain error is ~sqrt(a(1-a)/N_ref)
        acc_se = float(jnp.std(res.acceptance_rate) / num_chains ** 0.5)
        rows.append({"scale": grid[i], "variance": var, "ref_acc": ra,
                     "our_acc": acc, "ref_esjd": re, "our_esjd": esjd,
                     "acc_se": acc_se})
        print(f"  var={var:8.4f}  acc ref/ours {ra:.4f}/{acc:.4f}  "
              f"esjd ref/ours {re:.5f}/{esjd:.5f}", flush=True)
    return rows


def run_pt_parity(ref, num_iters, num_chains, burn_in, stride, seed,
                  n_samples_swap_est):
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_pt
    from rwm_pt_tpu.ladders import construct_iterative_ladder
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import get_target_distribution

    dim = ref["dimension"]
    target = get_target_distribution(ref["target_distribution"], dim)
    grid = ref["swap_acceptance_rates_range"][::stride]
    ref_acc = ref["acceptance_rates"][::stride]
    ref_esjd = ref["expected_squared_jump_distances"][::stride]
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    key = jax.random.key(seed)

    rows = []
    for i, (rate, ra, re) in enumerate(zip(grid, ref_acc, ref_esjd)):
        ladder = construct_iterative_ladder(
            target, target_swap_acceptance_rate=float(rate),
            N_samples_swap_est=n_samples_swap_est, seed=seed + i,
            verbose=False)
        res = jax.block_until_ready(
            run_pt(target, prop, jax.random.fold_in(key, i),
                   jnp.asarray(ladder, jnp.float32), num_chains=num_chains,
                   num_iterations=num_iters, burn_in=burn_in, swap_every=100))
        acc = float(jnp.mean(res.swap_acceptance_rate))
        esjd = float(jnp.mean(res.pt_esjd))
        rows.append({"target_rate": rate, "ref_acc": ra, "our_acc": acc,
                     "ref_esjd": re, "our_esjd": esjd, "T": len(ladder)})
        print(f"  rate={rate:6.4f}  swap-acc ref/ours {ra:.4f}/{acc:.4f}  "
              f"beta-esjd ref/ours {re:.5f}/{esjd:.5f}  T={len(ladder)}",
              flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref_file", required=True)
    p.add_argument("--num_iters", type=int, default=20000)
    p.add_argument("--num_chains", type=int, default=512)
    p.add_argument("--burn_in", type=int, default=1000)
    p.add_argument("--stride", type=int, default=1,
                   help="Evaluate every stride-th grid point")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--N_samples_swap_est", type=int, default=50000)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    ref = json.load(open(args.ref_file))
    is_pt = "swap_acceptance_rates_range" in ref
    print(f"Parity vs {os.path.basename(args.ref_file)} "
          f"({'PT' if is_pt else 'RWM'}, {ref['target_distribution']} "
          f"d={ref['dimension']}; ref {ref['num_iterations']} iters / 1 chain, "
          f"ours {args.num_iters} iters x {args.num_chains} chains)")
    t0 = time.time()
    if is_pt:
        rows = run_pt_parity(ref, args.num_iters, args.num_chains,
                             args.burn_in, args.stride, args.seed,
                             args.N_samples_swap_est)
    else:
        rows = run_rwm_parity(ref, args.num_iters, args.num_chains,
                              args.burn_in, args.stride, args.seed)

    import numpy as np
    ours_acc = np.array([r["our_acc"] for r in rows])
    ref_acc = np.array([r["ref_acc"] for r in rows])
    ours_e = np.array([r["our_esjd"] for r in rows])
    ref_e = np.array([r["ref_esjd"] for r in rows])
    summary = {
        "ref_file": os.path.basename(args.ref_file),
        "algorithm": "PT" if is_pt else "RWM",
        "max_abs_acc_diff": float(np.max(np.abs(ours_acc - ref_acc))),
        "esjd_curve_corr": float(np.corrcoef(ours_e, ref_e)[0, 1]),
        "ref_optimum_at": rows[int(np.argmax(ref_e))].get(
            "scale", rows[int(np.argmax(ref_e))].get("target_rate")),
        "our_optimum_at": rows[int(np.argmax(ours_e))].get(
            "scale", rows[int(np.argmax(ours_e))].get("target_rate")),
        "ref_acc_at_ref_optimum": float(ref_acc[int(np.argmax(ref_e))]),
        "our_acc_at_our_optimum": float(ours_acc[int(np.argmax(ours_e))]),
        "elapsed_s": time.time() - t0,
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                     indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        json.dump(summary, open(args.out, "w"), indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
