"""Exact stationary acceptance/ESJD curves for slow-mixing RWM families.

Settles the parity-matrix optimum-drift rows (docs/PARITY_MATRIX.md):
the reference's committed curves are trajectory averages over its exact
protocol (origin-ish init, burn-in 1000, 10^5-10^6 single-chain steps,
/root/reference/experiment_RWM_GPU.py:165-302) and are NOT equilibrated on
EvenRosenbrock / NealFunnel, so the location of the (flat) ESJD argmax is
transient- and noise-dominated.  Initializing chains from an *exact* sampler
puts the chain in equilibrium at step 0, so acceptance and ESJD measured here
are the target's true stationary values at each grid scale — the ground truth
both the reference curve and the protocol-matched parity runs approach.

Exact samplers used:
  * EvenRosenbrock — conditional-Gaussian (targets/rosenbrock.py:100-113,
    reference rosenbrock_torch.py:224-248).
  * NealFunnel — ancestral v ~ N(mu_v, sigma_v^2), z_k | v ~ N(mu_z, e^v)
    (the reference's draw_sample raises, funnel_torch.py:89, but the funnel
    is trivially samplable; used here for analysis only).

Usage:
  python scripts/stationary_optimum.py --out data/stationary_optimum.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def funnel_exact_sample(target, key, n):
    """Ancestral exact sampler for NealFunnel (analysis-only; see module
    docstring)."""
    import jax
    import jax.numpy as jnp
    kv, kz = jax.random.split(key)
    v = target.mu_v + jnp.sqrt(target.sigma_v_sq) * jax.random.normal(kv, (n,))
    z = (target.mu_z + jnp.exp(v[:, None] / 2.0)
         * jax.random.normal(kz, (n, target.dim - 1)))
    return jnp.concatenate([v[:, None], z], axis=1)


def stationary_sweep(target, grid, sampler, num_chains, num_iters, burn_in,
                     seed):
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_rwm
    from rwm_pt_tpu.proposals import NormalProposal

    import numpy as np

    key = jax.random.key(seed)
    # dispatch every grid point asynchronously and fetch ONE stacked stats
    # array at the end: per-scalar fetches over the TPU tunnel cost seconds
    # each (CLAUDE.md), which would dominate the sweep
    stats = []
    for i, scale in enumerate(grid):
        k = jax.random.fold_in(key, i)
        x0 = sampler(target, jax.random.fold_in(k, 0xE0), num_chains).T
        prop = NormalProposal.create(target.dim, float(scale) ** 2 / target.dim)
        res = run_rwm(target, prop, k, num_chains=num_chains,
                      num_iterations=num_iters, burn_in=burn_in,
                      init_states=x0)
        stats.append(jnp.stack([jnp.mean(res.acceptance_rate),
                                jnp.std(res.acceptance_rate),
                                jnp.mean(res.esjd), jnp.std(res.esjd)]))
    stats = np.asarray(jnp.stack(stats), np.float64)   # (n_grid, 4)
    rows = []
    rt = num_chains ** 0.5
    for scale, (acc, acc_sd, esjd, esjd_sd) in zip(grid, stats):
        rows.append({"scale": float(scale), "acc": acc, "acc_se": acc_sd / rt,
                     "esjd": esjd, "esjd_se": esjd_sd / rt})
        print(f"  scale={scale:8.4f} acc={acc:.4f} esjd={esjd:.5f} "
              f"(se {esjd_sd / rt:.2e})", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_chains", type=int, default=4096)
    p.add_argument("--num_iters", type=int, default=20000)
    p.add_argument("--burn_in", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--families", type=str, default="er10,er20,er30,nf20")
    p.add_argument("--out", type=str, default="data/stationary_optimum.json")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from rwm_pt_tpu.targets import get_target_distribution

    fams = {
        "er10": ("EvenRosenbrock", 10),
        "er20": ("EvenRosenbrock", 20),
        "er30": ("EvenRosenbrock", 30),
        "nf20": ("NealFunnel", 20),
    }
    # grids come from the committed reference families so the stationary
    # argmax is directly comparable to the matrix rows
    def ref_grid(name, dim):
        import glob
        pats = glob.glob(f"/root/reference/data/{name}_Normal_RWM_GPU_dim{dim}"
                         f"_1000000iters_seed*.json")
        ref = json.load(open(sorted(pats)[0]))
        return ref["scale_param_range"]

    out = {"protocol": {"num_chains": args.num_chains,
                        "num_iters": args.num_iters, "burn_in": args.burn_in,
                        "init": "exact stationary sampler"}}
    for fam in args.families.split(","):
        tname, dim = fams[fam]
        grid = ref_grid(tname, dim)
        target = get_target_distribution(tname, dim, variant="rwm_gpu")
        if tname == "NealFunnel":
            sampler = funnel_exact_sample
        else:
            def sampler(t, k, n):
                return t.direct_sample(k, n)
        print(f"== {tname} d={dim} ({len(grid)} grid points)")
        t0 = time.time()
        rows = stationary_sweep(target, grid, sampler, args.num_chains,
                                args.num_iters, args.burn_in, args.seed)
        esjd = np.array([r["esjd"] for r in rows])
        opt = int(np.argmax(esjd))
        out[fam] = {"target": tname, "dim": dim, "rows": rows,
                    "optimum_scale": rows[opt]["scale"],
                    "optimum_acc": rows[opt]["acc"],
                    "optimum_esjd": rows[opt]["esjd"],
                    "elapsed_s": time.time() - t0}
        print(f"   stationary optimum: scale={rows[opt]['scale']:.4f} "
              f"acc={rows[opt]['acc']:.4f} esjd={rows[opt]['esjd']:.5f}")
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    json.dump(out, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
