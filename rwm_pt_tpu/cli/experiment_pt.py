"""PT swap-acceptance-rate sweep.

TPU-native re-implementation of ``run_study`` in
/root/reference/experiment_pt_GPU.py:165-495: sweep ``num_configs`` target
swap-acceptance rates (reference: 30) over ``linspace(0.01, swap_accept_max)``,
build an iterative temperature ladder per rate, run PT with
``sigma = 2.38^2/dim`` (:213-214), record actual swap acceptance and beta-space
ESJD, and write the reference JSON schema (:262-275).
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from ..utils.dtypes import default_float
from .common import (add_run_args, add_target_args, configure_backend,
                     resolve_actual_dim, save_json, target_kwargs_from_args)


def run_study(dim, target_name="ThreeMixture", num_iters=200000,
              swap_accept_max=0.5, seed=42, burn_in=1000,
              N_samples_swap_est=50000, iterative_tolerance=0.0005,
              iterative_max_pn_steps=500, iterative_fail_tol_factor=1.5,
              num_chains=64, num_configs=30,
              swap_every=100, geom_ladder=False, output_dir="data",
              images_dir="images", make_plots=True, use_mesh=False,
              rng_impl="threefry2x32", **kwargs):
    import jax
    import jax.numpy as jnp

    from ..kernels import run_pt
    from ..ladders import (construct_geometric_ladder,
                           construct_iterative_ladder)
    from ..proposals import NormalProposal
    from ..targets import get_target_distribution

    print("=" * 60)
    print(f"Target: {target_name}, Dimension: {dim}, Samples: {num_iters}, "
          f"Burn-in: {burn_in}, Seed: {seed}, Chains: {num_chains}")
    print("=" * 60)

    # the PT sweep data in the reference comes from experiment_pt_GPU.py's
    # factory (multimodal centers +-15) — see targets/registry.py docstring
    kwargs.setdefault("variant", "pt_gpu")
    target = get_target_distribution(target_name, dim, **kwargs)
    actual_dim = target.dim
    swap_rates_range = np.linspace(0.01, swap_accept_max, num_configs)
    # standard PT scaling sigma = 2.38^2/dim (reference :213-214)
    proposal_variance = (2.38 ** 2) / actual_dim
    prop = NormalProposal.create(actual_dim, proposal_variance)
    key = jax.random.key(seed, impl=rng_impl)

    acceptance_rates, esjds, times, ladder_sizes = [], [], [], []
    total_start = time.time()
    for i, target_rate in enumerate(swap_rates_range):
        t0 = time.time()
        if geom_ladder:
            ladder = construct_geometric_ladder()
        else:
            ladder = construct_iterative_ladder(
                target,
                target_swap_acceptance_rate=float(target_rate),
                N_samples_swap_est=N_samples_swap_est,
                tolerance=iterative_tolerance,
                max_pn_adjustment_steps=iterative_max_pn_steps,
                convergence_failure_tolerance_factor=iterative_fail_tol_factor,
                seed=seed + i)
        init = None
        if use_mesh:
            from ..parallel import make_mesh, shard_init_states
            mesh = make_mesh()
            x0 = target.init_sample(jax.random.fold_in(key, 0xC0),
                                    num_chains).T
            x0 = jnp.broadcast_to(x0[:, None, :],
                                  (actual_dim, len(ladder), num_chains))
            init = shard_init_states(x0.astype(default_float()), mesh, pt=True)
        res = run_pt(target, prop, jax.random.fold_in(key, i),
                     jnp.asarray(ladder, default_float()),
                     num_chains=num_chains, num_iterations=num_iters,
                     burn_in=burn_in, swap_every=swap_every, init_states=init)
        res = jax.block_until_ready(res)
        dt = time.time() - t0
        times.append(dt)
        ladder_sizes.append(len(ladder))
        acceptance_rates.append(float(jnp.mean(res.swap_acceptance_rate)))
        esjds.append(float(jnp.mean(res.pt_esjd)))
        rate = num_iters * num_chains * len(ladder) / dt
        print(f"  [{i + 1}/{num_configs}] constr_rate={target_rate:.4f} "
              f"T={len(ladder)} actual={acceptance_rates[-1]:.3f} "
              f"beta-esjd={esjds[-1]:.6f} ({rate:,.0f} MH steps/s)")

    total_time = time.time() - total_start
    max_idx = int(np.argmax(esjds))
    data = {
        "target_distribution": target_name,
        "dimension": actual_dim,
        "num_iterations": num_iters,
        "seed": seed,
        "total_time": total_time,
        "max_esjd": esjds[max_idx],
        "max_actual_acceptance_rate": acceptance_rates[max_idx],
        "max_constr_acceptance_rate": float(swap_rates_range[max_idx]),
        "expected_squared_jump_distances": esjds,
        "acceptance_rates": acceptance_rates,
        "swap_acceptance_rates_range": swap_rates_range.tolist(),
        "times": times,
        "num_chains": num_chains,
        "ladder_sizes": ladder_sizes,
        "backend": jax.default_backend(),
    }
    print("\nFinal Results:")
    print(f"   Total time: {total_time:.1f} seconds")
    print(f"   Maximum ESJD: {data['max_esjd']:.6f}")
    print(f"   (Actual) swap acceptance rate at max ESJD: "
          f"{data['max_actual_acceptance_rate']:.3f}")
    print(f"   (Construction) swap acceptance rate at max ESJD: "
          f"{data['max_constr_acceptance_rate']:.3f}")

    filename = (f"{output_dir}/{target_name}_PT_TPU_dim{actual_dim}_"
                f"{num_iters}iters_seed{seed}.json")
    save_json(data, filename)

    if make_plots:
        import os

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        os.makedirs(images_dir, exist_ok=True)
        plt.plot(acceptance_rates, esjds, marker="x")
        plt.axvline(x=0.234, color="red", linestyle=":", label="a = 0.234")
        plt.xlabel("swap acceptance rate")
        plt.ylabel("beta-space ESJD")
        plt.title(f"PT ESJD vs swap acceptance ({target_name}, "
                  f"dim={actual_dim})")
        plt.legend()
        out = (f"{images_dir}/pt_esjd_{target_name}_PT_TPU_dim{actual_dim}_"
               f"{num_iters}iters_seed{seed}.png")
        plt.savefig(out, dpi=150, bbox_inches="tight")
        plt.close()
        print(f"   Plot saved as '{out}'")
    return data


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-accelerated Parallel Tempering simulations")
    add_target_args(parser)
    add_run_args(parser, default_iters=200000)
    parser.add_argument("--swap_accept_max", type=float, default=0.5)
    parser.add_argument("--num_configs", type=int, default=30,
                        help="Number of swap-rate sweep points (reference: 30)")
    parser.add_argument("--swap_every", type=int, default=100)
    parser.add_argument("--geom_ladder", action="store_true",
                        help="Use the geometric ladder instead of iterative "
                             "construction")
    # high-precision iterative-ladder knobs (experiment_pt_GPU.py:522-526)
    parser.add_argument("--N_samples_swap_est", type=int, default=50000)
    parser.add_argument("--iterative_tolerance", type=float, default=0.0005)
    parser.add_argument("--iterative_max_pn_steps", type=int, default=500)
    parser.add_argument("--iterative_fail_tol_factor", type=float, default=1.5)
    # sweep runs never resume mid-point, so threefry's bitwise-resume
    # stream-separation contract buys nothing here; rbg is measurably faster
    # on TPU (+59%% scan PT) with identical statistics (parity spot-check:
    # data/parity_r4/rbg_spotcheck.json).  API/checkpointed runs keep the
    # threefry default (api/simulation.py rng_impl).
    parser.set_defaults(rng="rbg")
    args = parser.parse_args(argv)
    configure_backend(args)

    dim = resolve_actual_dim(args)
    # x64 itself is applied globally by configure_backend (--x64)
    run_study(dim, args.target, args.num_iters, args.swap_accept_max,
              args.seed, args.burn_in, args.N_samples_swap_est,
              args.iterative_tolerance, args.iterative_max_pn_steps,
              args.iterative_fail_tol_factor,
              num_chains=args.num_chains, num_configs=args.num_configs,
              swap_every=args.swap_every, geom_ladder=args.geom_ladder,
              output_dir=args.output_dir, images_dir=args.images_dir,
              use_mesh=args.use_mesh, rng_impl=args.rng,
              **target_kwargs_from_args(args))
    print("Finished running TPU-accelerated parallel tempering experiment.")


if __name__ == "__main__":
    main()
