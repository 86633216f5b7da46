"""Minimal walkthrough demo.

Equivalent of /root/reference/experiment.py:14-43 and example_pt_gpu.py: one
RWM run and one PT run on small targets with printed diagnostics and plots.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="rwm_pt_tpu demo")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--num_iters", type=int, default=20000)
    args = parser.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ..api import MCMCSimulation

    print("=== Scenario 1: RWM on a 2-d Gaussian ===")
    sim = MCMCSimulation(dim=2, sigma=2.38 ** 2 / 2,
                         num_iterations=args.num_iters, algorithm="RWM",
                         target_dist="MultivariateNormal", seed=0,
                         burn_in=1000, num_chains=8)
    sim.generate_samples()
    print(f"acceptance rate: {sim.acceptance_rate():.3f}")
    print(f"ESJD:            {sim.expected_squared_jump_distance():.4f}")
    sim.traceplot()
    sim.samples_histogram()

    print("\n=== Scenario 2: PT-RWM on a 2-d trimodal mixture ===")
    sim2 = MCMCSimulation(dim=2, sigma=2.38 ** 2 / 2,
                          num_iterations=args.num_iters, algorithm="PT",
                          target_dist="ThreeMixture", seed=0, burn_in=1000,
                          num_chains=8, swap_every=10, geom_temp_spacing=True)
    sim2.generate_samples()
    print(f"beta ladder:        {[round(b, 4) for b in sim2.beta_ladder]}")
    print(f"swap acceptance:    {sim2.swap_acceptance_rate():.3f}")
    print(f"beta-space PT ESJD: {sim2.pt_expected_squared_jump_distance():.5f}")
    print(f"cold-chain ESJD:    {sim2.expected_squared_jump_distance():.4f}")

    print("\n=== Scenario 3: PT with an iterative 0.234-tuned ladder ===")
    sim3 = MCMCSimulation(dim=5, sigma=2.38 ** 2 / 5,
                          num_iterations=args.num_iters, algorithm="PT",
                          target_dist="MultivariateNormal", seed=0,
                          burn_in=1000, num_chains=8, swap_every=10,
                          iterative_temp_spacing=True,
                          swap_acceptance_rate=0.234,
                          N_samples_swap_est=5000, iterative_tolerance=0.01)
    sim3.generate_samples()
    print(f"beta ladder:     {[round(b, 4) for b in sim3.beta_ladder]}")
    print(f"swap acceptance: {sim3.swap_acceptance_rate():.3f} (target 0.234)")


if __name__ == "__main__":
    main()
