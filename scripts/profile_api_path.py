"""Profile the API-path vs kernel-level throughput gap (VERDICT r4 #4).

Round 4 recorded 54M MH steps/s for "RWM 10-d MVN, C=8192 (API path incl.
harness)" vs 893M kernel-level (different shape) and left the factor
unexplained.  This script measures, at the SAME shape:

  1. raw kernel steady state            (run_rwm_pallas, pre-jitted)
  2. API first call                     (MCMCSimulation.generate_samples,
                                         includes trace+compile)
  3. API steady state                   (fresh simulation object per rep —
                                         the user-facing pattern; jit cache
                                         warm)
  4. phase breakdown of one API call    (init_states / kernel / fetch)

The reference surface being matched is
/root/reference/interfaces/simulation_gpu.py:165-212 (timed
generate_samples delegating to the algorithm's optimized loop).

Usage: python scripts/profile_api_path.py [--chains 8192] [--iters 20000]
       [--engine pallas] [--out data/api_path_profile.json]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=8192)
    p.add_argument("--iters", type=int, default=20000)
    p.add_argument("--dim", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--engine", default="pallas")
    p.add_argument("--out", default=os.path.join(REPO, "data",
                                                 "api_path_profile.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.api import MCMCSimulation
    from rwm_pt_tpu.kernels.pallas_rwm import run_rwm_pallas
    from rwm_pt_tpu.targets import MultivariateNormal

    C, iters, dim = args.chains, args.iters, args.dim
    steps = C * iters
    tgt = MultivariateNormal.create(dim)
    var = 2.38 ** 2 / dim
    key = jax.random.key(42)
    out = {"chains": C, "iters": iters, "dim": dim,
           "backend": jax.devices()[0].platform}

    # --- 1. raw kernel
    def kernel(k):
        r = run_rwm_pallas(tgt, k, base_variance=var, num_chains=C,
                           num_iterations=iters, burn_in=1000)
        return float(jnp.sum(r.acceptance_rate))

    t0 = time.time()
    kernel(key)
    out["kernel_first_s"] = time.time() - t0
    best = min(_timed(kernel, jax.random.fold_in(key, i))
               for i in range(args.reps))
    out["kernel_steady_s"] = best
    out["kernel_msteps_s"] = steps / best / 1e6

    # --- 2/3. API path; fresh object per call, like a sweep does
    def make():
        return MCMCSimulation(dim=dim, sigma=var, num_iterations=iters,
                              algorithm="RandomWalkMH_GPU_Optimized",
                              target_dist=tgt, num_chains=C, burn_in=1000,
                              seed=17, engine=args.engine,
                              record_chain=False)

    sim = make()
    t0 = time.time()
    sim.generate_samples(verbose=False)
    out["api_first_s"] = time.time() - t0

    def api_call(_):
        s = make()
        t = time.time()
        s.generate_samples(verbose=False)
        return time.time() - t

    out["api_steady_s"] = min(api_call(i) for i in range(args.reps))
    out["api_msteps_s"] = steps / out["api_steady_s"] / 1e6
    out["api_over_kernel"] = out["api_steady_s"] / out["kernel_steady_s"]

    # --- 4. phase breakdown of one steady API call
    s = make()
    t0 = time.time()
    init = jax.block_until_ready(s._init_states())
    t_init = time.time() - t0
    t0 = time.time()
    s.generate_samples(verbose=False)
    t_run = time.time() - t0
    t0 = time.time()
    _ = s.acceptance_rate()
    _ = s.expected_squared_jump_distance()
    t_metrics = time.time() - t0
    out["phase_init_states_s"] = t_init
    out["phase_generate_s"] = t_run
    out["phase_metrics_fetch_s"] = t_metrics
    del init

    print(json.dumps(out, indent=1))
    json.dump(out, open(args.out, "w"), indent=1)


def _timed(fn, *a):
    t0 = time.time()
    fn(*a)
    return time.time() - t0


if __name__ == "__main__":
    main()
