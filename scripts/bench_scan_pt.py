"""Scan-engine PT throughput diagnostics (VERDICT r2 #3).

Measures the headline scan PT config (30-d FullRosenbrock, T=10, C=65536)
across: unroll factor, rng impl, swap cadence (isolates the per-step
``lax.cond`` swap branch cost), and swap sweep order.

Usage: python scripts/bench_scan_pt.py [--chains 65536] [--iters 500]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains", type=int, default=65536)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--dim", type=int, default=30)
    p.add_argument("--temps", type=int, default=10)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_pt, run_rwm
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import FullRosenbrock
    from rwm_pt_tpu.utils import force

    dim, T, C, iters = args.dim, args.temps, args.chains, args.iters
    target = FullRosenbrock.create(dim)
    prop = NormalProposal.create(dim, 0.5 ** 2 / dim)
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)

    def bench(label, fn, rng="threefry2x32"):
        force(fn(jax.random.key(0, impl=rng)))        # compile + warm
        best = float("inf")
        for r in range(args.reps):
            t0 = time.time()
            force(fn(jax.random.key(r + 1, impl=rng)))
            best = min(best, time.time() - t0)
        rate = iters * T * C / best
        print(f"{label:48s} {rate/1e6:8.0f}M MH steps/s  ({best:.3f}s)",
              flush=True)
        return rate

    results = {}
    for rng in ("threefry2x32", "rbg"):
        for unroll in (1, 2, 4, 8):
            def fn(k, unroll=unroll):
                return run_pt(target, prop, k, betas, num_chains=C,
                              num_iterations=iters, burn_in=0,
                              swap_every=100, unroll=unroll)
            results[f"{rng}/unroll{unroll}"] = bench(
                f"pt {rng} unroll={unroll}", fn, rng)

    # isolate the swap branch: never swap vs swap every step
    for se, label in ((1 << 30, "never-swap"), (1, "swap-every-step")):
        def fn(k, se=se):
            return run_pt(target, prop, k, betas, num_chains=C,
                          num_iterations=iters, burn_in=0, swap_every=se,
                          unroll=2)
        results[label] = bench(f"pt threefry unroll=2 {label}", fn)

    # sequential sweep cost at the reference cadence
    def fn_seq(k):
        return run_pt(target, prop, k, betas, num_chains=C,
                      num_iterations=iters, burn_in=0, swap_every=100,
                      unroll=2, swap_sweep="sequential")
    results["sequential-sweep"] = bench("pt sequential sweep", fn_seq)

    # RWM baseline at matched element count (C*T chains)
    def fn_rwm(k):
        return run_rwm(target, prop, k, num_chains=C * T,
                       num_iterations=iters, burn_in=0, unroll=4)
    force(fn_rwm(jax.random.key(0)))
    t0 = time.time(); force(fn_rwm(jax.random.key(1)))
    rwm_rate = iters * C * T / (time.time() - t0)
    print(f"{'rwm baseline (C*T chains)':48s} {rwm_rate/1e6:8.0f}M MH steps/s")
    results["rwm-baseline"] = rwm_rate

    if args.out:
        json.dump(results, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
