"""Throughput scaling study: MH steps/s vs dimension and chain count.

Produces the measured scaling table in docs/PERFORMANCE.md. Run on the TPU
(no flags) or CPU (--cpu). Each cell is best-of-2 steady-state after compile.

  python scripts/scaling_study.py [--pallas|--scan] [--pt]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(run, key):
    import jax

    from rwm_pt_tpu.utils import force
    force(run(key))                # compile + warm
    best = float("inf")
    for i in (1, 2):
        t0 = time.time()
        force(run(jax.random.fold_in(key, i)))
        best = min(best, time.time() - t0)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--scan", action="store_true",
                   help="measure the lax.scan engine instead of Pallas")
    p.add_argument("--pt", action="store_true", help="PT instead of RWM")
    p.add_argument("--iters", type=int, default=1000)
    p.add_argument("--dims", type=str, default="2,10,30,100")
    p.add_argument("--chains", type=str, default="4096,65536,262144")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import FullRosenbrock

    T = 10
    rows = []
    for dim in map(int, args.dims.split(",")):
        target = FullRosenbrock.create(dim)
        var = 0.5 ** 2 / dim
        betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
        prop = NormalProposal.create(dim, var)
        for C in map(int, args.chains.split(",")):
            key = jax.random.key(dim * 1000 + C % 997)
            if args.pt:
                steps = args.iters * C * T
                if args.scan:
                    from rwm_pt_tpu.kernels import run_pt

                    def run(k):
                        return run_pt(target, prop, k, betas, num_chains=C,
                                      num_iterations=args.iters, burn_in=0,
                                      swap_every=100)
                else:
                    from rwm_pt_tpu.kernels import run_pt_pallas

                    def run(k):
                        return run_pt_pallas(target, k, betas,
                                             base_variance=var, num_chains=C,
                                             num_iterations=args.iters,
                                             burn_in=0, swap_every=100)
            else:
                steps = args.iters * C
                if args.scan:
                    from rwm_pt_tpu.kernels import run_rwm

                    def run(k):
                        return run_rwm(target, prop, k, num_chains=C,
                                       num_iterations=args.iters, burn_in=0)
                else:
                    from rwm_pt_tpu.kernels import run_rwm_pallas

                    def run(k):
                        return run_rwm_pallas(target, k, base_variance=var,
                                              num_chains=C,
                                              num_iterations=args.iters,
                                              burn_in=0)
            dt = measure(run, key)
            rate = steps / dt
            rows.append({"dim": dim, "chains": C, "steps_per_sec": rate,
                         "seconds": dt})
            print(f"dim={dim:4d} C={C:7d}: {rate / 1e6:8.0f}M MH steps/s "
                  f"({dt:.3f}s)", flush=True)

    engine = "scan" if args.scan else "pallas"
    algo = "pt" if args.pt else "rwm"
    out = f"data/scaling_{algo}_{engine}_{jax.default_backend()}.json"
    os.makedirs("data", exist_ok=True)
    json.dump({"engine": engine, "algorithm": algo,
               "backend": jax.default_backend(), "iters": args.iters,
               "rows": rows}, open(out, "w"), indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
