"""PT Pallas block-size sweep on the headline workload (companion to
scripts/bench_rwm_impl_block.py — the round-5 RWM sweep found small blocks
beat the VMEM-cap-sized ones by 40%+, so the PT kernel's default deserves
the same measurement).

Usage: python scripts/bench_pt_block.py [--blocks 256,512,1024,2048]
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
    p.add_argument("--blocks", default="256,512,1024,2048")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--chains", type=int, default=65536)
    p.add_argument("--out", default=os.path.join(REPO, "data",
                                                 "pt_block_bench.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels.pallas_pt import run_pt_pallas
    from rwm_pt_tpu.targets import FullRosenbrock

    tgt = FullRosenbrock.create(30)
    var = 0.5 ** 2 / 30
    T = 10
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    key = jax.random.key(0)
    C, iters = args.chains, args.iters
    rows = []
    for blk in [int(b) for b in args.blocks.split(",")]:
        def run(k):
            r = run_pt_pallas(tgt, k, betas, base_variance=var,
                              num_chains=C, num_iterations=iters,
                              burn_in=0, swap_every=100, block=blk)
            return float(jnp.sum(r.swap_acceptance_rate))
        try:
            run(key)
        except Exception as e:
            print(f"block {blk}: FAILED {type(e).__name__}", flush=True)
            continue
        best = None
        for rep in range(3):
            t0 = time.time()
            run(jax.random.fold_in(key, rep + 1))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append({"block": blk, "msteps_s": iters * C * T / best / 1e6,
                     "best_s": best})
        print(rows[-1], flush=True)
    json.dump(rows, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
