"""Temperature-sharded hybrid PT (Pallas segments + ppermute swaps) —
statistical parity and the 1-chip no-comm-limit throughput (VERDICT r4 #6).

On the 1-chip dev environment the mesh is ('temps', 1): that measures the
hybrid's segmentation overhead (kernel relaunch + state relayout every
``swap_every`` steps) against the monolithic whole-run Pallas kernel and
the scan engine — i.e. the no-communication limit of the temps-sharded
path.  Cross-device swap correctness is covered bitwise on the virtual CPU
mesh (tests/test_sharding.py::TestTempShardedHybrid).

Usage: python scripts/bench_pt_tempsharded.py [--iters 2000] [--chains 65536]
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
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--chains", type=int, default=65536)
    p.add_argument("--burn_in", type=int, default=200)
    p.add_argument("--out", default=os.path.join(REPO, "data",
                                                 "pt_tempsharded_bench.json"))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from rwm_pt_tpu.kernels import run_pt
    from rwm_pt_tpu.kernels.pallas_pt import run_pt_pallas
    from rwm_pt_tpu.kernels.pallas_sharded import run_pt_pallas_tempsharded
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import FullRosenbrock

    tgt = FullRosenbrock.create(30)
    var = 0.5 ** 2 / 30
    T = 10
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    key = jax.random.key(0)
    C, iters, burn = args.chains, args.iters, args.burn_in
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("temps",))
    steps = (burn + iters) * C * T

    rows = []

    def measure(name, fn):
        fn(key)                           # compile
        best, stats = None, None
        for rep in range(3):
            t0 = time.time()
            r = fn(jax.random.fold_in(key, rep + 1))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            stats = (float(jnp.mean(r.swap_acceptance_rate)),
                     float(jnp.mean(r.pt_esjd)),
                     float(jnp.mean(r.cold_esjd)))
        rows.append({"engine": name, "msteps_s": steps / best / 1e6,
                     "best_s": best, "swap_acc": stats[0],
                     "beta_esjd": stats[1], "cold_esjd": stats[2]})
        print(rows[-1], flush=True)

    measure("tempsharded(1)", lambda k: jax.block_until_ready(
        run_pt_pallas_tempsharded(tgt, k, betas, mesh, base_variance=var,
                                  num_chains=C, num_iterations=iters,
                                  burn_in=burn, swap_every=100)))
    measure("pallas", lambda k: jax.block_until_ready(
        run_pt_pallas(tgt, k, betas, base_variance=var, num_chains=C,
                      num_iterations=iters, burn_in=burn, swap_every=100)))
    prop = NormalProposal.create(30, var)
    measure("scan", lambda k: jax.block_until_ready(
        run_pt(tgt, prop, k, betas, num_chains=C, num_iterations=iters,
               burn_in=burn, swap_every=100)))

    json.dump(rows, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
