"""RWM Pallas draw-impl x block-size decision matrix (VERDICT r4 #3).

The PT kernel gained +26% from the ICDF draw, but the RWM kernel's larger
chain blocks spill VMEM under the ICDF's extra temporaries (round-4: 646M @
block 8192 vs Box-Muller 893M).  This measures the full (impl, block) grid
on the headline RWM workload so the kernel can ship a DECISION (auto impl
per block) instead of a knob.

One subprocess per impl (NORMAL_IMPL is read at trace time).

Usage: python scripts/bench_rwm_impl_block.py [--out data/rwm_impl_block.json]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
from rwm_pt_tpu.kernels import pallas_rwm
pallas_rwm.NORMAL_IMPL = {impl!r}
from rwm_pt_tpu.kernels.pallas_rwm import run_rwm_pallas
from rwm_pt_tpu.targets import FullRosenbrock

tgt = FullRosenbrock.create(30)
var = 0.5 ** 2 / 30
C, iters = 65536, 2000
key = jax.random.key(0)
out = []
for blk in {blocks!r}:
    def run(k):
        r = run_rwm_pallas(tgt, k, base_variance=var, num_chains=C,
                           num_iterations=iters, burn_in=0, block=blk)
        return float(jnp.sum(r.state.logp))
    run(key)  # compile
    best = None
    for rep in range(3):
        t0 = time.time()
        run(jax.random.fold_in(key, rep + 1))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out.append({{"impl": {impl!r}, "block": blk,
                "msteps_s": iters * C / best / 1e6, "best_s": best}})
    print(json.dumps(out[-1]), flush=True)
"""


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "data",
                                                 "rwm_impl_block.json"))
    p.add_argument("--impls", default="icdf,bm")
    p.add_argument("--blocks", default="2048,4096,8192")
    args = p.parse_args(argv)
    blocks = [int(b) for b in args.blocks.split(",")]
    rows = []
    for impl in args.impls.split(","):
        code = CHILD.format(repo=REPO, impl=impl, blocks=blocks)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))
                print(rows[-1], flush=True)
        if r.returncode != 0:
            print(f"impl {impl} FAILED:\n{r.stderr[-2000:]}", flush=True)
        print(f"  ({time.time() - t0:.0f}s incl compile)", flush=True)
    json.dump(rows, open(args.out, "w"), indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
