import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from rwm_pt_tpu.kernels import run_pt
from rwm_pt_tpu.kernels.pallas_pt import run_pt_pallas
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import FullRosenbrock, MultivariateNormal

key = jax.random.key(0)
T = 10

for tgt, var in [(MultivariateNormal.create(10), 2.38 ** 2 / 10),
                 (FullRosenbrock.create(30), 0.5 ** 2 / 30)]:
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    res = run_pt_pallas(tgt, key, betas, base_variance=var, num_chains=2048,
                        num_iterations=2000, burn_in=200, swap_every=10)
    ref = run_pt(tgt, NormalProposal.create(tgt.dim, var), key, betas,
                 num_chains=2048, num_iterations=2000, burn_in=200,
                 swap_every=10)
    print(f"{tgt.get_name()}:")
    print(f"  pallas: mh_acc {float(res.acceptance_rate[0].mean()):.3f} "
          f"swap {float(res.swap_acceptance_rate.mean()):.3f} "
          f"beta-esjd {float(res.pt_esjd.mean()):.5f} "
          f"cold-esjd {float(res.cold_esjd.mean()):.4f}")
    print(f"  scan:   mh_acc {float(ref.acceptance_rate[0].mean()):.3f} "
          f"swap {float(ref.swap_acceptance_rate.mean()):.3f} "
          f"beta-esjd {float(ref.pt_esjd.mean()):.5f} "
          f"cold-esjd {float(ref.cold_esjd.mean()):.4f}", flush=True)

tgt = FullRosenbrock.create(30)
var = 0.5 ** 2 / 30
betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
prop = NormalProposal.create(30, var)
iters = 2000
for C in (16384, 32768, 65536):
    def pall(k):
        r = run_pt_pallas(tgt, k, betas, base_variance=var, num_chains=C,
                          num_iterations=iters, burn_in=0, swap_every=100)
        return float(jnp.sum(r.state.logp))
    pall(key)
    t0 = time.time(); pall(jax.random.fold_in(key, 1)); dtp = time.time() - t0
    def scan(k):
        r = run_pt(tgt, prop, k, betas, num_chains=C, num_iterations=iters,
                   burn_in=0, swap_every=100)
        return float(jnp.sum(r.state.logp))
    scan(key)
    t0 = time.time(); scan(jax.random.fold_in(key, 1)); dts = time.time() - t0
    print(f"C={C}: pallas {iters*T*C/dtp/1e6:.0f}M MH steps/s ({dtp:.2f}s) | "
          f"scan {iters*T*C/dts/1e6:.0f}M ({dts:.2f}s)", flush=True)
