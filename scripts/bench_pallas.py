import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from rwm_pt_tpu.kernels.pallas_rwm import run_rwm_pallas
from rwm_pt_tpu.kernels import run_rwm
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import MultivariateNormal, FullRosenbrock
key = jax.random.key(0)

for tgt, var in [(MultivariateNormal.create(10), 2.38**2/10),
                 (FullRosenbrock.create(30), 0.5**2/30)]:
    res = run_rwm_pallas(tgt, key, base_variance=var, num_chains=4096,
                         num_iterations=2000, burn_in=200, block=512)
    a1, e1 = float(res.acceptance_rate.mean()), float(res.esjd.mean())
    ref = run_rwm(tgt, NormalProposal.create(tgt.dim, var), key,
                  num_chains=4096, num_iterations=2000, burn_in=200)
    a2, e2 = float(ref.acceptance_rate.mean()), float(ref.esjd.mean())
    print(f"{tgt.get_name()}: pallas acc {a1:.3f} esjd {e1:.4f} | scan acc {a2:.3f} esjd {e2:.4f}", flush=True)

tgt = FullRosenbrock.create(30); var = 0.5**2/30
iters = 2000
for C, blk in [(65536, 8192), (131072, 8192), (262144, 8192)]:
    def pall(k):
        r = run_rwm_pallas(tgt, k, base_variance=var, num_chains=C, num_iterations=iters, burn_in=0, block=blk)
        return float(jnp.sum(r.state.logp))
    pall(key); t0=time.time(); pall(jax.random.fold_in(key,1)); dtp=time.time()-t0
    print(f"pallas C={C} blk={blk}: {iters*C/dtp/1e6:.0f}M steps/s ({dtp:.2f}s)", flush=True)
for C in (65536, 262144):
    prop = NormalProposal.create(30, var)
    def scan(k):
        r = run_rwm(tgt, prop, k, num_chains=C, num_iterations=iters, burn_in=0, unroll=4)
        return float(jnp.sum(r.state.logp))
    scan(key); t0=time.time(); scan(jax.random.fold_in(key,1)); dts=time.time()-t0
    print(f"scan   C={C}: {iters*C/dts/1e6:.0f}M steps/s ({dts:.2f}s)", flush=True)
