"""Production-precision ladders for the rate-0.01 grid points (footnote (p)
mechanism): the strict-tolerance build at this unreachable target rate
stops in the sparse/degenerate regime, which the matrix then excludes as a
construction artifact — replacing the std build's dense-ladder inflated
value.  Priority order: worst-z rows first."""
import glob, json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import parity_vs_reference as pvr

CACHE = os.path.join(REPO, "data", "ladder_cache")
FAMS = [
    "RoughCarpet_PT_GPU_dim30_500000iters",       # z=315 at pt0
    "ThreeMixture_PT_GPU_dim20_500000iters",
    "ThreeMixture_PT_GPU_dim10_500000iters",
    "MultivariateNormal_PT_GPU_dim20_500000iters",
    "MultivariateNormal_PT_GPU_dim10_200000iters",
    "RoughCarpet_PT_GPU_dim10_500000iters",
]
PROD = dict(n_samples=1000000, tolerance=0.0001, max_pn_steps=1000,
            fail_tol_factor=1.0)

k, n = map(int, (sys.argv[1] if len(sys.argv) > 1 else "0/1").split("/"))
for j, fam in enumerate(FAMS):
    if j % n != k:
        continue
    avg = glob.glob(os.path.join(REPO, "data", "ref_averaged",
                                 fam + "_seeds*.json"))[0]
    ref = json.load(open(avg))
    rate = ref["swap_acceptance_rates_range"][::3][0]
    key = pvr.ladder_cache_key(ref, rate, seed=0, **PROD)
    if os.path.exists(os.path.join(CACHE, key + ".json")):
        print(f"{fam} pt0 CACHED", flush=True); continue
    t0 = time.time()
    lad = pvr.cached_ladder(CACHE, ref, rate, seed=0, **PROD)
    print(f"{fam} pt0 rate={rate} T={len(lad)} ({time.time()-t0:.0f}s)",
          flush=True)
