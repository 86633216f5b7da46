"""Priority ladder-cache builder: the 6 remaining MultivariateNormal d30
production points (the one un-root-caused parity family, round-3 verdict
item 1) before anything else.  Same cache keys as build_ladder_cache.py."""
import glob, json, os, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO); sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import parity_vs_reference as pvr

CACHE = os.path.join(REPO, "data", "ladder_cache")
FAM = "MultivariateNormal_PT_GPU_dim30_500000iters"
PTS = [3, 2, 8, 6, 7, 9]   # impact order (worst z first)
PROD = dict(n_samples=1000000, tolerance=0.0001, max_pn_steps=1000,
            fail_tol_factor=1.0)

k, n = map(int, (sys.argv[1] if len(sys.argv) > 1 else "0/1").split("/"))
avg = glob.glob(os.path.join(REPO, "data", "ref_averaged",
                             FAM + "_seeds*.json"))[0]
ref = json.load(open(avg))
grid = ref["swap_acceptance_rates_range"][::3]
for j, i in enumerate(PTS):
    if j % n != k:
        continue
    key = pvr.ladder_cache_key(ref, grid[i], seed=i, **PROD)
    if os.path.exists(os.path.join(CACHE, key + ".json")):
        print(f"pt{i} CACHED", flush=True); continue
    t0 = time.time()
    lad = pvr.cached_ladder(CACHE, ref, grid[i], seed=i, **PROD)
    print(f"pt{i} rate={grid[i]:.4f} T={len(lad)} ({time.time()-t0:.0f}s)",
          flush=True)
