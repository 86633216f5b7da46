"""Statistical parity against the reference's committed sweep data.

The triples below are copied *data points* (scale/variance, acceptance rate,
ESJD) from the reference repo's committed experiment results — the ground
truth its paper plots are built from.  Our estimates use many independent
chains, so their MC error is far below the tolerance; disagreement beyond
tolerance means a semantics bug (wrong β-scaling, accept rule, or ESJD
accounting), not noise.

Full-curve comparisons (all 40 grid points, PT sweeps) live in
``scripts/parity_vs_reference.py``; this test pins a few points so parity is
enforced in CI on the CPU backend.
"""
import jax
import jax.numpy as jnp
import pytest

from rwm_pt_tpu.kernels import run_pt, run_rwm
from rwm_pt_tpu.ladders import construct_iterative_ladder
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import get_target_distribution

# (scale_param, acceptance, esjd) from
# /root/reference/data/Hypercube_RWM_GPU_dim10_100000iters_seed7.json
# (var_value_range schema ALSO stores the scale parameter v; proposal
# variance = v^2/dim, experiment_RWM.py:52)
HYPERCUBE_D10 = [
    (0.206026, 0.76916, 0.031744),
    (0.462308, 0.54915, 0.110146),
    (1.179897, 0.20059, 0.230073),  # the file's recorded optimum
    (2.000000, 0.05594, 0.148633),
]

# (scale_param, acceptance, esjd) from
# /root/reference/data/IIDGamma_Normal_RWM_GPU_dim100_200000iters_seed8.json
# (scale_param_range schema: variance = scale^2/dim, experiment_RWM_GPU.py:218)
IIDGAMMA_D100 = [
    (0.880769, 0.82295, 0.637419),
    (2.622308, 0.51023, 3.482140),
    (8.500000, 0.04948, 3.439702),
]


@pytest.mark.parametrize("scale,ref_acc,ref_esjd", HYPERCUBE_D10)
def test_hypercube_d10_curve_points(key, scale, ref_acc, ref_esjd):
    target = get_target_distribution("Hypercube", 10)
    variance = scale ** 2 / 10
    prop = NormalProposal.create(10, variance)
    res = jax.block_until_ready(
        run_rwm(target, prop, jax.random.fold_in(key, int(variance * 1e4)),
                num_chains=256, num_iterations=4000, burn_in=500))
    acc = float(jnp.mean(res.acceptance_rate))
    esjd = float(jnp.mean(res.esjd))
    # ref single-chain 100k-iter estimates carry ~0.5-1% autocorrelated error;
    # ours ~0.1%.  0.02 absolute acceptance / 5% relative ESJD covers both.
    assert abs(acc - ref_acc) < 0.02, (scale, acc, ref_acc)
    assert abs(esjd - ref_esjd) < 0.05 * max(ref_esjd, 0.05), \
        (scale, esjd, ref_esjd)


# PT pins: (target_swap_rate, achieved_swap_acc, beta_esjd, seed_std) from
# *seed-averaged* reference curves (data/ref_averaged/, built by
# analysis/average_seeds.py from the reference's committed per-seed files):
# MultivariateNormal_PT_GPU_dim10_500000iters x 20 seeds,
# ThreeMixture_PT_GPU_dim30_200000iters x 40 seeds.  The seed_std column is
# the across-seed spread of the reference's own estimates — our tolerance is
# dominated by ladder-construction stochasticity, not by it.
MVN_PT_D10 = [
    (0.178966, 0.280540, 0.012442, 0.0021),
    (0.314138, 0.314518, 0.014283, 0.0023),
    (0.449310, 0.434004, 0.012020, 0.0012),
]
THREEMIX_PT_D30 = [
    (0.246552, 0.224233, 0.005155, 0.0031),
]


def _pt_at_target_rate(key, name, dim, rate, seed):
    """Reference PT workflow: iterative ladder for the target swap rate, then
    PT with sigma^2 = 2.38^2/dim (experiment_pt_GPU.py sweep loop)."""
    # PT_GPU data uses experiment_pt_GPU.py's factory constants (multimodal
    # centers +-15), not the RWM factory's — see targets/registry.py
    target = get_target_distribution(name, dim, variant="pt_gpu")
    ladder = construct_iterative_ladder(
        target, target_swap_acceptance_rate=rate,
        N_samples_swap_est=20000, tolerance=0.005, seed=seed)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    res = jax.block_until_ready(
        run_pt(target, prop, key, jnp.asarray(ladder, jnp.float32),
               num_chains=128, num_iterations=6000, burn_in=500,
               swap_every=20))
    return (float(jnp.mean(res.swap_acceptance_rate)),
            float(jnp.mean(res.pt_esjd)))


@pytest.mark.parametrize("rate,ref_acc,ref_esjd,seed_std", MVN_PT_D10)
def test_mvn_pt_d10_curve_points(key, rate, ref_acc, ref_esjd, seed_std):
    acc, esjd = _pt_at_target_rate(key, "MultivariateNormal", 10, rate,
                                   seed=int(rate * 1e4))
    # our CI ladder (N=2e4, tol=5e-3) places rungs within ~0.01 of the target
    # rate; the reference's production ladder (N=1e6, tol=1e-4) is tighter,
    # and its seed spread is ~0.002 — 0.04 absolute covers both plus our
    # 300-sweep MC error.  beta-ESJD depends on the realized rung spacing, so
    # it gets a looser relative band.
    assert abs(acc - ref_acc) < 0.04, (rate, acc, ref_acc)
    assert abs(esjd - ref_esjd) < 0.20 * ref_esjd, (rate, esjd, ref_esjd)


@pytest.mark.parametrize("rate,ref_acc,ref_esjd,seed_std", THREEMIX_PT_D30)
def test_threemix_pt_d30_curve_point(key, rate, ref_acc, ref_esjd, seed_std):
    acc, esjd = _pt_at_target_rate(key, "ThreeMixture", 30, rate,
                                   seed=int(rate * 1e4))
    assert abs(acc - ref_acc) < 0.04, (rate, acc, ref_acc)
    assert abs(esjd - ref_esjd) < 0.25 * ref_esjd, (rate, esjd, ref_esjd)


@pytest.mark.parametrize("scale,ref_acc,ref_esjd", IIDGAMMA_D100[:2])
def test_iidgamma_d100_curve_points(key, scale, ref_acc, ref_esjd):
    target = get_target_distribution("IIDGamma", 100)
    prop = NormalProposal.create(100, scale ** 2 / 100)
    res = jax.block_until_ready(
        run_rwm(target, prop, jax.random.fold_in(key, int(scale * 1e3)),
                num_chains=128, num_iterations=4000, burn_in=500))
    acc = float(jnp.mean(res.acceptance_rate))
    esjd = float(jnp.mean(res.esjd))
    assert abs(acc - ref_acc) < 0.025, (scale, acc, ref_acc)
    assert abs(esjd - ref_esjd) < 0.08 * ref_esjd, (scale, esjd, ref_esjd)
