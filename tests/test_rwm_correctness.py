"""RWM statistical correctness tests.

Mirrors the reference suite (/root/reference/tests/test_rwm_correctness.py):
Gaussian moment recovery (:73-91), lag-1 autocorrelation band (:94-112),
sequential state threading (:114-154), accept/select kernel unit check
(:294-320), burn-in/sample accounting (:667-758), and a multi-distribution
compatibility sweep (:760-862).  Tolerances follow the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.kernels import run_rwm, rwm_init, rwm_step
from rwm_pt_tpu.proposals import NormalProposal, create_proposal_distribution
from rwm_pt_tpu.targets import MultivariateNormal, get_target_distribution


def test_gaussian_moments_2d(key):
    """2-D standard Gaussian: ||mean|| < 0.2, ||std - 1|| < 0.3
    (reference :73-91) — here pooled over many chains."""
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 2.38 ** 2 / 2)
    res = run_rwm(tgt, prop, key, num_chains=64, num_iterations=5000,
                  burn_in=500, record_every=1, record_chains=64)
    chain = np.asarray(res.chain)[500:]        # (n, d, C)
    samples = chain.transpose(0, 2, 1).reshape(-1, 2)
    assert np.linalg.norm(samples.mean(0)) < 0.2
    assert np.linalg.norm(samples.std(0) - 1.0) < 0.3


def test_acceptance_rate_in_sane_band(key):
    """Acceptance with the 2.38^2/d proposal on a Gaussian sits in a sane
    band (reference GPU-vs-CPU agreement test, :22-70)."""
    dim = 10
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    res = run_rwm(tgt, prop, key, num_chains=512, num_iterations=2000,
                  burn_in=200)
    acc = float(res.acceptance_rate.mean())
    assert 0.1 < acc < 0.5
    # chains agree with each other (same law): tight cross-chain spread
    assert float(res.acceptance_rate.std()) < 0.05


def test_lag1_autocorrelation(key):
    """Lag-1 autocorrelation of a healthy RWM chain in (0.05, 0.95)
    (reference :94-112)."""
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 2.38 ** 2 / 2)
    res = run_rwm(tgt, prop, key, num_chains=4, num_iterations=5000,
                  burn_in=500, record_every=1, record_chains=1)
    x = np.asarray(res.chain)[500:, 0, 0]
    ac = np.corrcoef(x[:-1], x[1:])[0, 1]
    assert 0.05 < ac < 0.95


def test_sequential_dependence(key):
    """States thread sequentially: consecutive recorded states either equal
    (reject) or differ (accept) — no skipped updates (reference :114-154)."""
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 0.5)
    res = run_rwm(tgt, prop, key, num_chains=1, num_iterations=300,
                  burn_in=0, record_every=1, record_chains=1)
    chain = np.asarray(res.chain)[:, :, 0]
    diffs = np.linalg.norm(np.diff(chain, axis=0), axis=1)
    n_moves = int((diffs > 1e-12).sum())
    # acceptance counted from accumulator must equal observed moves; the
    # recorded trace starts after step 1, so the very first accept is not
    # visible as a recorded jump (off-by-one tolerance).
    assert abs(n_moves - int(res.state.accept_count[0])) <= 1


def test_accept_kernel_unit(key):
    """Unit check of the fused accept/select rule, the analogue of the
    reference's ultra_fused_mcmc_step_basic test (:294-320)."""
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 1.0)
    st = rwm_init(tgt, key, 4)
    # force log-ratio > 0 by moving chains away from the mode: proposals
    # toward the mode always accept.  Instead verify bookkeeping consistency
    # over a single step.
    st2 = rwm_step(st, key, tgt, prop, jnp.float32(1.0), 0)
    assert st2.step == 1
    moved = jnp.any(st2.x != st.x, axis=0)
    np.testing.assert_array_equal(np.asarray(st2.accept_count > 0),
                                  np.asarray(moved))
    # log-density cache consistency (rwm.py:41-66 caching)
    np.testing.assert_allclose(np.asarray(st2.logp),
                               np.asarray(tgt.log_density_td(st2.x)),
                               rtol=1e-5)


def test_burn_in_accounting(key):
    """Chain length and metric normalization match the reference convention:
    metrics over exactly num_iterations post-burn-in steps
    (reference :667-758)."""
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 1.0)
    n, b = 500, 100
    res = run_rwm(tgt, prop, key, num_chains=2, num_iterations=n, burn_in=b,
                  record_every=1, record_chains=1)
    assert res.chain.shape[0] == n + b          # records after every step
    assert int(res.state.step) == n + b
    # acceptance counts bounded by n (not n + b)
    assert int(res.state.accept_count.max()) <= n
    # esjd equals recorded-chain ESJD over the post-burn-in steps: recorded
    # entry i is the state after step i+1, so the jumps of steps b+1..b+n are
    # the diffs of full[b-1:] (exactly n of them) — the same slice convention
    # as the reference's chain[burn_in:] (rwm_gpu_optimized.py:513-534).
    full = np.asarray(res.chain)[:, :, 0]
    jumps_acc = (np.diff(full[b - 1:] if b else full, axis=0) ** 2).sum(-1)
    assert jumps_acc.shape[0] == n
    np.testing.assert_allclose(float(res.esjd[0]), jumps_acc.mean(), rtol=1e-4)


def test_zero_burn_in(key):
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 1.0)
    res = run_rwm(tgt, prop, key, num_chains=2, num_iterations=200, burn_in=0)
    assert int(res.state.step) == 200


@pytest.mark.parametrize("name", ["MultivariateNormal", "RoughCarpet",
                                  "ThreeMixture", "Hypercube", "IIDGamma",
                                  "IIDBeta", "NealFunnel", "FullRosenbrock",
                                  "SuperFunnel"])
def test_distribution_compatibility_sweep(name, key):
    """Every registered target runs under the fused kernel and yields finite
    diagnostics (reference 5-distribution sweep, :760-862 + funnel smoke
    :511-665)."""
    dim = 6
    tgt = get_target_distribution(name, dim)
    prop = NormalProposal.create(tgt.dim, 0.5 ** 2 / tgt.dim)
    res = run_rwm(tgt, prop, key, num_chains=32, num_iterations=500,
                  burn_in=100)
    acc = float(res.acceptance_rate.mean())
    esjd = float(res.esjd.mean())
    assert np.isfinite(acc) and 0.0 < acc <= 1.0
    assert np.isfinite(esjd) and esjd >= 0.0
    # final states must have finite log density (chains stay in-support)
    assert bool(jnp.all(jnp.isfinite(res.state.logp)))


@pytest.mark.parametrize("proposal_name", ["Normal", "Laplace", "UniformRadius"])
def test_all_proposals_integrate(proposal_name, key):
    """MCMC integration per proposal family (reference test_proposals.py:218-283)."""
    dim = 4
    cfgs = {"Normal": {"base_variance_scalar": 0.5},
            "Laplace": {"base_variance_vector": 0.5},
            "UniformRadius": {"base_radius": 1.2}}
    tgt = MultivariateNormal.create(dim)
    prop = create_proposal_distribution(dim, {"name": proposal_name,
                                              "params": cfgs[proposal_name]})
    res = run_rwm(tgt, prop, key, num_chains=128, num_iterations=3000,
                  burn_in=300)
    acc = float(res.acceptance_rate.mean())
    assert 0.05 < acc < 0.95
    # moments via long-run mean of final states across chains
    assert float(jnp.abs(res.state.x.mean())) < 0.3


def test_determinism_same_seed(key):
    """Counter-based RNG: identical seeds give identical runs."""
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    r1 = run_rwm(tgt, prop, key, num_chains=8, num_iterations=200, burn_in=0)
    r2 = run_rwm(tgt, prop, key, num_chains=8, num_iterations=200, burn_in=0)
    np.testing.assert_array_equal(np.asarray(r1.state.x), np.asarray(r2.state.x))
    r3 = run_rwm(tgt, prop, jax.random.key(123), num_chains=8,
                 num_iterations=200, burn_in=0)
    assert not np.array_equal(np.asarray(r1.state.x), np.asarray(r3.state.x))


def test_rbg_rng_impl(key):
    """The 'rbg' PRNG (TPU-friendly, ~25% faster scan steps) must produce
    statistically equivalent runs through the public API."""
    from rwm_pt_tpu.api import MCMCSimulation
    sim = MCMCSimulation(dim=2, sigma=2.83, num_iterations=4000,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=64, burn_in=400, seed=3,
                         record_chain=False, rng_impl="rbg")
    sim.generate_samples(verbose=False)
    assert 0.15 < sim.acceptance_rate() < 0.45
    x = np.asarray(sim._result.state.x)
    assert abs(x.mean()) < 0.2


def test_dim_derived_from_structured_target(key):
    """Targets whose dim comes from their own structure (SuperFunnel,
    HybridRosenbrock) must override a missing dim argument."""
    from rwm_pt_tpu.api import MCMCSimulation
    sim = MCMCSimulation(dim=None, sigma=0.1, num_iterations=200,
                         algorithm="RWM", target_dist="SuperFunnel",
                         num_chains=8, burn_in=20, record_chain=False,
                         seed=2, target_kwargs={"J": 5, "K": 3,
                                                "n_per_group": 20})
    assert sim.dim == 5 + 5 * 3 + 1 + 3 + 2     # J+JK+1+K+2 (funnel_torch.py:134)
    sim.generate_samples(verbose=False)
    assert 0.0 <= sim.acceptance_rate() <= 1.0


def test_algorithm_dispatch_reference_class_names(key):
    """Dispatch-by-classname must match the reference's rule: PT only for
    'ParallelTempering' names (simulation_gpu.py:83) or explicit PT aliases.
    Regression: 'RandomWalkMH_GPU_OPTimized' contains the substring 'pt' and
    round-4's bare substring test silently ran it as an 8-rung PT."""
    from rwm_pt_tpu.api import MCMCSimulation

    def make(algo):
        return MCMCSimulation(dim=2, sigma=1.0, num_iterations=10,
                              algorithm=algo, num_chains=4, burn_in=0,
                              target_dist="MultivariateNormal", seed=0,
                              record_chain=False)

    for algo in ("RWM", "RandomWalkMH", "RandomWalkMH_GPU_Optimized"):
        assert not make(algo).is_pt, algo
    for algo in ("PT", "PT_RWM", "PTrwm_GPU", "ParallelTemperingRWM",
                 "ParallelTemperingRWM_GPU_Optimized"):
        assert make(algo).is_pt, algo
