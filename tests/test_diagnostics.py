"""Convergence diagnostics: split-R-hat, ESS, IACT, MCSE.

Validated against closed forms: iid draws have ESS ~= N and IACT ~= 1; an
AR(1) chain with coefficient phi has IACT = (1+phi)/(1-phi); stationary
same-target chains give R-hat ~= 1 while displaced chains blow it up.
"""
import numpy as np
import pytest

from rwm_pt_tpu.analysis import (autocorrelation, effective_sample_size,
                                 integrated_autocorr_time, mcse_mean,
                                 split_rhat)


def _ar1(rng, n, chains, phi, mu=0.0):
    x = np.empty((n, chains))
    innov_sd = np.sqrt(1.0 - phi ** 2)       # stationary unit variance
    x[0] = rng.standard_normal(chains)
    for t in range(1, n):
        x[t] = phi * x[t - 1] + innov_sd * rng.standard_normal(chains)
    return x + mu


class TestIID:
    def test_ess_near_total(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((4000, 4))
        ess = effective_sample_size(x)
        assert 0.75 * 16000 < ess, ess

    def test_iact_near_one(self):
        rng = np.random.default_rng(1)
        tau = integrated_autocorr_time(rng.standard_normal((4000, 4)))
        assert 0.6 < tau < 1.5, tau

    def test_rhat_near_one(self):
        rng = np.random.default_rng(2)
        r = split_rhat(rng.standard_normal((4000, 4)))
        assert abs(r - 1.0) < 0.01, r

    def test_mcse_matches_sd_over_sqrt_n(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((5000, 4))
        se = mcse_mean(x)
        assert abs(se - 1.0 / np.sqrt(20000)) < 0.3 / np.sqrt(20000), se


class TestAR1:
    def test_iact_matches_theory(self):
        # IACT of AR(1) = (1+phi)/(1-phi) = 19 for phi=0.9
        rng = np.random.default_rng(4)
        x = _ar1(rng, 40000, 4, phi=0.9)
        tau = integrated_autocorr_time(x)
        assert 0.7 * 19 < tau < 1.3 * 19, tau

    def test_ess_matches_theory(self):
        rng = np.random.default_rng(5)
        x = _ar1(rng, 40000, 4, phi=0.5)   # tau = 3
        ess = effective_sample_size(x)
        assert 0.7 * 160000 / 3 < ess < 1.3 * 160000 / 3, ess

    def test_autocorrelation_decay(self):
        rng = np.random.default_rng(6)
        x = _ar1(rng, 50000, 8, phi=0.8)
        rho = autocorrelation(x, max_lag=5)
        assert rho[0] == pytest.approx(1.0)
        for k in (1, 2, 3):
            assert rho[k] == pytest.approx(0.8 ** k, abs=0.03)


class TestRhatDetectsProblems:
    def test_displaced_chains(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal((2000, 4)) + np.array([0.0, 0.0, 3.0, 3.0])
        assert split_rhat(x) > 1.5

    def test_single_chain_drift(self):
        # split-R-hat catches within-chain drift even with one chain
        rng = np.random.default_rng(8)
        x = rng.standard_normal(2000) + np.linspace(0, 5, 2000)
        assert split_rhat(x) > 1.3

    def test_constant_chain_is_finite(self):
        x = np.ones((100, 4))
        assert np.isfinite(split_rhat(x))
        assert np.isfinite(effective_sample_size(x))


class TestShapes:
    def test_3d_input_per_dimension(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((1000, 3, 4))
        for fn in (effective_sample_size, split_rhat, mcse_mean,
                   integrated_autocorr_time):
            out = fn(x)
            assert out.shape == (3,), (fn.__name__, out.shape)

    def test_1d_input_scalar(self):
        rng = np.random.default_rng(10)
        assert np.isscalar(split_rhat(rng.standard_normal(500)))

    def test_too_few_draws_raises(self):
        with pytest.raises(ValueError):
            effective_sample_size(np.zeros(3))


class TestSimulationIntegration:
    def test_multichain_diagnostics_on_mvn(self):
        from rwm_pt_tpu.api import MCMCSimulation
        sim = MCMCSimulation(dim=3, sigma=2.38 ** 2 / 3,
                             num_iterations=2000, burn_in=200,
                             target_dist="MultivariateNormal",
                             num_chains=8, record_chains=4, seed=11)
        sim.generate_samples(verbose=False)
        r = sim.split_rhat()
        ess = sim.effective_sample_size()
        assert r.shape == (3,) and ess.shape == (3,)
        assert np.all(r < 1.1), r
        assert np.all(ess > 50), ess
        # IACT consistent with ESS: tau = draws_total / ess
        tau = sim.integrated_autocorr_time()
        n_total = sim._get_chains_3d().shape[0] * 4
        np.testing.assert_allclose(tau, n_total / ess, rtol=1e-6)

    def test_record_chains_validation(self):
        from rwm_pt_tpu.api import MCMCSimulation
        with pytest.raises(ValueError, match="record_chains"):
            MCMCSimulation(dim=2, sigma=0.5, num_iterations=10,
                           target_dist="MultivariateNormal",
                           num_chains=2, record_chains=4)

    def test_pt_cold_chain_diagnostics(self):
        from rwm_pt_tpu.api import MCMCSimulation
        sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=1500,
                             burn_in=100, algorithm="PT",
                             target_dist="MultivariateNormal",
                             num_chains=4, record_chains=4,
                             swap_every=20, seed=12)
        sim.generate_samples(verbose=False)
        assert np.all(sim.split_rhat() < 1.2)
        assert np.all(sim.effective_sample_size() > 20)

    def test_recording_disabled_raises(self):
        from rwm_pt_tpu.api import MCMCSimulation
        sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=50,
                             target_dist="MultivariateNormal",
                             record_chain=False)
        sim.generate_samples(verbose=False)
        with pytest.raises(ValueError, match="record"):
            sim.split_rhat()


class TestReviewRegressions:
    def test_record_chains_budget_scales_thinning(self):
        from rwm_pt_tpu.api import MCMCSimulation
        # same steps x dim, 4x the recorded replicas -> ~4x the thinning
        s1 = MCMCSimulation(dim=10, sigma=0.5, num_iterations=300_000,
                            target_dist="MultivariateNormal",
                            record_chain=True, num_chains=4)
        s4 = MCMCSimulation(dim=10, sigma=0.5, num_iterations=300_000,
                            target_dist="MultivariateNormal",
                            record_chain=True, num_chains=4, record_chains=4)
        assert s4.record_every >= 4 * s1.record_every

    def test_record_chains_without_recording_raises_at_construction(self):
        from rwm_pt_tpu.api import MCMCSimulation
        with pytest.raises(ValueError, match="record_chains > 1"):
            MCMCSimulation(dim=2, sigma=0.5, num_iterations=100,
                           target_dist="MultivariateNormal",
                           num_chains=4, record_chains=2, record_chain=False)
        with pytest.raises(ValueError, match="record_chains > 1"):
            MCMCSimulation(dim=2, sigma=0.5, num_iterations=100_000_000,
                           target_dist="MultivariateNormal",
                           num_chains=4, record_chains=2)  # over budget
        with pytest.raises(ValueError, match="record_chains > 1"):
            MCMCSimulation(dim=2, sigma=0.5, num_iterations=5000,
                           burn_in=1000, target_dist="MultivariateNormal",
                           num_chains=4, record_chains=2, autotune=True)

    def test_autocorrelation_stuck_chain_counts_as_correlated(self):
        rng = np.random.default_rng(20)
        healthy = rng.standard_normal((4000, 1))
        stuck = np.full((4000, 1), 2.5)
        rho = autocorrelation(np.concatenate([healthy, stuck], axis=1),
                              max_lag=3)
        assert rho[0] == pytest.approx(1.0)
        # healthy chain contributes ~0 at lag 1, stuck chain contributes 1
        assert rho[1] == pytest.approx(0.5, abs=0.05)


def test_roughcarpet_extreme_state_is_neg_inf_not_nan():
    """The unrolled 3-way logsumexp must degrade to -inf (recoverable),
    never NaN (chain frozen forever), when all quadratics overflow f32."""
    import jax.numpy as jnp
    from rwm_pt_tpu.targets import get_target_distribution
    t = get_target_distribution("RoughCarpet", 4)
    x = jnp.full((4, 3), 1e30, jnp.float32)     # (d, B) far past f32 overflow
    lp = t.log_density_td(x)
    assert np.all(np.isneginf(np.asarray(lp))), np.asarray(lp)
