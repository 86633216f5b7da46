"""Adaptive proposal-scale tuning tests (kernels/adapt.py).

The tuner must land the post-burn-in acceptance at the requested target from
badly mis-scaled starting proposals — the capability that replaces the
reference's 40-point scale sweeps (experiment_RWM_GPU.py:213-243).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.api import MCMCSimulation
from rwm_pt_tpu.kernels import run_pt_adaptive, run_rwm_adaptive
from rwm_pt_tpu.proposals import NormalProposal, UniformRadiusProposal
from rwm_pt_tpu.targets import MultivariateNormal

OPT_VAR = 2.38 ** 2 / 10  # near-optimal base variance for the 10-d MVN


@pytest.mark.parametrize("mult", [1 / 100.0, 25.0])
def test_rwm_autotune_converges_from_bad_scales(key, mult):
    tgt = MultivariateNormal.create(10)
    prop = NormalProposal.create(10, OPT_VAR * mult)
    out = run_rwm_adaptive(tgt, prop, key, num_chains=256,
                           num_iterations=2000, burn_in=3000,
                           adapt_every=100)
    acc = float(out.result.acceptance_rate.mean())
    assert abs(acc - 0.234) < 0.04
    # tuned effective variance should approximately undo the mis-scaling
    eff = mult * float(out.tuned_scale_multiplier)
    assert 0.3 < eff < 3.0


def test_rwm_autotune_respects_custom_target(key):
    tgt = MultivariateNormal.create(10)
    prop = NormalProposal.create(10, OPT_VAR)
    out = run_rwm_adaptive(tgt, prop, key, num_chains=256,
                           num_iterations=2000, burn_in=3000,
                           adapt_every=100, target_accept=0.5)
    assert abs(float(out.result.acceptance_rate.mean()) - 0.5) < 0.05


def test_rwm_autotune_post_phase_is_exact(key):
    """Frozen adaptation: the post-burn-in phase must sample the target
    exactly (moments of N(0, I))."""
    tgt = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 50.0)   # badly oversized
    out = run_rwm_adaptive(tgt, prop, key, num_chains=512,
                           num_iterations=4000, burn_in=3000,
                           adapt_every=100)
    x = np.asarray(out.result.state.x)       # (2, 512) final states
    assert np.abs(x.mean()) < 0.15
    assert abs(x.std() - 1.0) < 0.15


def test_rwm_autotune_nonnormal_proposal(key):
    tgt = MultivariateNormal.create(10)
    prop = UniformRadiusProposal.create(10, 0.05)   # far too small
    out = run_rwm_adaptive(tgt, prop, key, num_chains=256,
                           num_iterations=2000, burn_in=3000,
                           adapt_every=100)
    assert abs(float(out.result.acceptance_rate.mean()) - 0.234) < 0.05


def test_pt_autotune_per_rung(key):
    tgt = MultivariateNormal.create(10)
    prop = NormalProposal.create(10, OPT_VAR / 100.0)
    betas = jnp.geomspace(1.0, 0.01, 6)
    out = run_pt_adaptive(tgt, prop, key, betas, num_chains=128,
                          num_iterations=2000, burn_in=3000, swap_every=20,
                          adapt_every=100)
    per_rung = np.asarray(out.result.acceptance_rate.mean(axis=1))
    assert np.all(np.abs(per_rung - 0.234) < 0.05)
    assert out.tuned_scale_multipliers.shape == (6,)
    # the post-burn-in phase still swaps
    assert float(out.result.swap_acceptance_rate.mean()) > 0.0


def test_api_autotune_integration(key):
    sim = MCMCSimulation(dim=10, sigma=OPT_VAR / 50.0, num_iterations=2000,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=256, burn_in=3000, autotune=True)
    out = sim.generate_samples(verbose=False)
    assert out is None
    assert abs(sim.acceptance_rate() - 0.234) < 0.05
    info = sim.get_diagnostic_info()
    assert info["autotune_target"] == 0.234
    assert info["tuned_scale_multiplier"] > 1.0
    cfg = sim.tuned_proposal_config()
    assert cfg["params"]["base_variance_scalar"] > OPT_VAR / 50.0


def test_api_autotune_validation():
    with pytest.raises(ValueError, match="record_chain"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="RWM",
                       target_dist="MultivariateNormal", autotune=True,
                       burn_in=200, record_chain=True)
    # too little burn-in for even one adaptation window
    with pytest.raises(ValueError, match="burn_in"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="RWM",
                       target_dist="MultivariateNormal", autotune=True)
    # cpu_semantics path has no adaptive kernel
    with pytest.raises(ValueError, match="cpu_semantics"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="PT",
                       target_dist="MultivariateNormal", autotune=True,
                       burn_in=200, cpu_semantics=True)
    # autotune + engine='pallas' is the two-phase tuned handoff; its
    # measurement phase needs the TPU backend, so on CPU the run raises
    # BEFORE spending the tuning burn-in
    sim_p = MCMCSimulation(dim=2, sigma=1.0, num_iterations=10,
                           algorithm="RWM",
                           target_dist="MultivariateNormal", autotune=True,
                           burn_in=200, engine="pallas")
    if jax.default_backend() != "tpu":
        with pytest.raises(ValueError, match="TPU backend"):
            sim_p.generate_samples(verbose=False)
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=50,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=2, burn_in=200, autotune=True)
    with pytest.raises(ValueError, match="autotune and checkpoint_every"):
        sim.generate_samples(verbose=False, checkpoint_every=10,
                             checkpoint_path="/tmp/x")


# ---------------------------------------------------------------- ladder tuner
def test_ladder_adaptive_converges_to_target(key):
    """run_pt_ladder_adaptive: tuned ladder is monotone with beta_0 == 1 and
    the post-burn-in (frozen-ladder) swap acceptance lands near the target."""
    from rwm_pt_tpu.kernels import run_pt_ladder_adaptive
    tgt = MultivariateNormal.create(5)
    prop = NormalProposal.create(5, 2.38 ** 2 / 5)
    out = run_pt_ladder_adaptive(
        tgt, prop, key, num_rungs=6, num_chains=256, num_iterations=4000,
        burn_in=4000, swap_every=10, adapt_swap_every=10, adapt_every=200,
        target_swap_accept=0.234)
    betas = np.asarray(out.tuned_betas)
    assert betas.shape == (6,)
    assert betas[0] == 1.0
    assert np.all(np.diff(betas) < 0)          # strictly decreasing
    assert np.all(betas > 0)
    acc = float(np.mean(np.asarray(out.result.swap_acceptance_rate)))
    assert abs(acc - 0.234) < 0.06, f"swap acceptance {acc} far from target"


def test_ladder_adaptive_swap_accounting(key):
    """Official swap counters must only see post-burn-in production swaps
    (measurement swaps during adaptation are excluded)."""
    from rwm_pt_tpu.kernels import run_pt_ladder_adaptive
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    T, n, b, se = 4, 300, 200, 25
    out = run_pt_ladder_adaptive(
        tgt, prop, key, num_rungs=T, num_chains=8, num_iterations=n,
        burn_in=b, swap_every=se, adapt_swap_every=10, adapt_every=100)
    # production swap events: steps s in (b, b+n] with s % se == 0
    n_events = (b + n) // se - b // se
    assert int(out.result.state.swap_attempt_count) == n_events * (T - 1)
    assert int(out.result.state.step) == b + n


def test_api_autotune_ladder_dispatch(key):
    """autotune_ladder=True must actually run the ladder tuner: the run's
    beta_ladder is replaced by the tuned one and exposed via diagnostics
    (regression test for the silently-ignored flag)."""
    sim = MCMCSimulation(dim=5, sigma=2.38 ** 2 / 5, num_iterations=3000,
                         algorithm="PT", target_dist="MultivariateNormal",
                         num_chains=128, burn_in=3000, swap_every=10,
                         autotune_ladder=True, autotune_every=200,
                         swap_acceptance_rate=0.3)
    geometric = list(sim.beta_ladder)
    out = sim.generate_samples(verbose=False)
    assert out is None
    assert sim.tuned_ladder is not None
    assert sim.beta_ladder == sim.tuned_ladder
    assert sim.beta_ladder != geometric       # adaptation actually moved it
    assert sim.beta_ladder[0] == 1.0
    assert all(b2 < b1 for b1, b2 in zip(sim.beta_ladder, sim.beta_ladder[1:]))
    info = sim.get_diagnostic_info()
    assert info["autotune_ladder_target"] == 0.3
    assert info["tuned_beta_ladder"] == sim.tuned_ladder
    assert abs(sim.swap_acceptance_rate() - 0.3) < 0.08


def test_api_autotune_ladder_validation():
    with pytest.raises(ValueError, match="PT"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="RWM",
                       target_dist="MultivariateNormal", autotune_ladder=True,
                       burn_in=200)
    with pytest.raises(ValueError, match="mutually exclusive"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="PT",
                       target_dist="MultivariateNormal", autotune=True,
                       autotune_ladder=True, burn_in=200)
    with pytest.raises(ValueError, match="iterative_temp_spacing"):
        MCMCSimulation(dim=2, sigma=1.0, num_iterations=10, algorithm="PT",
                       target_dist="MultivariateNormal", autotune_ladder=True,
                       iterative_temp_spacing=True, burn_in=200)


# ------------------------------------------------- tuned handoff round-trip
def test_run_pt_scale_multipliers_identity(key):
    """c == 1 must be bitwise-identical to no multipliers at all."""
    from rwm_pt_tpu.kernels import run_pt
    tgt = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 2.38 ** 2 / 4)
    betas = jnp.asarray([1.0, 0.5, 0.25, 0.1])
    kw = dict(num_chains=32, num_iterations=500, burn_in=100, swap_every=10)
    a = run_pt(tgt, prop, key, betas, **kw)
    b = run_pt(tgt, prop, key, betas, scale_multipliers=jnp.ones(4), **kw)
    np.testing.assert_array_equal(np.asarray(a.state.x), np.asarray(b.state.x))
    np.testing.assert_array_equal(np.asarray(a.acceptance_rate),
                                  np.asarray(b.acceptance_rate))


@pytest.mark.parametrize("layout", ["flat", "tc"])
def test_run_pt_scale_multipliers_move_acceptance(key, layout):
    """Larger per-rung c -> bolder increments -> lower MH acceptance, rung by
    rung; the accept ratio must keep the true betas (exact MH)."""
    from rwm_pt_tpu.kernels import run_pt
    tgt = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 2.38 ** 2 / 4)
    betas = jnp.asarray([1.0, 0.5, 0.25, 0.1])
    c = jnp.asarray([9.0, 1.0, 1.0, 9.0])
    kw = dict(num_chains=128, num_iterations=2000, burn_in=200,
              swap_every=10, layout=layout)
    base = run_pt(tgt, prop, key, betas, **kw)
    tuned = run_pt(tgt, prop, key, betas, scale_multipliers=c, **kw)
    acc0 = np.asarray(base.acceptance_rate).mean(axis=1)   # (T,)
    acc1 = np.asarray(tuned.acceptance_rate).mean(axis=1)
    assert acc1[0] < acc0[0] - 0.05 and acc1[3] < acc0[3] - 0.05
    assert abs(acc1[1] - acc0[1]) < 0.03 and abs(acc1[2] - acc0[2]) < 0.03


def test_tuned_proposal_config_roundtrips_full_vector(key):
    """An autotuned PT run's tuned_proposal_config() must reproduce the
    tuned per-rung acceptance in a FRESH simulation (no autotune) — the full
    vector, not just the cold rung (round-3 verdict item 3)."""
    betas = [1.0, 0.4, 0.15, 0.05]
    sim = MCMCSimulation(dim=10, sigma=50.0, num_iterations=3000,
                         algorithm="PT", target_dist="MultivariateNormal",
                         num_chains=128, burn_in=3000, autotune=True,
                         beta_ladder=betas, swap_every=10)
    sim.generate_samples(verbose=False)
    cfg = sim.tuned_proposal_config()
    mult = cfg["params"]["rung_scale_multipliers"]
    assert len(mult) == 4
    # every rung's multiplier must have really tuned away the 50x-oversized
    # base (for MVN the base/beta law is per-rung-correct, so the tuned
    # vector is near-uniform ~ optimal_var/50 — but each entry is its rung's
    # own tuned value, carried losslessly)
    assert all(0.3 < m * 50.0 / OPT_VAR < 3.0 for m in mult)
    sim2 = MCMCSimulation(dim=10, proposal_config=cfg, num_iterations=3000,
                          algorithm="PT", target_dist="MultivariateNormal",
                          num_chains=128, burn_in=500, beta_ladder=betas,
                          swap_every=10, record_chain=False)
    sim2.generate_samples(verbose=False)
    acc = np.asarray(sim2._result.acceptance_rate).mean(axis=1)  # (T,)
    np.testing.assert_allclose(acc, 0.234, atol=0.06)


def test_rung_multipliers_validation():
    with pytest.raises(ValueError, match="requires a PT algorithm"):
        MCMCSimulation(dim=2, proposal_config={
            "name": "Normal", "params": {"base_variance_scalar": 1.0,
                                         "rung_scale_multipliers": [1, 1]}},
            num_iterations=10, algorithm="RWM",
            target_dist="MultivariateNormal")
    with pytest.raises(ValueError, match="rungs"):
        MCMCSimulation(dim=2, proposal_config={
            "name": "Normal", "params": {"base_variance_scalar": 1.0,
                                         "rung_scale_multipliers": [1, 1]}},
            num_iterations=10, algorithm="PT",
            target_dist="MultivariateNormal", beta_ladder=[1.0, 0.5, 0.1])


def test_device_ladder_builder_matches_host_bitwise():
    """construct_iterative_ladder_device compiles the whole SA search into
    one XLA program with the SAME probe stream (fold_in per probe counter +
    star/curr split) as the host builder — same seed must make the same
    probe decisions and land the same ladder (up to f32 rounding of the
    scalar rho recurrence, which the host runs in float64).  This is what
    makes production-precision construction-realization ensembles tractable
    (scripts/pt_ladder_ensemble.py)."""
    from rwm_pt_tpu.ladders import construct_iterative_ladder
    from rwm_pt_tpu.ladders.ladders import construct_iterative_ladder_device
    from rwm_pt_tpu.targets import get_target_distribution

    tgt = get_target_distribution("MultivariateNormal", 5, variant="pt_gpu")
    kw = dict(target_swap_acceptance_rate=0.3, N_samples_swap_est=2000,
              tolerance=0.01, max_pn_adjustment_steps=50,
              convergence_failure_tolerance_factor=3.0, seed=4)
    host = construct_iterative_ladder(tgt, **kw)
    dev = construct_iterative_ladder_device(tgt, **kw)
    assert len(host) == len(dev)
    np.testing.assert_allclose(host, dev, rtol=1e-5)
