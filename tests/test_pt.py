"""Parallel Tempering correctness tests.

Mirrors the reference PT suites (/root/reference/tests/test_pt_gpu.py:17-94,
tests/test_pt_gpu_optimizations.py:60-97, tests/test_pt_gpu_advanced.py):
moment recovery on MVN, swap-acceptance sanity, multimodal mixing advantage
over plain RWM, ladder configuration behavior, and accounting checks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.kernels import run_pt, run_rwm
from rwm_pt_tpu.ladders import (construct_geometric_ladder,
                                construct_iterative_ladder)
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import MultivariateNormal, ThreeMixture


def test_geometric_ladder_values():
    """c=0.5 down to 1e-2 then append (pt_rwm_gpu_optimized.py:245-257)."""
    ladder = construct_geometric_ladder()
    expected = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625, 0.01]
    np.testing.assert_allclose(ladder, expected)


def test_pt_mvn_moments(key):
    """PT on 8-d MVN: mean err < 0.15, cov diag err < 0.5
    (test_pt_gpu_optimizations.py:60-97 tolerances)."""
    dim = 8
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.asarray(construct_geometric_ladder(), jnp.float32)
    res = run_pt(tgt, prop, key, betas, num_chains=16, num_iterations=8000,
                 burn_in=1000, swap_every=10, record_every=1, record_chains=16)
    cold = np.asarray(res.chain)[1000:]                 # (n, d, C)
    samples = cold.transpose(0, 2, 1).reshape(-1, dim)
    assert np.abs(samples.mean(0)).max() < 0.15
    assert np.abs(samples.var(0) - 1.0).max() < 0.5
    assert float(res.swap_acceptance_rate.mean()) > 0.1


def test_pt_esjd_accounting(key):
    """beta-ESJD = sum of accepted (dbeta)^2 / attempts; attempts = (T-1) per
    swap event post burn-in (pt_rwm_gpu_optimized.py:594-633)."""
    tgt = MultivariateNormal.create(4)
    prop = NormalProposal.create(4, 1.0)
    betas = jnp.array([1.0, 0.5, 0.25, 0.125])
    n, b, swap_every = 1000, 100, 10
    res = run_pt(tgt, prop, key, betas, num_chains=4, num_iterations=n,
                 burn_in=b, swap_every=swap_every)
    # swap events: steps s in (b, b+n] with s % swap_every == 0
    events = sum(1 for s in range(b + 1, b + n + 1) if s % swap_every == 0)
    assert int(res.state.swap_attempt_count) == events * (len(betas) - 1)
    # pt_esjd consistent with counters
    attempts = float(res.state.swap_attempt_count)
    np.testing.assert_allclose(
        np.asarray(res.pt_esjd),
        np.asarray(res.state.sum_beta_sq_jump) / attempts, rtol=1e-6)
    # accepted swaps <= attempts
    assert int(res.state.swap_accept_count.max()) <= events * (len(betas) - 1)


def test_no_swaps_during_burn_in(key):
    """Swaps only post-burn-in (pt_rwm_gpu_optimized.py:569-571)."""
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    betas = jnp.array([1.0, 0.5])
    res = run_pt(tgt, prop, key, betas, num_chains=2, num_iterations=5,
                 burn_in=100, swap_every=10)
    # only steps 101..105 can host events; none are multiples of 10 => 0
    assert int(res.state.swap_attempt_count) == 0


def test_multimodal_mixing_beats_rwm(key):
    """PT mixes the 3-mixture far better than plain RWM
    (test_pt_gpu_advanced.py:21-123): PT visits multiple modes, RWM with a
    small proposal stays stuck near one."""
    dim = 2
    tgt = ThreeMixture.create(dim)  # modes at first-coord -5, 0, +5
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.asarray(construct_geometric_ladder(), jnp.float32)
    n = 6000
    pt = run_pt(tgt, prop, key, betas, num_chains=8, num_iterations=n,
                burn_in=500, swap_every=10, record_every=1, record_chains=8)
    cold = np.asarray(pt.chain)[500:, 0, :]             # first coordinate
    # mode occupancy: fraction of samples near each mode center
    occ = [np.mean(np.abs(cold - c) < 2.0) for c in (-5.0, 0.0, 5.0)]
    assert min(occ) > 0.03, f"PT failed to visit all modes: {occ}"

    rwm = run_rwm(tgt, prop, key, num_chains=8, num_iterations=n,
                  burn_in=500, record_every=1, record_chains=8)
    cold_r = np.asarray(rwm.chain)[500:, 0, :]
    # per-chain: PT cold chains should individually traverse modes more often
    pt_span = np.mean(cold.max(0) - cold.min(0))
    rwm_span = np.mean(cold_r.max(0) - cold_r.min(0))
    assert pt_span > rwm_span * 0.9  # PT at least comparable, typically larger


def test_swap_acceptance_decreases_with_coarser_ladder(key):
    """Wider beta gaps => lower swap acceptance (ladder-config behavior,
    test_pt_gpu_advanced.py:197-285)."""
    dim = 10
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    fine = jnp.asarray([1.0, 0.8, 0.64, 0.512, 0.41, 0.328])
    coarse = jnp.asarray([1.0, 0.25, 0.0625, 0.0156, 0.0039, 0.001])
    r_fine = run_pt(tgt, prop, key, fine, num_chains=32, num_iterations=3000,
                    burn_in=300, swap_every=10)
    r_coarse = run_pt(tgt, prop, key, coarse, num_chains=32,
                      num_iterations=3000, burn_in=300, swap_every=10)
    assert (float(r_fine.swap_acceptance_rate.mean())
            > float(r_coarse.swap_acceptance_rate.mean()))


def test_iterative_ladder_mvn(key):
    """Iterative construction on MVN yields a decreasing ladder from 1.0 to
    beta_min with plausible length (pt_rwm_gpu_optimized.py:283-426)."""
    tgt = MultivariateNormal.create(10)
    ladder = construct_iterative_ladder(
        tgt, target_swap_acceptance_rate=0.234, N_samples_swap_est=5000,
        tolerance=0.01, seed=1)
    arr = np.asarray(ladder)
    assert arr[0] == 1.0
    assert np.all(np.diff(arr) < 0)
    assert abs(arr[-1] - 0.01) < 1e-6
    assert 3 <= len(arr) <= 60
    # achieved adjacent swap probability should be near target for interior rungs
    from rwm_pt_tpu.ladders.ladders import _estimate_swap_prob
    for b0, b1 in zip(arr[:-2], arr[1:-1]):
        a = float(_estimate_swap_prob(tgt, key, jnp.float32(b0),
                                      jnp.float32(b1), 20000))
        assert abs(a - 0.234) < 0.05, (b0, b1, a)


def test_iterative_ladder_requires_sampler():
    from rwm_pt_tpu.targets import FullRosenbrock
    with pytest.raises(NotImplementedError):
        construct_iterative_ladder(FullRosenbrock.create(5))


def test_funnel_tempered_sampler_moments(key):
    """The beta-tempered funnel sampler (targets/funnel.py direct_sample —
    capability superset: the reference raises, funnel_torch.py:89) must match
    the closed-form tempered moments: Var(v) = sigma_v^2/beta and
    E[v] = mu_v + (1-beta)(D-1) sigma_v^2 / (2 beta)."""
    from rwm_pt_tpu.targets import NealFunnel
    tgt = NealFunnel.create(5)
    for beta in (1.0, 0.5):
        draws = np.asarray(tgt.direct_sample(key, 400_000, beta))
        v = draws[:, 0]
        mean_expect = (1.0 - beta) * 4 * 9.0 / (2.0 * beta)
        assert abs(v.mean() - mean_expect) < 0.03, beta
        assert abs(v.var() - 9.0 / beta) < 0.15, beta
        # z | v ~ N(0, e^v/beta): standardized residuals are unit normal
        zstd = draws[:, 1:] / np.sqrt(np.exp(v)[:, None] / beta)
        assert abs(zstd.mean()) < 0.01
        assert abs(zstd.std() - 1.0) < 0.01


def test_iterative_ladder_on_funnel():
    """Iterative ladder construction now works for NealFunnel (the reference
    cannot: its draw_samples_torch raises)."""
    from rwm_pt_tpu.targets import NealFunnel
    ladder = construct_iterative_ladder(
        NealFunnel.create(10), target_swap_acceptance_rate=0.234,
        N_samples_swap_est=20000, seed=3, verbose=False)
    assert ladder[0] == 1.0 and ladder[-1] == pytest.approx(0.01)
    assert len(ladder) >= 3                   # found interior rungs
    assert all(a > b for a, b in zip(ladder, ladder[1:]))


def test_cold_chain_includes_swap_jumps(key):
    """Cold-chain ESJD accumulates across MH and swap moves combined
    (pt_rwm_gpu_optimized.py:772-789 computes it from the stored cold chain,
    which records post-swap states)."""
    tgt = ThreeMixture.create(2)
    prop = NormalProposal.create(2, 0.1)  # tiny MH moves
    betas = jnp.asarray(construct_geometric_ladder(), jnp.float32)
    res = run_pt(tgt, prop, key, betas, num_chains=16, num_iterations=4000,
                 burn_in=200, swap_every=5)
    res_noswap = run_pt(tgt, prop, key, betas, num_chains=16,
                        num_iterations=4000, burn_in=200, swap_every=10 ** 9)
    # swap moves between distant modes inflate x-space cold ESJD
    assert (float(res.cold_esjd.mean())
            > 2.0 * float(res_noswap.cold_esjd.mean()))


def test_pt_determinism(key):
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    betas = jnp.array([1.0, 0.3, 0.1])
    r1 = run_pt(tgt, prop, key, betas, num_chains=4, num_iterations=100,
                burn_in=10, swap_every=5)
    r2 = run_pt(tgt, prop, key, betas, num_chains=4, num_iterations=100,
                burn_in=10, swap_every=5)
    np.testing.assert_array_equal(np.asarray(r1.state.x), np.asarray(r2.state.x))


def test_cold_chain_mode_occupancy(key):
    """PT on the 3-mode mixture: the cold chain must visit all modes with
    roughly equal occupancy (the capability PT exists for; plain RWM stays
    trapped — see test_multimodal_mixing_beats_rwm)."""
    from rwm_pt_tpu.targets import ThreeMixture

    target = ThreeMixture.create(2)
    prop = NormalProposal.create(2, 2.38 ** 2 / 2)
    betas = jnp.geomspace(1.0, 0.01, 8).astype(jnp.float32)
    res = run_pt(target, prop, key, betas, num_chains=64,
                 num_iterations=4000, burn_in=500, swap_every=10,
                 record_every=10, record_chains=64)
    chain = np.asarray(res.chain)          # (n_rec, d, 64) cold-rung states
    x0 = chain[:, 0, :].ravel()            # first coordinate separates modes
    occ = np.array([(x0 < -2.5).mean(),
                    ((x0 >= -2.5) & (x0 <= 2.5)).mean(),
                    (x0 > 2.5).mean()])
    # equal 1/3 weights; generous band for finite-sample + burn-in effects
    assert occ.min() > 0.15 and occ.max() < 0.55, occ


def test_sequential_sweep_matches_even_odd_statistics(key):
    """The reference's exact in-order pair sweep (swap_sweep='sequential',
    pt_rwm_gpu_optimized.py:594-633) and the vectorized even/odd half-sweeps
    must agree on swap acceptance, beta-ESJD, and cold-chain moments within
    MC error, with identical attempt accounting."""
    dim = 4
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.geomspace(1.0, 0.01, 6)
    kw = dict(num_chains=256, num_iterations=20000, burn_in=500, swap_every=10)
    eo = run_pt(tgt, prop, key, betas, swap_sweep="even_odd", **kw)
    sq = run_pt(tgt, prop, key, betas, swap_sweep="sequential", **kw)
    assert int(eo.state.swap_attempt_count) == int(sq.state.swap_attempt_count)
    assert abs(float(eo.swap_acceptance_rate.mean())
               - float(sq.swap_acceptance_rate.mean())) < 0.02
    assert abs(float(eo.pt_esjd.mean()) - float(sq.pt_esjd.mean())) \
        < 0.1 * float(eo.pt_esjd.mean()) + 1e-4
    # cold chain still targets pi under either sweep order
    mu = jnp.mean(sq.state.x[:, 0, :], axis=1)
    assert float(jnp.max(jnp.abs(mu))) < 0.3


def test_sequential_sweep_cascade(key):
    """With a dense ladder the sequential sweep lets a state cascade through
    multiple pairs per event (cold-chain jumps include multi-rung moves);
    accounting must stay within [0, 1] and attempts must count T-1 pairs."""
    dim = 2
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.asarray([1.0, 0.97, 0.94, 0.91])   # near-degenerate ladder
    res = run_pt(tgt, prop, key, betas, num_chains=64, num_iterations=2000,
                 burn_in=100, swap_every=10, swap_sweep="sequential")
    acc = float(res.swap_acceptance_rate.mean())
    assert 0.5 < acc <= 1.0  # dense ladder: nearly every pair swap accepts
    n_events = (2100 - 100) // 10
    assert int(res.state.swap_attempt_count) == n_events * 3


def test_sequential_sweep_in_harness(key):
    from rwm_pt_tpu.api import MCMCSimulation
    sim = MCMCSimulation(dim=3, sigma=1.0, num_iterations=3000,
                         algorithm="PT", target_dist="MultivariateNormal",
                         seed=2, burn_in=200, num_chains=32, swap_every=10,
                         swap_sweep="sequential", record_chain=False)
    sim.generate_samples(verbose=False)
    assert 0.0 < sim.swap_acceptance_rate() < 1.0
    with pytest.raises(ValueError, match="swap_sweep"):
        MCMCSimulation(dim=3, sigma=1.0, num_iterations=10, algorithm="PT",
                       target_dist="MultivariateNormal", swap_sweep="zigzag")


def test_flat_layout_bitwise_matches_tc(key):
    """The flat (d, T*C) fast layout must be bitwise-identical to the
    canonical (d, T, C) layout: same per-step keys, same draw shapes up to a
    row-major reshape, same arithmetic (kernels/pt.py run_pt docstring)."""
    dim = 4
    tgt = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.geomspace(1.0, 0.01, 6)
    for cpu_sem in (False, True):
        kw = dict(num_chains=32, num_iterations=500, burn_in=50,
                  swap_every=10, cpu_semantics=cpu_sem)
        flat = run_pt(tgt, prop, key, betas, layout="flat", **kw)
        tc = run_pt(tgt, prop, key, betas, layout="tc", **kw)
        np.testing.assert_array_equal(np.asarray(flat.state.x),
                                      np.asarray(tc.state.x))
        np.testing.assert_array_equal(np.asarray(flat.state.accept_count),
                                      np.asarray(tc.state.accept_count))
        np.testing.assert_array_equal(
            np.asarray(flat.state.swap_accept_count),
            np.asarray(tc.state.swap_accept_count))
        np.testing.assert_allclose(np.asarray(flat.cold_esjd),
                                   np.asarray(tc.cold_esjd), rtol=1e-6)
    # recorded traces agree too
    fr = run_pt(tgt, prop, key, betas, num_chains=32, num_iterations=200,
                burn_in=20, swap_every=10, record_every=10, record_chains=3,
                layout="flat")
    tr = run_pt(tgt, prop, key, betas, num_chains=32, num_iterations=200,
                burn_in=20, swap_every=10, record_every=10, record_chains=3,
                layout="tc")
    np.testing.assert_array_equal(np.asarray(fr.chain), np.asarray(tr.chain))
