"""Target library unit tests.

Mirrors the reference's test strategy for targets
(/root/reference/target_distributions/test_torch_distributions.py:22-95):
single & batch evaluation consistency, exp(log_density) == density, direct
samplers, plus analytic spot checks of the densities themselves.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.targets import (TARGET_NAMES, EvenRosenbrock, FullRosenbrock,
                                Hypercube, HybridRosenbrock, IIDBeta, IIDGamma,
                                MultivariateNormal, NealFunnel, RoughCarpet,
                                ScaledMultivariateNormal, SuperFunnel,
                                ThreeMixture, get_target_distribution)

DIM = 5


def make_all_targets(dim=DIM):
    out = {}
    for name in TARGET_NAMES:
        d = dim
        if name == "EvenRosenbrock":
            d = dim + (dim % 2)
        out[name] = get_target_distribution(name, d)
    return out


@pytest.mark.parametrize("name", TARGET_NAMES)
def test_single_vs_batch_consistency(name, key):
    tgt = make_all_targets()[name]
    x = jax.random.normal(key, (7, tgt.dim)) * 0.3 + 0.4
    batch_ld = tgt.log_density(x)
    assert batch_ld.shape == (7,)
    # f32 reduction order differs between batch shapes; keep a tolerance that
    # still catches real layout/transpose bugs.
    for i in range(3):
        single = tgt.log_density(x[i])
        assert single.shape == ()
        np.testing.assert_allclose(single, batch_ld[i], rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("name", TARGET_NAMES)
def test_density_is_exp_log_density(name, key):
    tgt = make_all_targets()[name]
    x = jax.random.uniform(key, (4, tgt.dim), minval=0.1, maxval=0.8)
    np.testing.assert_allclose(tgt.density(x), jnp.exp(tgt.log_density(x)),
                               rtol=1e-6)


@pytest.mark.parametrize("name", TARGET_NAMES)
def test_nd_batch_shapes(name, key):
    """Dim-leading kernels must handle arbitrary batch ranks (T, C)."""
    tgt = make_all_targets()[name]
    x = jax.random.uniform(key, (3, 4, tgt.dim), minval=0.2, maxval=0.7)
    ld = tgt.log_density(x)
    assert ld.shape == (3, 4)
    np.testing.assert_allclose(ld[1], tgt.log_density(x[1]), rtol=2e-5, atol=2e-5)


def test_mvn_analytic(key):
    tgt = MultivariateNormal.create(3)
    x = jnp.zeros(3)
    expected = -0.5 * 3 * math.log(2 * math.pi)
    np.testing.assert_allclose(tgt.log_density(x), expected, rtol=1e-6)
    # general covariance path agrees with scipy-style closed form
    cov = jnp.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.2], [0.0, 0.2, 1.5]])
    tgt2 = MultivariateNormal.create(3, cov=cov)
    pt = jnp.array([0.3, -0.2, 0.7])
    quad = pt @ jnp.linalg.inv(cov) @ pt
    expected2 = -0.5 * quad - 0.5 * (3 * math.log(2 * math.pi)
                                     + jnp.linalg.slogdet(cov)[1])
    np.testing.assert_allclose(tgt2.log_density(pt), expected2, rtol=1e-5)


def test_scaled_mvn_matches_formula(key):
    c = jnp.array([0.5, 1.5])
    tgt = ScaledMultivariateNormal.create(2, scaling_factors=c)
    x = jnp.array([1.0, -2.0])
    expected = (jnp.sum(jnp.log(c)) - math.log(2 * math.pi)
                - 0.5 * jnp.sum((c * x) ** 2))
    np.testing.assert_allclose(tgt.log_density(x), expected, rtol=1e-6)


def test_hypercube_bounds():
    tgt = Hypercube.create(3, left_boundary=-1.0, right_boundary=1.0)
    inside = jnp.zeros(3)
    outside = jnp.array([0.0, 0.0, 1.5])
    np.testing.assert_allclose(tgt.log_density(inside), -3 * math.log(2.0),
                               rtol=1e-6)
    assert tgt.log_density(outside) == -jnp.inf
    batch = jnp.stack([inside, outside])
    ld = tgt.log_density(batch)
    assert jnp.isfinite(ld[0]) and ld[1] == -jnp.inf


def test_iid_gamma_domain_and_value():
    tgt = IIDGamma.create(2, shape=2.0, scale=3.0)
    x = jnp.array([1.0, 2.0])
    # log Gamma(2,3) pdf = (a-1)log x - x/s - lgamma(a) - a log s
    expected = sum((2 - 1) * math.log(v) - v / 3.0
                   - math.lgamma(2.0) - 2.0 * math.log(3.0) for v in [1.0, 2.0])
    np.testing.assert_allclose(tgt.log_density(x), expected, rtol=1e-5)
    assert tgt.log_density(jnp.array([1.0, -0.1])) == -jnp.inf
    assert not jnp.isnan(tgt.log_density(jnp.array([1.0, -0.1])))


def test_iid_beta_domain_and_value():
    tgt = IIDBeta.create(1, alpha=2.0, beta=3.0)
    x = jnp.array([0.3])
    from scipy.stats import beta as sp_beta
    np.testing.assert_allclose(tgt.log_density(x), sp_beta.logpdf(0.3, 2, 3),
                               rtol=1e-5)
    assert tgt.log_density(jnp.array([1.2])) == -jnp.inf


def test_rosenbrock_values():
    full = FullRosenbrock.create(3)
    x = jnp.array([1.0, 1.0, 1.0])
    # at (1,1,1): b(1-1)^2 + a(1-1)^2 terms vanish except b(1-1^2)=0 -> 0
    np.testing.assert_allclose(full.log_density(x), 0.0, atol=1e-6)
    x2 = jnp.array([0.0, 0.0, 0.0])
    expected = -(2 * (1 / 20))  # two a-terms (x_i - 1)^2 = 1
    np.testing.assert_allclose(full.log_density(x2), expected, rtol=1e-5)

    even = EvenRosenbrock.create(4)
    np.testing.assert_allclose(even.log_density(jnp.array([1.0, 1.0, 1.0, 1.0])),
                               0.0, atol=1e-6)

    hyb = HybridRosenbrock.create(n1=3, n2=2)
    assert hyb.dim == 5
    np.testing.assert_allclose(hyb.log_density(jnp.ones(5)), 0.0, atol=1e-6)


def test_neal_funnel_analytic():
    tgt = NealFunnel.create(3)
    x = jnp.array([0.0, 0.0, 0.0])
    expected = (-0.5 * math.log(2 * math.pi) - 0.5 * math.log(9.0)
                - 2 * 0.5 * math.log(2 * math.pi))
    np.testing.assert_allclose(tgt.log_density(x), expected, rtol=1e-5)


def test_super_funnel_valid_mask(key):
    tgt = SuperFunnel.create_synthetic(J=3, K=2, n_per_group=10)
    assert tgt.dim == 3 + 6 + 1 + 2 + 1 + 1
    theta = 0.1 * jax.random.normal(key, (tgt.dim,))
    theta = theta.at[-2:].set(jnp.array([0.5, 0.5]))  # valid taus
    assert jnp.isfinite(tgt.log_density(theta))
    bad = theta.at[-1].set(-1.0)
    assert tgt.log_density(bad) == -jnp.inf


@pytest.mark.parametrize("name", ["MultivariateNormal", "MultivariateNormalScaled",
                                  "ThreeMixture", "RoughCarpet", "IIDGamma",
                                  "IIDBeta", "EvenRosenbrock", "HybridRosenbrock",
                                  "Hypercube"])
def test_direct_samplers_moments(name, key):
    """Direct samplers produce samples with plausible first moments; used for
    iterative ladder construction (reference pt_rwm_gpu_optimized.py:259-281)."""
    tgt = make_all_targets(dim=4)[name]
    s = tgt.direct_sample(key, 20000)
    assert s.shape == (20000, tgt.dim)
    assert bool(jnp.all(jnp.isfinite(s)))
    # samples should be in-support: finite log densities
    ld = tgt.log_density(s)
    assert bool(jnp.all(jnp.isfinite(ld)))
    if name == "MultivariateNormal":
        np.testing.assert_allclose(jnp.mean(s, 0), jnp.zeros(4), atol=0.05)
        np.testing.assert_allclose(jnp.std(s, 0), jnp.ones(4), atol=0.05)
    if name == "IIDGamma":  # mean = shape * scale = 6
        np.testing.assert_allclose(jnp.mean(s), 6.0, rtol=0.05)
    if name == "IIDBeta":   # mean = a/(a+b) = 0.4
        np.testing.assert_allclose(jnp.mean(s), 0.4, rtol=0.05)


def test_direct_sampler_beta_scaling(key):
    """Tempered samples at small beta are more spread out (reference
    multivariate_normal_torch.py:101-121)."""
    tgt = MultivariateNormal.create(3)
    hot = tgt.direct_sample(key, 5000, beta=0.1)
    cold = tgt.direct_sample(key, 5000, beta=1.0)
    assert float(jnp.std(hot)) > 2.0 * float(jnp.std(cold))


# NealFunnel gained an exact tempered sampler in round 3 (targets/funnel.py
# direct_sample), so only these two remain samplerless like the reference
@pytest.mark.parametrize("name", ["FullRosenbrock", "SuperFunnel"])
def test_samplerless_targets_raise(name):
    tgt = make_all_targets()[name]
    with pytest.raises(NotImplementedError):
        tgt.direct_sample(jax.random.key(0), 10)


def test_init_heuristics(key):
    """Initial-state heuristics mirror metropolis.py:22-64."""
    beta = IIDBeta.create(4)
    s = beta.init_sample(key, 100)
    assert bool(jnp.all((s >= 0.2) & (s <= 0.8)))
    gamma = IIDGamma.create(4)
    s = gamma.init_sample(key, 100)
    assert bool(jnp.all(jnp.abs(s - 5.0) < 1.0))
    mix = ThreeMixture.create(4)
    assert bool(jnp.all(mix.init_sample(key, 10) == 0.0))
    mvn = MultivariateNormal.create(4)
    assert float(jnp.max(jnp.abs(mvn.init_sample(key, 10)))) < 1e-6


def test_targets_are_jittable_pytrees(key):
    """Targets must trace cleanly through jit as closed-over pytrees."""
    tgt = ThreeMixture.create(6, scaling=True)

    @jax.jit
    def f(t, x):
        return t.log_density_td(x)

    x = jax.random.normal(key, (6, 32))
    np.testing.assert_allclose(f(tgt, x), tgt.log_density_td(x), rtol=1e-6)


def test_registry_variant_constants():
    """Each reference factory's multimodal constants must be reproduced
    exactly (registry docstring; experiment_RWM_GPU.py:36-55 vs
    experiment_pt_GPU.py:34-65 vs single_run_experiment.py:30-33)."""
    import numpy as np
    from rwm_pt_tpu.targets import get_target_distribution

    rc = {v: get_target_distribution("RoughCarpet", 4, variant=v)
          for v in ("rwm_gpu", "pt_gpu", "cpu", "class")}
    np.testing.assert_allclose(rc["rwm_gpu"].modes, [-4.0, 0.0, 4.0])
    np.testing.assert_allclose(rc["pt_gpu"].modes, [-15.0, 0.0, 15.0])
    np.testing.assert_allclose(rc["cpu"].modes, [-15.0, 0.0, 15.0])
    np.testing.assert_allclose(rc["class"].modes, [-5.0, 0.0, 5.0])

    tm = {v: get_target_distribution("ThreeMixture", 4, variant=v)
          for v in ("rwm_gpu", "pt_gpu")}
    assert float(tm["rwm_gpu"].means[0][0]) == -5.0
    assert float(tm["pt_gpu"].means[0][0]) == -15.0
    # weights are variant-independent
    np.testing.assert_allclose(rc["pt_gpu"].weights, [0.5, 0.3, 0.2])
    np.testing.assert_allclose(np.asarray(tm["pt_gpu"].weights),
                               [1 / 3] * 3, rtol=1e-6)

    # explicit kwargs always override the variant default
    custom = get_target_distribution("RoughCarpet", 4, variant="pt_gpu",
                                     mode_centers=[-1.0, 0.0, 1.0])
    np.testing.assert_allclose(custom.modes, [-1.0, 0.0, 1.0])

    import pytest
    with pytest.raises(ValueError):
        get_target_distribution("RoughCarpet", 4, variant="nope")


def test_explicit_scaling_factors_covariance_identity(key):
    """Explicit ``scaling_factors`` must reproduce the CPU classes'
    covariance-scaled mixture exactly: N(x | mu, diag(v)) =
    prod(c) N(c*x | c*mu, I) with c = 1/sqrt(v)  (reference
    multimodal.py:26-29 scales covs; scripts/parity_batch.py relies on
    this mapping for the ThreeMixtureScaled CPU campaign)."""
    from rwm_pt_tpu.targets import ThreeMixture, RoughCarpet
    dim = 5
    rng = np.random.default_rng(3)
    v = rng.uniform(0.1, 2.0, dim)            # per-coordinate variances
    c = 1.0 / np.sqrt(v)
    off = 15.0
    mu = np.array([[-off] + [0.0] * (dim - 1), [0.0] * dim,
                   [off] + [0.0] * (dim - 1)])
    tgt = ThreeMixture.create(dim, scaling=True, scaling_factors=c,
                              mode_centers=(mu * c).tolist(),
                              mode_weights=[1 / 3] * 3)
    x = np.asarray(jax.random.normal(key, (7, dim))) * 3.0
    # direct covariance-scaled log-density
    comp = (-0.5 * ((x[:, None, :] - mu[None]) ** 2 / v).sum(-1)
            - 0.5 * (np.log(2 * np.pi * v)).sum())
    expected = np.log(np.exp(comp).mean(-1))
    np.testing.assert_allclose(np.asarray(tgt.log_density(jnp.asarray(x))),
                               expected, rtol=1e-5)

    # RoughCarpet: explicit factors are honored verbatim
    s = rng.uniform(0.5, 1.5, dim)
    rc = RoughCarpet.create(dim, scaling=True, scaling_factors=s)
    y = x[0]
    modes = np.array([-5.0, 0.0, 5.0])
    w = np.array([0.5, 0.3, 0.2])
    comp1d = (w[None, :] * np.exp(-0.5 * ((y * s)[:, None] - modes) ** 2)
              / np.sqrt(2 * np.pi)).sum(-1)
    expected_rc = np.log(comp1d).sum() + np.log(s).sum()
    np.testing.assert_allclose(float(rc.log_density(jnp.asarray(y))),
                               expected_rc, rtol=1e-5)

    with pytest.raises(ValueError):
        ThreeMixture.create(dim, scaling=True, scaling_factors=s[:-1])
