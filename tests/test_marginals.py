"""Exact 1-D marginal densities for the histogram overlay.

The reference's ``samples_histogram`` overlays a *conditional slice* — the
joint density with all other coordinates pinned to 0
(/root/reference/interfaces/simulation_gpu.py:345-378) — which is the wrong
curve for correlated or non-product targets.  Here targets with tractable
marginals implement ``marginal_density`` (targets/base.py) and the harness
falls back to a labeled slice otherwise.  These tests pin each marginal by
normalization and moment checks.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.targets import get_target_distribution
from rwm_pt_tpu.targets.funnel import NealFunnel
from rwm_pt_tpu.targets.gaussian import MultivariateNormal


def _moments(xs, pdf):
    """Numerically integrate mass, mean, and variance of a 1-D density."""
    pdf = np.asarray(pdf, np.float64)
    mass = np.trapezoid(pdf, xs)
    mean = np.trapezoid(xs * pdf, xs) / mass
    var = np.trapezoid((xs - mean) ** 2 * pdf, xs) / mass
    return mass, mean, var


def test_mvn_full_cov_marginal_is_not_the_slice():
    """Correlated MVN: the marginal is N(mean_i, Sigma_ii), which differs
    from the conditional slice by the Schur-complement variance."""
    cov = np.array([[2.0, 1.2], [1.2, 1.0]])
    tgt = MultivariateNormal.create(2, mean=[0.5, -0.5], cov=cov)
    xs = np.linspace(-10, 10, 4001)
    pdf = np.asarray(tgt.marginal_density(0, jnp.asarray(xs)))
    mass, mean, var = _moments(xs, pdf)
    assert abs(mass - 1.0) < 1e-6
    assert abs(mean - 0.5) < 1e-6
    assert abs(var - 2.0) < 1e-5
    # conditional slice (x1=0) has variance Sigma00 - Sigma01^2/Sigma11 < 2,
    # so a correct marginal must NOT match the renormalized slice
    pts = np.zeros((4001, 2), np.float32)
    pts[:, 0] = xs
    slice_pdf = np.asarray(tgt.density(jnp.asarray(pts)))
    _, _, var_slice = _moments(xs, slice_pdf)
    assert var_slice < 1.0  # Schur complement 2 - 1.44 = 0.56
    assert abs(var - var_slice) > 0.5


@pytest.mark.parametrize("name,dim", [
    ("MultivariateNormal", 3),
    ("MultivariateNormalScaled", 3),
    ("IIDGamma", 3),
    ("IIDBeta", 3),
    ("Hypercube", 3),
    ("RoughCarpetScaled", 3),
    ("ThreeMixtureScaled", 3),
])
def test_marginals_normalize_and_match_sampler(name, dim):
    """Every tractable marginal integrates to 1 along every axis, and its
    mean/variance match the target's own direct sampler."""
    import jax
    tgt = get_target_distribution(name, dim)
    draws = np.asarray(tgt.direct_sample(jax.random.key(0), 200_000))
    for axis in range(dim):
        d = draws[:, axis]
        # adaptive grid: scaled variants can have per-axis stds up to 1/0.02
        lo, hi = float(d.min()) - 10, float(d.max()) + 10
        xs = np.linspace(lo, hi, 40_001)
        pdf = np.asarray(tgt.marginal_density(axis, jnp.asarray(xs)),
                         np.float64)
        mass, mean, var = _moments(xs, pdf)
        # trapezoid across a density jump (Hypercube) costs ~grid-step mass
        assert abs(mass - 1.0) < 2e-2, (name, axis, mass)
        s_mean, s_var = d.mean(), d.var()
        se = np.sqrt(s_var / len(d))
        assert abs(mean - s_mean) < max(6 * se, 2e-2), (name, axis)
        assert abs(var - s_var) < max(0.05 * s_var, 2e-2), (name, axis)


def test_three_mixture_marginal_modes():
    """ThreeMixture's first-axis marginal has mass at every mode center;
    other axes are a plain N(0,1) mixture collapsed to one component."""
    tgt = get_target_distribution("ThreeMixture", 4, variant="pt_gpu")
    xs = np.linspace(-25, 25, 10001)
    pdf0 = np.asarray(tgt.marginal_density(0, jnp.asarray(xs)))
    mass, mean, var = _moments(xs, pdf0)
    assert abs(mass - 1.0) < 1e-6
    assert abs(mean) < 1e-6            # symmetric +-15 modes
    # var = within-mode 1 + between-mode (2/3)*15^2 = 151
    assert abs(var - 151.0) < 0.1
    pdf1 = np.asarray(tgt.marginal_density(1, jnp.asarray(xs)))
    _, _, var1 = _moments(xs, pdf1)
    assert abs(var1 - 1.0) < 1e-3


def test_neal_funnel_marginals():
    """v's marginal is exactly N(0, 9); a z coordinate's Gauss-Hermite
    marginal integrates to 1 with Var(z) = E[e^v] = e^{9/2}."""
    tgt = NealFunnel.create(5)
    xs_v = np.linspace(-15, 15, 4001)
    pdf_v = np.asarray(tgt.marginal_density(0, jnp.asarray(xs_v)), np.float64)
    mass, mean, var = _moments(xs_v, pdf_v)
    assert abs(mass - 1.0) < 1e-6
    assert abs(var - 9.0) < 1e-3

    # heavy-tailed z marginal: wide grid (tail mass beyond +-2000 is ~1e-6)
    xs_z = np.linspace(-2000, 2000, 200001)
    pdf_z = np.asarray(tgt.marginal_density(2, jnp.asarray(xs_z)), np.float64)
    mass, mean, var = _moments(xs_z, pdf_z)
    assert abs(mass - 1.0) < 5e-3
    assert abs(mean) < 1e-6
    assert abs(var - np.exp(4.5)) < 0.05 * np.exp(4.5)


def test_intractable_targets_return_none():
    for name in ("FullRosenbrock", "EvenRosenbrock", "HybridRosenbrock",
                 "SuperFunnel"):
        tgt = get_target_distribution(name, 6)
        assert tgt.marginal_density(0, jnp.linspace(-1, 1, 5)) is None


def test_histogram_overlay_uses_marginal(tmp_path):
    """samples_histogram overlays the true marginal when available and the
    labeled conditional slice otherwise (both must render without error)."""
    from rwm_pt_tpu.api import MCMCSimulation
    for target, tractable in (("MultivariateNormal", True),
                              ("FullRosenbrock", False)):
        sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=500,
                             algorithm="RWM", target_dist=target,
                             seed=0, num_chains=2, record_chain=True)
        sim.generate_samples(verbose=False)
        out = sim.samples_histogram(output_dir=str(tmp_path))
        import os
        assert os.path.exists(out + ".png") or os.path.exists(out)
