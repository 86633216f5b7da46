"""Proposal distribution unit tests.

Mirrors the reference's proposal test strategy
(/root/reference/tests/test_proposals.py:53-216, 414-458): construction and
parameter validation, sample-moment checks per proposal family, and
beta-scaling monotonicity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.proposals import (LaplaceProposal, NormalProposal,
                                  UniformRadiusProposal,
                                  create_proposal_distribution)

DIM = 6
N = 60000


def test_construction_validation():
    with pytest.raises(ValueError):
        NormalProposal.create(DIM, -1.0)
    with pytest.raises(ValueError):
        LaplaceProposal.create(DIM, jnp.array([0.1, -0.2] + [0.1] * (DIM - 2)))
    with pytest.raises(ValueError):
        LaplaceProposal.create(DIM, jnp.ones(DIM + 1))
    with pytest.raises(ValueError):
        UniformRadiusProposal.create(DIM, 0.0)
    with pytest.raises(ValueError):
        create_proposal_distribution(DIM, {"name": "Normal", "params": {}})
    with pytest.raises(ValueError):
        create_proposal_distribution(DIM, {"name": "Bogus", "params": {}})


def test_factory_matches_reference_config_dicts():
    """Config-dict factory parity (simulation_gpu.py:42-45, 380-438)."""
    p = create_proposal_distribution(DIM, {"name": "Normal",
                                           "params": {"base_variance_scalar": 0.3}})
    assert isinstance(p, NormalProposal) and p.get_name() == "Normal"
    p = create_proposal_distribution(DIM, {"name": "Laplace",
                                           "params": {"base_variance_vector": 0.2}})
    assert isinstance(p, LaplaceProposal)
    np.testing.assert_allclose(p.base_variance_vector, jnp.full(DIM, 0.2))
    p = create_proposal_distribution(DIM, {"name": "UniformRadius",
                                           "params": {"base_radius": 1.5}})
    assert isinstance(p, UniformRadiusProposal)


def test_normal_moments(key):
    var = 0.7
    p = NormalProposal.create(DIM, var)
    s = p.sample(key, N)
    assert s.shape == (N, DIM)
    np.testing.assert_allclose(jnp.mean(s, 0), jnp.zeros(DIM), atol=0.02)
    np.testing.assert_allclose(jnp.var(s, 0), jnp.full(DIM, var), rtol=0.05)


def test_normal_beta_scaling(key):
    """Effective variance = base/beta (normal.py:27)."""
    p = NormalProposal.create(DIM, 1.0)
    s = p.sample(key, N, beta=4.0)
    np.testing.assert_allclose(jnp.var(s, 0), jnp.full(DIM, 0.25), rtol=0.05)


def test_laplace_variance_vector(key):
    var_vec = jnp.array([0.1, 0.2, 0.4, 0.8, 1.0, 2.0])
    p = LaplaceProposal.create(DIM, var_vec)
    s = p.sample(key, N)
    # Laplace with scale b has variance 2 b^2 = var_vec (laplace.py:29-32)
    np.testing.assert_allclose(jnp.var(s, 0), var_vec, rtol=0.08)
    np.testing.assert_allclose(jnp.mean(s, 0), jnp.zeros(DIM), atol=0.03)


def test_laplace_beta_scaling(key):
    p = LaplaceProposal.create(DIM, jnp.ones(DIM))
    s = p.sample(key, N, beta=2.0)
    np.testing.assert_allclose(jnp.var(s, 0), jnp.full(DIM, 0.5), rtol=0.08)


def test_uniform_ball_radius_constraint(key):
    R = 1.7
    p = UniformRadiusProposal.create(DIM, R)
    s = p.sample(key, N)
    norms = jnp.linalg.norm(s, axis=1)
    assert float(jnp.max(norms)) <= R + 1e-5
    # R * U^(1/d): E[r^2] = R^2 * d/(d+2)
    np.testing.assert_allclose(jnp.mean(norms ** 2), R * R * DIM / (DIM + 2),
                               rtol=0.05)


def test_uniform_beta_scaling(key):
    """Effective radius = base/sqrt(beta) (uniform.py:26-28)."""
    p = UniformRadiusProposal.create(DIM, 2.0)
    s = p.sample(key, N, beta=4.0)
    assert float(jnp.max(jnp.linalg.norm(s, axis=1))) <= 1.0 + 1e-5


@pytest.mark.parametrize("make", [
    lambda: NormalProposal.create(3, 0.5),
    lambda: LaplaceProposal.create(3, jnp.array([0.2, 0.4, 0.6])),
    lambda: UniformRadiusProposal.create(3, 1.0),
])
def test_per_temperature_batch_sampling(make, key):
    """sample_td draws a (d, T, C) block with per-rung beta scaling in one
    call — replaces the reference's per-chain Cholesky bmm
    (pt_rwm_gpu_optimized.py:86-99, 446-455)."""
    p = make()
    betas = jnp.array([1.0, 0.25])
    s = p.sample_td(key, betas, (2, 4096))
    assert s.shape == (3, 2, 4096)
    # hot rung (beta=0.25) must have 4x the variance (2x the radius)
    v_cold = jnp.var(s[:, 0], axis=(0, 1))
    v_hot = jnp.var(s[:, 1], axis=(0, 1))
    np.testing.assert_allclose(v_hot / v_cold, 4.0, rtol=0.15)


def test_beta_scaling_monotonicity(key):
    """Larger beta => smaller proposals, for every family
    (tests/test_proposals.py:414-458)."""
    for p in [NormalProposal.create(4, 1.0),
              LaplaceProposal.create(4, jnp.ones(4)),
              UniformRadiusProposal.create(4, 1.0)]:
        spreads = []
        for beta in [0.25, 1.0, 4.0]:
            s = p.sample(key, 20000, beta=beta)
            spreads.append(float(jnp.mean(jnp.sum(s * s, axis=1))))
        assert spreads[0] > spreads[1] > spreads[2]
