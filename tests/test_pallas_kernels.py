"""Pallas kernel tests.

The hardware PRNG (`pltpu.prng_random_bits`) returns zeros under the CPU
interpreter in this jaxlib, so statistical checks only run on real TPU
hardware (see scripts/bench_pallas*.py, exercised by the driver's bench).
On CPU we still validate the host-side plumbing: block capping and layout
handling.
"""
import jax
import pytest

ON_TPU = jax.default_backend() == "tpu"


def test_block_capping_logic():
    """VMEM-driven block caps stay multiples of 128 and divide num_chains."""
    import numpy as np
    for dim in (2, 30, 100):
        cap = max(128, int(14e6 / (44 * dim)) // 128 * 128)
        assert cap % 128 == 0 or cap == 128
        for C in (256, 4096, 65536):
            block = min(8192, cap)
            if C % block:
                block = int(np.gcd(C, block)) or C
            assert C % block == 0


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a real TPU")
def test_pallas_rwm_matches_scan_statistics(key):
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_rwm, run_rwm_pallas
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import MultivariateNormal
    tgt = MultivariateNormal.create(10)
    var = 2.38 ** 2 / 10
    res = run_rwm_pallas(tgt, key, base_variance=var, num_chains=2048,
                         num_iterations=2000, burn_in=200)
    ref = run_rwm(tgt, NormalProposal.create(10, var), key, num_chains=2048,
                  num_iterations=2000, burn_in=200)
    assert abs(float(res.acceptance_rate.mean())
               - float(ref.acceptance_rate.mean())) < 0.02
    assert abs(float(res.esjd.mean()) - float(ref.esjd.mean())) < 0.1


def test_unsupported_proposal_raises():
    from rwm_pt_tpu.kernels.pallas_rwm import _proposal_kind

    class Fake:
        name = "Cauchy"

    with pytest.raises(ValueError, match="unsupported proposal"):
        _proposal_kind(Fake())


@pytest.mark.skipif(ON_TPU, reason="interpreter is for CPU runs; the real "
                    "kernels are covered by the TPU tests below")
def test_interpret_smoke_all_proposals(key):
    """CPU plumbing check: every proposal kind builds, compiles and runs under
    the TPU-semantics interpreter (PRNG statistics are TPU-only)."""
    from rwm_pt_tpu.kernels import run_rwm_pallas
    from rwm_pt_tpu.proposals import (LaplaceProposal, NormalProposal,
                                      UniformRadiusProposal)
    from rwm_pt_tpu.targets import MultivariateNormal
    tgt = MultivariateNormal.create(4)
    for prop in (NormalProposal.create(4, 0.5),
                 LaplaceProposal.create(4, [0.5, 0.4, 0.3, 0.2]),
                 UniformRadiusProposal.create(4, 1.2)):
        res = run_rwm_pallas(tgt, key, proposal=prop, num_chains=256,
                             num_iterations=3, burn_in=1, interpret=True)
        assert res.state.x.shape == (4, 256)
        assert res.acceptance_rate.shape == (256,)


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a real TPU")
@pytest.mark.parametrize("prop_cfg", [
    ("Laplace", {"base_variance_vector": [0.6] * 10}),
    ("UniformRadius", {"base_radius": 1.2}),
])
def test_pallas_rwm_nonnormal_matches_scan(key, prop_cfg):
    """Laplace / UniformRadius Pallas paths agree with the scan engine —
    the reference's other two TorchScript proposal kernels
    (laplace.py:46-69, uniform.py:47-73)."""
    from rwm_pt_tpu.kernels import run_rwm, run_rwm_pallas
    from rwm_pt_tpu.proposals import create_proposal_distribution
    from rwm_pt_tpu.targets import MultivariateNormal
    name, params = prop_cfg
    tgt = MultivariateNormal.create(10)
    prop = create_proposal_distribution(10, {"name": name, "params": params})
    res = run_rwm_pallas(tgt, key, proposal=prop, num_chains=2048,
                         num_iterations=2000, burn_in=200)
    ref = run_rwm(tgt, prop, key, num_chains=2048, num_iterations=2000,
                  burn_in=200)
    assert abs(float(res.acceptance_rate.mean())
               - float(ref.acceptance_rate.mean())) < 0.02
    assert abs(float(res.esjd.mean()) - float(ref.esjd.mean())) < 0.1


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a real TPU")
def test_pallas_pt_laplace_matches_scan(key):
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_pt, run_pt_pallas
    from rwm_pt_tpu.proposals import LaplaceProposal
    from rwm_pt_tpu.targets import MultivariateNormal
    tgt = MultivariateNormal.create(10)
    prop = LaplaceProposal.create(10, 2.38 ** 2 / 10)
    betas = jnp.geomspace(1.0, 0.01, 8).astype(jnp.float32)
    res = run_pt_pallas(tgt, key, betas, proposal=prop, num_chains=2048,
                        num_iterations=2000, burn_in=200, swap_every=10)
    ref = run_pt(tgt, prop, key, betas, num_chains=2048, num_iterations=2000,
                 burn_in=200, swap_every=10)
    assert abs(float(res.swap_acceptance_rate.mean())
               - float(ref.swap_acceptance_rate.mean())) < 0.03
    assert abs(float(res.cold_esjd.mean()) - float(ref.cold_esjd.mean())) \
        < 0.15 * float(ref.cold_esjd.mean()) + 0.01


@pytest.mark.skipif(not ON_TPU, reason="hardware PRNG requires a real TPU")
def test_pallas_pt_matches_scan_statistics(key):
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_pt, run_pt_pallas
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import FullRosenbrock
    tgt = FullRosenbrock.create(30)
    var = 0.5 ** 2 / 30
    betas = jnp.geomspace(1.0, 0.01, 10).astype(jnp.float32)
    res = run_pt_pallas(tgt, key, betas, base_variance=var, num_chains=2048,
                        num_iterations=2000, burn_in=200, swap_every=10)
    ref = run_pt(tgt, NormalProposal.create(30, var), key, betas,
                 num_chains=2048, num_iterations=2000, burn_in=200,
                 swap_every=10)
    assert abs(float(res.swap_acceptance_rate.mean())
               - float(ref.swap_acceptance_rate.mean())) < 0.03
    assert abs(float(res.pt_esjd.mean()) - float(ref.pt_esjd.mean())) < 0.002
    assert abs(float(res.cold_esjd.mean())
               - float(ref.cold_esjd.mean())) < 0.15 * float(ref.cold_esjd.mean()) + 0.01


@pytest.mark.skipif(not ON_TPU, reason="Mosaic compilation requires real TPU")
def test_pallas_compiles_for_all_targets(key):
    """Every registry target must lower through Mosaic: regression net for
    layout-hostile patterns in log_density_td (RoughCarpet's (1,3)->(3,1,1)
    mode-axis reshape, EvenRosenbrock's strided x[0::2] gathers, and
    SuperFunnel's (J,K,B) relayout + einsum all failed/hung Mosaic until
    reformulated as contiguous-slice + elementwise math)."""
    from rwm_pt_tpu.kernels import run_rwm_pallas
    from rwm_pt_tpu.targets import get_target_distribution
    from rwm_pt_tpu.targets.registry import TARGET_NAMES

    for name in TARGET_NAMES:
        tgt = get_target_distribution(name, 10)
        res = run_rwm_pallas(tgt, key, base_variance=0.5, num_chains=256,
                             num_iterations=100, burn_in=20)
        acc = float(res.acceptance_rate.mean())
        assert 0.0 <= acc <= 1.0, (name, acc)
