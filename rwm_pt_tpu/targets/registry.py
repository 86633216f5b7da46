"""Centralized target registry.

The reference duplicates a ``get_target_distribution(name, dim, ...)``
switchboard across three experiment scripts
(/root/reference/experiment_RWM_GPU.py:21-163, experiment_pt_GPU.py:21-163,
single_run_experiment.py:20-111).  This module is the single TPU-native
replacement; names and factory defaults match the reference CLIs.
"""
from __future__ import annotations

from .funnel import NealFunnel, SuperFunnel
from .gaussian import MultivariateNormal, ScaledMultivariateNormal
from .hypercube import Hypercube
from .iid import IIDBeta, IIDGamma
from .multimodal import RoughCarpet, ThreeMixture
from .rosenbrock import EvenRosenbrock, FullRosenbrock, HybridRosenbrock

TARGET_NAMES = (
    "MultivariateNormal", "MultivariateNormalScaled",
    "RoughCarpet", "RoughCarpetScaled",
    "ThreeMixture", "ThreeMixtureScaled",
    "Hypercube", "IIDGamma", "IIDBeta",
    "FullRosenbrock", "EvenRosenbrock", "HybridRosenbrock",
    "NealFunnel", "SuperFunnel",
)


def calculate_hybrid_rosenbrock_dim(n1: int, n2: int) -> int:
    """dim = 1 + n2 (n1 - 1)  (reference experiment_RWM_GPU.py:13-15)."""
    return 1 + n2 * (n1 - 1)


def calculate_super_funnel_dim(J: int, K: int) -> int:
    """dim = J + J*K + 1 + K + 1 + 1  (reference experiment_RWM_GPU.py:17-19)."""
    return J + J * K + 1 + K + 1 + 1


def get_target_distribution(name: str, dim: int, **kwargs):
    """Build a target by CLI name with the reference's factory defaults."""
    if name == "MultivariateNormal":
        return MultivariateNormal.create(dim, mean=kwargs.get("mean"),
                                         cov=kwargs.get("cov"))
    if name == "MultivariateNormalScaled":
        return ScaledMultivariateNormal.create(
            dim, scaling_factors=kwargs.get("scaling_factors"),
            seed=kwargs.get("seed", 0))
    if name in ("RoughCarpet", "RoughCarpetScaled"):
        # factory default centers (-4, 0, 4) (experiment_RWM_GPU.py:36-45)
        return RoughCarpet.create(
            dim, scaling=name.endswith("Scaled"),
            mode_centers=kwargs.get("mode_centers", [-4.0, 0.0, 4.0]),
            mode_weights=kwargs.get("mode_weights", [0.5, 0.3, 0.2]),
            seed=kwargs.get("seed", 0))
    if name in ("ThreeMixture", "ThreeMixtureScaled"):
        default_centers = [[-5.0] + [0.0] * (dim - 1),
                           [0.0] * dim,
                           [5.0] + [0.0] * (dim - 1)]
        return ThreeMixture.create(
            dim, scaling=name.endswith("Scaled"),
            mode_centers=kwargs.get("mode_centers", default_centers),
            mode_weights=kwargs.get("mode_weights", [1 / 3, 1 / 3, 1 / 3]),
            seed=kwargs.get("seed", 0))
    if name == "Hypercube":
        # factory default bounds (-1, 1) (experiment_RWM_GPU.py:66-67)
        return Hypercube.create(dim,
                                left_boundary=kwargs.get("left_boundary", -1.0),
                                right_boundary=kwargs.get("right_boundary", 1.0))
    if name == "IIDGamma":
        return IIDGamma.create(dim, shape=kwargs.get("shape", 2.0),
                               scale=kwargs.get("scale", 3.0))
    if name == "IIDBeta":
        return IIDBeta.create(dim, alpha=kwargs.get("alpha", 2.0),
                              beta=kwargs.get("beta", 3.0))
    if name == "FullRosenbrock":
        return FullRosenbrock.create(dim, a_coeff=kwargs.get("a_coeff", 1 / 20),
                                     b_coeff=kwargs.get("b_coeff", 100 / 20),
                                     mu=kwargs.get("mu", 1.0))
    if name == "EvenRosenbrock":
        return EvenRosenbrock.create(dim, a_coeff=kwargs.get("a_coeff", 1 / 20),
                                     b_coeff=kwargs.get("b_coeff", 100 / 20),
                                     mu=kwargs.get("mu", 1.0))
    if name == "HybridRosenbrock":
        return HybridRosenbrock.create(n1=kwargs.get("n1", 3),
                                       n2=kwargs.get("n2", 5),
                                       a_coeff=kwargs.get("a_coeff", 1 / 20),
                                       b_coeff=kwargs.get("b_coeff", 100 / 20),
                                       mu=kwargs.get("mu", 1.0))
    if name == "NealFunnel":
        return NealFunnel.create(dim, mu_v=kwargs.get("mu_v", 0.0),
                                 sigma_v_sq=kwargs.get("sigma_v_sq", 9.0),
                                 mu_z=kwargs.get("mu_z", 0.0))
    if name == "SuperFunnel":
        return SuperFunnel.create_synthetic(
            J=kwargs.get("J", 5), K=kwargs.get("K", 3),
            n_per_group=kwargs.get("n_per_group", 20),
            prior_hypermean_std=kwargs.get("prior_hypermean_std", 10.0),
            prior_tau_scale=kwargs.get("prior_tau_scale", 2.5))
    raise ValueError(f"Unknown target distribution name: {name!r}. "
                     f"Known names: {TARGET_NAMES}")
