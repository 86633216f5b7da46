"""Centralized target registry.

The reference duplicates a ``get_target_distribution(name, dim, ...)``
switchboard across three experiment scripts
(/root/reference/experiment_RWM_GPU.py:21-163, experiment_pt_GPU.py:21-163,
single_run_experiment.py:20-111).  This module is the single TPU-native
replacement; names and factory defaults match the reference CLIs.

IMPORTANT — the reference's factories disagree on the multimodal constants,
and the committed data files inherit whichever factory produced them:

* ``experiment_RWM_GPU.py:36-55`` (torch factory): RoughCarpet modes
  ``(-4, 0, 4)``; ThreeMixture centers ``(+-5)*e1``.  -> all ``*_RWM_GPU_*``
  data files.
* ``experiment_pt_GPU.py:34-65`` (torch factory): RoughCarpet modes
  ``(-15, 0, 15)``; ThreeMixture centers ``(+-15)*e1``.  -> all ``*_PT_GPU_*``
  data files.
* the numpy classes used by the CPU scripts
  (``target_distributions/multimodal.py:19-20,74-75``) also use +-15.
* ``single_run_experiment.py:30-33`` builds the torch classes with their
  own defaults: RoughCarpet ``(-5, 0, 5)``, ThreeMixture ``(+-5)*e1``
  (``multimodal_torch.py:359-364``).

``variant`` selects the constant set: ``"rwm_gpu"`` (default, backward
compatible), ``"pt_gpu"``, ``"cpu"`` (same constants as ``"pt_gpu"``), or
``"class"`` (the torch class defaults).  Explicit
``mode_centers``/``mode_weights`` kwargs always win.
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


_VARIANTS = ("rwm_gpu", "pt_gpu", "cpu", "class")
# RoughCarpet mode centers per reference factory (see module docstring)
_RC_CENTERS = {"rwm_gpu": [-4.0, 0.0, 4.0], "pt_gpu": [-15.0, 0.0, 15.0],
               "cpu": [-15.0, 0.0, 15.0], "class": [-5.0, 0.0, 5.0]}
# ThreeMixture first-coordinate mode offset per reference factory
_TM_OFFSET = {"rwm_gpu": 5.0, "pt_gpu": 15.0, "cpu": 15.0, "class": 5.0}


def get_target_distribution(name: str, dim: int, variant: str = "rwm_gpu",
                            **kwargs):
    """Build a target by CLI name with the reference's factory defaults.

    ``variant``: which reference factory's multimodal constants to use (see
    module docstring) — only RoughCarpet/ThreeMixture differ across variants.
    """
    if variant not in _VARIANTS:
        raise ValueError(f"Unknown variant {variant!r}; expected one of "
                         f"{_VARIANTS}")
    if name == "MultivariateNormal":
        return MultivariateNormal.create(dim, mean=kwargs.get("mean"),
                                         cov=kwargs.get("cov"))
    if name == "MultivariateNormalScaled":
        return ScaledMultivariateNormal.create(
            dim, scaling_factors=kwargs.get("scaling_factors"),
            seed=kwargs.get("seed", 0))
    if name in ("RoughCarpet", "RoughCarpetScaled"):
        return RoughCarpet.create(
            dim, scaling=name.endswith("Scaled"),
            mode_centers=kwargs.get("mode_centers", _RC_CENTERS[variant]),
            mode_weights=kwargs.get("mode_weights", [0.5, 0.3, 0.2]),
            seed=kwargs.get("seed", 0),
            scaling_factors=kwargs.get("scaling_factors"))
    if name in ("ThreeMixture", "ThreeMixtureScaled"):
        off = _TM_OFFSET[variant]
        default_centers = [[-off] + [0.0] * (dim - 1),
                           [0.0] * dim,
                           [off] + [0.0] * (dim - 1)]
        return ThreeMixture.create(
            dim, scaling=name.endswith("Scaled"),
            mode_centers=kwargs.get("mode_centers", default_centers),
            mode_weights=kwargs.get("mode_weights", [1 / 3, 1 / 3, 1 / 3]),
            seed=kwargs.get("seed", 0),
            scaling_factors=kwargs.get("scaling_factors"))
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
