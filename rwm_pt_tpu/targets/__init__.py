"""Target distribution library (TPU-native re-implementation of
``/root/reference/target_distributions/``)."""
from .base import TargetMixin
from .funnel import NealFunnel, SuperFunnel
from .gaussian import MultivariateNormal, ScaledMultivariateNormal
from .hypercube import Hypercube
from .iid import IIDBeta, IIDGamma
from .multimodal import RoughCarpet, ThreeMixture
from .registry import (TARGET_NAMES, calculate_hybrid_rosenbrock_dim,
                       calculate_super_funnel_dim, get_target_distribution)
from .rosenbrock import EvenRosenbrock, FullRosenbrock, HybridRosenbrock

__all__ = [
    "TargetMixin", "MultivariateNormal", "ScaledMultivariateNormal",
    "ThreeMixture", "RoughCarpet", "Hypercube", "IIDGamma", "IIDBeta",
    "FullRosenbrock", "EvenRosenbrock", "HybridRosenbrock",
    "NealFunnel", "SuperFunnel",
    "TARGET_NAMES", "get_target_distribution",
    "calculate_hybrid_rosenbrock_dim", "calculate_super_funnel_dim",
]
