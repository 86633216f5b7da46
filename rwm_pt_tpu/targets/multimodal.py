"""Multimodal target families.

Re-implements (TPU-native, pure JAX):
  * ``ThreeMixtureDistributionTorch`` (/root/reference/target_distributions/multimodal_torch.py:4-334)
  * ``RoughCarpetDistributionTorch``  (/root/reference/target_distributions/multimodal_torch.py:337-576)

Both support the "scaled" variant: a Jacobian-corrected coordinate scaling
``y = x * s`` with ``s_j ~ U(0.02, 1.98)`` (reference :80-90, :380-383).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import TargetMixin, bdim
from ..utils.dtypes import default_float

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_SQRT_2PI = 0.5 * _LOG_2PI


def _mixture_name(base: str, scaling: bool, is_default: bool) -> str:
    """Name generation mirroring the reference (multimodal_torch.py:128-155, 407-430)."""
    name = base
    if not is_default:
        name += "Custom"
    if scaling:
        name += "Scaled"
    return name


@struct.dataclass
class ThreeMixture(TargetMixin):
    """Equal-covariance 3-component Gaussian mixture.

    p(x) = sum_k w_k N(x | mu_k, I)  (standard), or with random coordinate
    scaling: p(x) = sum_k w_k (prod_j s_j) N(x*s | mu_k, I)   (reference :14-37).
    """

    dim: int = struct.field(pytree_node=False)
    scaling: bool = struct.field(pytree_node=False)
    means: jax.Array            # (3, d)
    log_weights: jax.Array      # (3,)
    weights: jax.Array          # (3,)
    scaling_factors: jax.Array  # (d,)  (ones when scaling=False)
    log_jacobian: jax.Array     # scalar (0 when scaling=False)
    name: str = struct.field(pytree_node=False, default="ThreeMixture")

    @classmethod
    def create(cls, dim: int, scaling: bool = False, mode_centers=None,
               mode_weights=None, seed: int = 0,
               scaling_factors=None) -> "ThreeMixture":
        """``scaling_factors``: explicit (d,) coordinate scalings (win over
        the seeded U(0.02, 1.98) draw) — lets callers express e.g. the CPU
        classes' covariance-scaled model N(x | mu_k, diag(v)) exactly, via
        s = 1/sqrt(v) and centers mu_k * s (multimodal.py:26-29)."""
        # default: modes at first coordinate -5, 0, +5 (reference :57-62)
        def_centers = [[-5.0] + [0.0] * (dim - 1),
                       [0.0] * dim,
                       [5.0] + [0.0] * (dim - 1)]
        def_weights = [1 / 3, 1 / 3, 1 / 3]
        if mode_centers is None:
            mode_centers = def_centers
        if mode_weights is None:
            mode_weights = def_weights
        means = jnp.asarray(mode_centers, default_float())
        if means.shape != (3, dim):
            raise ValueError(f"mode_centers must have shape (3, {dim}), got {means.shape}")
        w = jnp.asarray(mode_weights, default_float())
        if w.shape != (3,):
            raise ValueError("mode_weights must contain exactly 3 weights")
        # by-value default detection like the reference's torch.allclose name
        # generation (multimodal_torch.py:128-155), so passing the default
        # values explicitly (e.g. via the registry) keeps the canonical name
        default_centers = bool(np.allclose(np.asarray(means), def_centers)
                               and np.allclose(np.asarray(w), def_weights))
        if abs(float(w.sum()) - 1.0) > 1e-5:
            raise ValueError("mode_weights must sum to 1.0")
        if scaling:
            if scaling_factors is not None:
                s = jnp.asarray(scaling_factors, default_float())
                if s.shape != (dim,):
                    raise ValueError(f"scaling_factors must have shape "
                                     f"({dim},), got {s.shape}")
            else:
                s = jax.random.uniform(jax.random.key(seed), (dim,),
                                       minval=0.02, maxval=1.98)
            log_jac = jnp.sum(jnp.log(s))
        else:
            s = jnp.ones(dim)
            log_jac = jnp.zeros(())
        return cls(dim=dim, scaling=scaling, means=means,
                   log_weights=jnp.log(w), weights=w, scaling_factors=s,
                   log_jacobian=log_jac,
                   name=_mixture_name("ThreeMixture", scaling, default_centers))

    def log_density_td(self, x):
        y = bdim(self.scaling_factors, x) * x if self.scaling else x
        # (3, d, *B) component deviations; logsumexp over components (:198-242)
        diff = y[None] - self.means.reshape((3, self.dim) + (1,) * (x.ndim - 1))
        quad = jnp.sum(diff * diff, axis=1)                    # (3, *B)
        lw = self.log_weights.reshape((3,) + (1,) * (x.ndim - 1))
        comp = -0.5 * quad - 0.5 * self.dim * _LOG_2PI + lw
        return jax.nn.logsumexp(comp, axis=0) + self.log_jacobian

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Tempered component sampler (reference :270-315): pick a mode, draw
        y ~ N(mu_k, I/beta), return x = y / s."""
        k_cat, k_norm = jax.random.split(key)
        idx = jax.random.categorical(k_cat, jnp.log(self.weights), shape=(n,))
        z = jax.random.normal(k_norm, (n, self.dim))
        y = self.means[idx] + z / jnp.sqrt(jnp.asarray(beta, z.dtype))
        return y / self.scaling_factors

    def init_sample(self, key, n: int):
        """Multimodal targets start at the origin (metropolis.py:46-52)."""
        return jnp.zeros((n, self.dim))

    def marginal_density(self, axis: int, xs):
        """Mixture of unit-variance Gaussians marginalizes per coordinate:
        sum_k w_k N(s x | mu_k[axis], 1) * s  (Jacobian of y = s x)."""
        s = self.scaling_factors[axis]
        y = s * jnp.asarray(xs)
        diff = y[None, :] - self.means[:, axis][:, None]        # (3, n)
        comp = jnp.exp(-0.5 * diff * diff) / jnp.sqrt(2.0 * jnp.pi)
        return s * jnp.sum(self.weights[:, None] * comp, axis=0)


@struct.dataclass
class RoughCarpet(TargetMixin):
    """Product over dims of a 1-D three-mode Gaussian mixture (reference :337-576).

    Default modes (-5, 0, 5), weights (0.5, 0.3, 0.2) (:359-364).
    """

    dim: int = struct.field(pytree_node=False)
    scaling: bool = struct.field(pytree_node=False)
    modes: jax.Array            # (3,)
    log_weights: jax.Array      # (3,)
    weights: jax.Array          # (3,)
    scaling_factors: jax.Array  # (d,)
    log_jacobian: jax.Array
    name: str = struct.field(pytree_node=False, default="RoughCarpet")

    @classmethod
    def create(cls, dim: int, scaling: bool = False, mode_centers=None,
               mode_weights=None, seed: int = 0,
               scaling_factors=None) -> "RoughCarpet":
        modes = jnp.asarray([-5.0, 0.0, 5.0] if mode_centers is None
                            else mode_centers, default_float())
        w = jnp.asarray([0.5, 0.3, 0.2] if mode_weights is None
                        else mode_weights, default_float())
        if modes.shape != (3,):
            raise ValueError("mode_centers must contain exactly 3 scalar modes")
        if w.shape != (3,):
            raise ValueError("mode_weights must contain exactly 3 weights")
        # by-value default detection (see ThreeMixture.create)
        default = bool(np.allclose(np.asarray(modes), [-5.0, 0.0, 5.0])
                       and np.allclose(np.asarray(w), [0.5, 0.3, 0.2]))
        if abs(float(w.sum()) - 1.0) > 1e-5:
            raise ValueError("mode_weights must sum to 1.0")
        if scaling:
            if scaling_factors is not None:
                s = jnp.asarray(scaling_factors, default_float())
                if s.shape != (dim,):
                    raise ValueError(f"scaling_factors must have shape "
                                     f"({dim},), got {s.shape}")
            else:
                s = jax.random.uniform(jax.random.key(seed), (dim,),
                                       minval=0.02, maxval=1.98)
            log_jac = jnp.sum(jnp.log(s))
        else:
            s = jnp.ones(dim)
            log_jac = jnp.zeros(())
        return cls(dim=dim, scaling=scaling, modes=modes, log_weights=jnp.log(w),
                   weights=w, scaling_factors=s, log_jacobian=log_jac,
                   name=_mixture_name("RoughCarpet", scaling, default))

    def log_density_td(self, x):
        y = bdim(self.scaling_factors, x) * x if self.scaling else x
        # per-dim mixture: logsumexp over modes, then sum over dims
        # (reference :470-510).  The 3-way logsumexp is unrolled over the
        # static mode count with scalar mode/weight extraction so no mode
        # axis is materialized — Mosaic cannot lower the (1,3)->(3,1,...)
        # relayout a broadcast against a mode axis needs inside Pallas
        # kernels; this form is elementwise-only and compiles everywhere.
        parts = [self.log_weights[k] - 0.5 * jnp.square(y - self.modes[k])
                 for k in range(3)]
        m = jnp.maximum(jnp.maximum(parts[0], parts[1]), parts[2])
        # m == -inf (all quadratics overflowed, |y| > ~2e19 f32) must yield
        # -inf like jax.nn.logsumexp, not NaN from (-inf) - (-inf): shift by
        # a zeroed max so exp(-inf - 0) = 0 -> log 0 = -inf, m + -inf = -inf
        m0 = jnp.where(jnp.isfinite(m), m, 0.0)
        per_dim = m + jnp.log(jnp.exp(parts[0] - m0) + jnp.exp(parts[1] - m0)
                              + jnp.exp(parts[2] - m0)) - _LOG_SQRT_2PI
        return jnp.sum(per_dim, axis=0) + self.log_jacobian

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Per-coordinate mode pick + Gaussian noise / sqrt(beta) (:532-565)."""
        k_cat, k_norm = jax.random.split(key)
        idx = jax.random.categorical(k_cat, jnp.log(self.weights),
                                     shape=(n, self.dim))
        z = jax.random.normal(k_norm, (n, self.dim))
        y = self.modes[idx] + z / jnp.sqrt(jnp.asarray(beta, z.dtype))
        return y / self.scaling_factors

    def init_sample(self, key, n: int):
        """Multimodal targets start at the origin (metropolis.py:40-45)."""
        return jnp.zeros((n, self.dim))

    def marginal_density(self, axis: int, xs):
        """Product target: marginal = the axis' 1-D three-mode mixture,
        Jacobian-corrected for the scaled variant."""
        s = self.scaling_factors[axis]
        y = s * jnp.asarray(xs)
        diff = y[None, :] - self.modes[:, None]                 # (3, n)
        comp = jnp.exp(-0.5 * diff * diff) / jnp.sqrt(2.0 * jnp.pi)
        return s * jnp.sum(self.weights[:, None] * comp, axis=0)
