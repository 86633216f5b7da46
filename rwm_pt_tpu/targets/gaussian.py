"""Gaussian target families.

Re-implements (TPU-native, pure JAX):
  * ``MultivariateNormalTorch``        (/root/reference/target_distributions/multivariate_normal_torch.py:5-131)
  * ``ScaledMultivariateNormalTorch``  (/root/reference/target_distributions/multivariate_normal_torch.py:134-296)
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from .base import TargetMixin, bdim
from ..utils.dtypes import default_float

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class MultivariateNormal(TargetMixin):
    """N(mean, cov); defaults to (0, I) like the reference (:11-44).

    ``iso`` marks the identity-covariance fast path so the hot kernel does a
    pure VPU reduction instead of an MXU matmul.
    """

    dim: int = struct.field(pytree_node=False)
    iso: bool = struct.field(pytree_node=False)
    mean: jax.Array          # (d,)
    cov: jax.Array           # (d, d)
    cov_inv: jax.Array       # (d, d)
    chol: jax.Array          # (d, d) cholesky of cov, for direct sampling
    log_norm_const: jax.Array  # scalar
    name: str = struct.field(pytree_node=False, default="MultivariateNormal")

    @classmethod
    def create(cls, dim: int, mean=None, cov=None) -> "MultivariateNormal":
        iso = cov is None
        mean = jnp.zeros(dim) if mean is None else jnp.asarray(mean, default_float())
        cov = jnp.eye(dim) if cov is None else jnp.asarray(cov, default_float())
        cov_inv = jnp.linalg.inv(cov)
        chol = jnp.linalg.cholesky(cov)
        _, logdet = jnp.linalg.slogdet(cov)
        # log_norm_const = -0.5 (d log 2pi + log|cov|)  (reference :43-44)
        lnc = -0.5 * (dim * _LOG_2PI + logdet)
        return cls(dim=dim, iso=iso, mean=mean, cov=cov, cov_inv=cov_inv,
                   chol=chol, log_norm_const=lnc)

    def log_density_td(self, x):
        xc = x - bdim(self.mean, x)
        if self.iso:
            quad = jnp.sum(xc * xc, axis=0)
        else:
            # (d,d) @ (d, B...) rides the MXU with chains on lanes.
            y = jnp.tensordot(self.cov_inv, xc, axes=([1], [0]))
            quad = jnp.sum(xc * y, axis=0)
        return -0.5 * quad + self.log_norm_const

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """x = mean + chol(cov/beta) @ z   (reference :101-121)."""
        z = jax.random.normal(key, (n, self.dim))
        scale = self.chol / jnp.sqrt(jnp.asarray(beta, z.dtype))
        return self.mean + z @ scale.T

    def marginal_density(self, axis: int, xs):
        """Gaussian marginal N(mean[axis], cov[axis, axis])."""
        var = self.cov[axis, axis]
        xc = jnp.asarray(xs) - self.mean[axis]
        return jnp.exp(-0.5 * xc * xc / var) / jnp.sqrt(2.0 * jnp.pi * var)


@struct.dataclass
class ScaledMultivariateNormal(TargetMixin):
    """pi(x) = prod_i c_i N(c_i x_i | 0, 1)  (reference :134-296).

    log pi(x) = sum log c_i - (D/2) log 2pi - 0.5 sum (c_i x_i)^2   (:178-180)
    """

    dim: int = struct.field(pytree_node=False)
    scaling_factors: jax.Array  # (d,) c_i
    log_norm_const: jax.Array
    name: str = struct.field(pytree_node=False, default="ScaledMultivariateNormal")

    @classmethod
    def create(cls, dim: int, scaling_factors=None, scaling_range=(0.02, 1.98),
               seed: int = 0) -> "ScaledMultivariateNormal":
        if scaling_factors is None:
            lo, hi = scaling_range
            c = jax.random.uniform(jax.random.key(seed), (dim,),
                                   minval=lo, maxval=hi)
        else:
            c = jnp.asarray(scaling_factors, default_float())
        lnc = jnp.sum(jnp.log(c)) - 0.5 * dim * _LOG_2PI
        return cls(dim=dim, scaling_factors=c, log_norm_const=lnc)

    def log_density_td(self, x):
        sx = bdim(self.scaling_factors, x) * x
        return self.log_norm_const - 0.5 * jnp.sum(sx * sx, axis=0)

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """x_i ~ N(0, 1/(c_i^2 beta))  (reference :249-271)."""
        z = jax.random.normal(key, (n, self.dim))
        std = 1.0 / (self.scaling_factors * jnp.sqrt(jnp.asarray(beta, z.dtype)))
        return z * std

    def get_variances(self):
        """Equivalent per-dim variances 1/c_i^2 (reference :277-279)."""
        return 1.0 / (self.scaling_factors ** 2)

    def marginal_density(self, axis: int, xs):
        """Product target: marginal = the axis factor c N(c x | 0, 1)."""
        c = self.scaling_factors[axis]
        y = c * jnp.asarray(xs)
        return c * jnp.exp(-0.5 * y * y) / jnp.sqrt(2.0 * jnp.pi)
