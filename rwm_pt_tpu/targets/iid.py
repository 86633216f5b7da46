"""IID product targets (Gamma / Beta).

Re-implements (TPU-native, pure JAX):
  * ``IIDGammaTorch`` (/root/reference/target_distributions/iid_product_torch.py:5-131)
  * ``IIDBetaTorch``  (/root/reference/target_distributions/iid_product_torch.py:134-274)

Domain masking: invalid coordinates yield ``-inf`` log density.  Instead of the
reference's boolean-index fallback (iid_product_torch.py:62-76), everything is a
branch-free ``where`` so the whole batch stays on the VPU under ``jit``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.special import gammaln

from .base import TargetMixin
from ..utils.dtypes import default_float


@struct.dataclass
class IIDGamma(TargetMixin):
    """Product of d iid Gamma(shape, scale) densities (reference defaults 2, 3)."""

    dim: int = struct.field(pytree_node=False)
    shape: jax.Array
    scale: jax.Array
    log_norm_const: jax.Array
    name: str = struct.field(pytree_node=False, default="IIDGamma")

    @classmethod
    def create(cls, dim: int, shape: float = 2.0, scale: float = 3.0) -> "IIDGamma":
        sh = jnp.asarray(shape, default_float())
        sc = jnp.asarray(scale, default_float())
        # d * (lgamma(shape) + shape log scale)  (reference :28-34)
        lnc = dim * (gammaln(sh) + sh * jnp.log(sc))
        return cls(dim=dim, shape=sh, scale=sc, log_norm_const=lnc)

    def log_density_td(self, x):
        valid = jnp.all(x > 0, axis=0)
        safe_x = jnp.where(x > 0, x, 1.0)
        ld = jnp.sum((self.shape - 1) * jnp.log(safe_x) - safe_x / self.scale,
                     axis=0) - self.log_norm_const
        return jnp.where(valid, ld, -jnp.inf)

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Shape tempered as shape*beta (reference :103-121)."""
        g = jax.random.gamma(key, self.shape * beta, (n, self.dim))
        return g * self.scale

    def init_sample(self, key, n: int):
        """Gamma targets start at 5 + 0.01 N (metropolis.py:32-38)."""
        return 5.0 + 0.01 * jax.random.normal(key, (n, self.dim))

    def marginal_density(self, axis: int, xs):
        """Product target: marginal = the Gamma(shape, scale) factor."""
        x = jnp.asarray(xs)
        safe = jnp.where(x > 0, x, 1.0)
        ld = ((self.shape - 1) * jnp.log(safe) - safe / self.scale
              - gammaln(self.shape) - self.shape * jnp.log(self.scale))
        return jnp.where(x > 0, jnp.exp(ld), 0.0)


@struct.dataclass
class IIDBeta(TargetMixin):
    """Product of d iid Beta(alpha, beta) densities (reference defaults 2, 3)."""

    dim: int = struct.field(pytree_node=False)
    alpha: jax.Array
    beta: jax.Array
    log_norm_const: jax.Array
    name: str = struct.field(pytree_node=False, default="IIDBeta")

    @classmethod
    def create(cls, dim: int, alpha: float = 2.0, beta: float = 3.0) -> "IIDBeta":
        a = jnp.asarray(alpha, default_float())
        b = jnp.asarray(beta, default_float())
        # d * (lgamma(a+b) - lgamma(a) - lgamma(b))  (reference :162-170)
        lnc = dim * (gammaln(a + b) - gammaln(a) - gammaln(b))
        return cls(dim=dim, alpha=a, beta=b, log_norm_const=lnc)

    def log_density_td(self, x):
        valid = jnp.all((x > 0) & (x < 1), axis=0)
        in_dom = (x > 0) & (x < 1)
        safe_x = jnp.where(in_dom, x, 0.5)
        ld = jnp.sum((self.alpha - 1) * jnp.log(safe_x)
                     + (self.beta - 1) * jnp.log1p(-safe_x), axis=0)
        return jnp.where(valid, ld + self.log_norm_const, -jnp.inf)

    def direct_sample(self, key, n: int, beta_temp: float = 1.0):
        """Both shapes tempered by beta (reference :243-262)."""
        return jax.random.beta(key, self.alpha * beta_temp,
                               self.beta * beta_temp, (n, self.dim))

    def init_sample(self, key, n: int):
        """Beta targets start in U(0.2, 0.8) away from boundaries
        (metropolis.py:22-28)."""
        return jax.random.uniform(key, (n, self.dim), minval=0.2, maxval=0.8)

    def marginal_density(self, axis: int, xs):
        """Product target: marginal = the Beta(alpha, beta) factor."""
        x = jnp.asarray(xs)
        in_dom = (x > 0) & (x < 1)
        safe = jnp.where(in_dom, x, 0.5)
        ld = ((self.alpha - 1) * jnp.log(safe)
              + (self.beta - 1) * jnp.log1p(-safe)
              + gammaln(self.alpha + self.beta)
              - gammaln(self.alpha) - gammaln(self.beta))
        return jnp.where(in_dom, jnp.exp(ld), 0.0)
