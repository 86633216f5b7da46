"""Uniform hypercube target.

Re-implements ``HypercubeTorch`` (/root/reference/target_distributions/hypercube_torch.py:5-114).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import TargetMixin
from ..utils.dtypes import default_float


@struct.dataclass
class Hypercube(TargetMixin):
    """Uniform on ``[left, right]^d``; log-density is ``-d log(r-l)`` inside and
    ``-inf`` outside (reference :49-80)."""

    dim: int = struct.field(pytree_node=False)
    left: jax.Array
    right: jax.Array
    log_uniform_density: jax.Array
    name: str = struct.field(pytree_node=False, default="Hypercube")

    @classmethod
    def create(cls, dim: int, left_boundary: float = 0.0,
               right_boundary: float = 1.0) -> "Hypercube":
        l = jnp.asarray(left_boundary, default_float())
        r = jnp.asarray(right_boundary, default_float())
        lud = -dim * jnp.log(r - l)
        return cls(dim=dim, left=l, right=r, log_uniform_density=lud)

    def log_density_td(self, x):
        within = jnp.all((x >= self.left) & (x <= self.right), axis=0)
        return jnp.where(within, self.log_uniform_density, -jnp.inf)

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Uniform draws; beta has no effect on a flat density (reference
        ``draw_samples_torch`` takes no beta, hypercube_torch.py:89-105)."""
        u = jax.random.uniform(key, (n, self.dim))
        return u * (self.right - self.left) + self.left

    def init_sample(self, key, n: int):
        """Start at 20-80% of the box, safely inside the support — the domain-aware
        analogue of the reference's constrained-support init heuristic
        (metropolis.py:22-28; the hypercube branch there is dead code, see
        SURVEY.md §7 quirks)."""
        u = jax.random.uniform(key, (n, self.dim), minval=0.2, maxval=0.8)
        return u * (self.right - self.left) + self.left

    def marginal_density(self, axis: int, xs):
        """Product target: marginal = U(left, right)."""
        x = jnp.asarray(xs)
        inside = (x >= self.left) & (x <= self.right)
        return jnp.where(inside, 1.0 / (self.right - self.left), 0.0)
