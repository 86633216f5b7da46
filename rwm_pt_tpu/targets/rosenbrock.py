"""Rosenbrock distribution family (Pagani et al. 2022).

Re-implements (TPU-native, pure JAX):
  * ``FullRosenbrockTorch``   (/root/reference/target_distributions/rosenbrock_torch.py:13-130)
  * ``EvenRosenbrockTorch``   (/root/reference/target_distributions/rosenbrock_torch.py:133-256)
  * ``HybridRosenbrockTorch`` (/root/reference/target_distributions/rosenbrock_torch.py:259-411)

Default coefficients a = 1/20, b = 100/20, mu = 1 (reference :7-10).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import TargetMixin, bdim
from ..utils.dtypes import default_float

DEFAULT_A_COEFF = 1.0 / 20.0
DEFAULT_B_COEFF = 100.0 / 20.0
DEFAULT_MU = 1.0


@struct.dataclass
class FullRosenbrock(TargetMixin):
    """log p(x) = -sum_{i=1}^{n-1} [ b (x_{i+1} - x_i^2)^2 + a (x_i - mu_i)^2 ]
    (reference :18-21, :67-84). No tractable direct sampler (reference raises,
    :103)."""

    dim: int = struct.field(pytree_node=False)
    a_coeff: jax.Array
    b_coeff: jax.Array
    mu: jax.Array  # (d-1,)
    name: str = struct.field(pytree_node=False, default="FullRosenbrock")

    @classmethod
    def create(cls, dim: int, a_coeff: float = DEFAULT_A_COEFF,
               b_coeff: float = DEFAULT_B_COEFF, mu=DEFAULT_MU) -> "FullRosenbrock":
        if dim < 2:
            raise ValueError("Dimension for FullRosenbrock must be at least 2.")
        mu_arr = jnp.broadcast_to(jnp.asarray(mu, default_float()), (dim - 1,))
        return cls(dim=dim, a_coeff=jnp.asarray(a_coeff, default_float()),
                   b_coeff=jnp.asarray(b_coeff, default_float()), mu=mu_arr)

    def log_density_td(self, x):
        x_i = x[:-1]
        x_ip1 = x[1:]
        t1 = self.b_coeff * (x_ip1 - x_i * x_i) ** 2
        t2 = self.a_coeff * (x_i - bdim(self.mu, x_i)) ** 2
        return -(jnp.sum(t1, axis=0) + jnp.sum(t2, axis=0))


@struct.dataclass
class EvenRosenbrock(TargetMixin):
    """Product of n/2 independent 2-d Rosenbrock kernels (reference :138-148).

    log p(x) = -sum_i [ a (x_{2i-1} - mu)^2 + b (x_{2i} - x_{2i-1}^2)^2 ]
    with 0-indexed odd positions x[0::2] and even positions x[1::2] (:194-210).
    """

    dim: int = struct.field(pytree_node=False)
    a_coeff: jax.Array  # () scalar, kept for direct_sample / introspection
    b_coeff: jax.Array  # ()
    mu: jax.Array       # (d-1,): per-pair means scattered to even slots
    a_vec: jax.Array    # (d-1,): a at pair starts, 0 at odd slots
    b_vec: jax.Array    # (d-1,): b at pair starts, 0 at odd slots
    name: str = struct.field(pytree_node=False, default="EvenRosenbrock")

    @classmethod
    def create(cls, dim: int, a_coeff: float = DEFAULT_A_COEFF,
               b_coeff: float = DEFAULT_B_COEFF, mu=DEFAULT_MU) -> "EvenRosenbrock":
        if dim < 2 or dim % 2 != 0:
            raise ValueError("Dimension for EvenRosenbrock must be >= 2 and even.")
        # The pair structure is folded into (d-1,) parameter vectors at build
        # time (mu/a/b at even slots, 0 at odd slots): the density then needs
        # only contiguous x[:-1]/x[1:] slices and elementwise math — the same
        # shape pattern as FullRosenbrock — because Mosaic cannot lower the
        # strided x[0::2] gathers (or an iota-masked select; it hangs) that a
        # direct transcription of reference :194-210 would need in a Pallas
        # kernel.
        f = default_float()
        mu_pairs = jnp.broadcast_to(jnp.asarray(mu, f), (dim // 2,))
        mu_arr = jnp.zeros((dim - 1,), f).at[0::2].set(mu_pairs)
        even = jnp.zeros((dim - 1,), f).at[0::2].set(1.0)
        a = jnp.asarray(a_coeff, f)
        b = jnp.asarray(b_coeff, f)
        return cls(dim=dim, a_coeff=a, b_coeff=b, mu=mu_arr,
                   a_vec=a * even, b_vec=b * even)

    def log_density_td(self, x):
        # pair (x_{2i-1}, x_{2i}) starts at even index i of x[:-1]; odd-index
        # entries carry zero coefficients, so the sum covers exactly the d/2
        # independent 2-d Rosenbrock kernels of reference :194-210
        x_i = x[:-1]      # (d-1, *B)
        x_ip1 = x[1:]
        t1 = bdim(self.a_vec, x_i) * jnp.square(x_i - bdim(self.mu, x_i))
        t2 = bdim(self.b_vec, x_i) * jnp.square(x_ip1 - x_i * x_i)
        return -jnp.sum(t1 + t2, axis=0)

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Exact conditional-Gaussian sampler (reference :224-248):
        x_odd ~ N(mu, 1/(2 a beta)); x_even | x_odd ~ N(x_odd^2, 1/(2 b beta))."""
        k1, k2 = jax.random.split(key)
        pairs = self.dim // 2
        eff_a = self.a_coeff * beta
        eff_b = self.b_coeff * beta
        mu_pairs = self.mu[0::2]                     # un-scatter (see create)
        x_odd = mu_pairs + jax.random.normal(k1, (n, pairs)) * jnp.sqrt(1.0 / (2 * eff_a))
        x_even = x_odd ** 2 + jax.random.normal(k2, (n, pairs)) * jnp.sqrt(1.0 / (2 * eff_b))
        out = jnp.zeros((n, self.dim))
        out = out.at[:, 0::2].set(x_odd)
        out = out.at[:, 1::2].set(x_even)
        return out


@struct.dataclass
class HybridRosenbrock(TargetMixin):
    """DAG of n2 blocks of length n1; dim = 1 + n2 (n1 - 1) (reference :259-291).

    log p(x) = -a (x_g1 - mu)^2 - b sum_j (x_{j,2} - x_g1^2)^2
               - b sum_j sum_{i=3}^{n1} (x_{j,i} - x_{j,i-1}^2)^2
    """

    dim: int = struct.field(pytree_node=False)
    n1: int = struct.field(pytree_node=False)
    n2: int = struct.field(pytree_node=False)
    a_coeff: jax.Array
    b_coeff: jax.Array
    mu: jax.Array
    name: str = struct.field(pytree_node=False, default="HybridRosenbrock")

    @classmethod
    def create(cls, n1: int, n2: int, a_coeff: float = DEFAULT_A_COEFF,
               b_coeff: float = DEFAULT_B_COEFF, mu: float = DEFAULT_MU) -> "HybridRosenbrock":
        if n1 < 2:
            raise ValueError("n1 (block length parameter) must be at least 2.")
        if n2 < 1:
            raise ValueError("n2 (number of blocks) must be at least 1.")
        dim = 1 + n2 * (n1 - 1)
        return cls(dim=dim, n1=n1, n2=n2,
                   a_coeff=jnp.asarray(a_coeff, default_float()),
                   b_coeff=jnp.asarray(b_coeff, default_float()),
                   mu=jnp.asarray(mu, default_float()))

    def log_density_td(self, x):
        x_g1 = x[0]                               # (*B,)
        log_prob = -self.a_coeff * (x_g1 - self.mu) ** 2
        if self.dim > 1:
            blocks = x[1:].reshape((self.n2, self.n1 - 1) + x.shape[1:])
            # first variable of each block depends on x_g1^2 (reference :329-333)
            t_first = self.b_coeff * (blocks[:, 0] - x_g1 * x_g1) ** 2
            log_prob = log_prob - jnp.sum(t_first, axis=0)
            if self.n1 > 2:
                prev_sq = blocks[:, :-1] ** 2     # (n2, n1-2, *B)
                curr = blocks[:, 1:]
                t_in = self.b_coeff * (curr - prev_sq) ** 2
                log_prob = log_prob - jnp.sum(t_in, axis=(0, 1))
        return log_prob

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Algorithm 1 of the paper (reference :365-403): ancestral sampling
        down the DAG.  The intra-block recursion is a short static scan over
        n1-2 positions (n1 is tiny in practice)."""
        eff_a = self.a_coeff * beta
        eff_b = self.b_coeff * beta
        std_g1 = jnp.sqrt(1.0 / (2 * eff_a))
        std_blk = jnp.sqrt(1.0 / (2 * eff_b))
        k_g1, k_blk = jax.random.split(key)
        x_g1 = self.mu + jax.random.normal(k_g1, (n,)) * std_g1
        noise = jax.random.normal(k_blk, (self.n2, self.n1 - 1, n)) * std_blk

        first = x_g1[None, :] ** 2 + noise[:, 0]          # (n2, n)

        def body(prev, eps):
            nxt = prev ** 2 + eps
            return nxt, nxt

        _, rest = jax.lax.scan(body, first, jnp.moveaxis(noise[:, 1:], 1, 0))
        # rest: (n1-2, n2, n); assemble (n2, n1-1, n)
        blocks = jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
        out = jnp.concatenate([x_g1[None], blocks.reshape(self.n2 * (self.n1 - 1), n)],
                              axis=0)
        return out.T
