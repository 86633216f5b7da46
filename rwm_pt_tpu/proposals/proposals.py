"""Proposal increment distributions.

Re-implements (TPU-native, pure JAX):
  * ``NormalProposal``        (/root/reference/proposal_distributions/normal.py:5-66)
  * ``LaplaceProposal``       (/root/reference/proposal_distributions/laplace.py:5-91)
  * ``UniformRadiusProposal`` (/root/reference/proposal_distributions/uniform.py:6-101)

All proposals are symmetric, state-independent *increment* distributions.
Temperature enters through the same scaling laws as the reference:
variance/beta for Normal & Laplace (normal.py:27, laplace.py:29-32) and
radius/sqrt(beta) for UniformRadius (uniform.py:26-28).

TPU design: instead of the reference's per-object ``sample(n) -> (n, dim)``
with a stateful torch generator, each proposal is an immutable pytree exposing

  ``sample_td(key, betas, batch_shape) -> (dim, *batch_shape)``

a pure function of a threefry key that draws increments for an arbitrary
batch (e.g. ``(T, C)`` = temperatures x chains) with per-temperature beta
scaling vectorized in one shot — no Cholesky bmm is needed because all
reference proposal covariances are diagonal (pt_rwm_gpu_optimized.py:446-455
builds (var/beta) * I explicitly; here it is a scalar multiply).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from ..utils.dtypes import default_float


def _expand(v: jax.Array, batch_ndim: int) -> jax.Array:
    """Reshape per-beta scale (T,) -> (1, T, 1, ..) to broadcast over (d, T, *B)."""
    return v.reshape((1,) + v.shape + (1,) * (batch_ndim - v.ndim))


class Proposal:
    """Common surface: ``name``, ``dim``, ``sample`` / ``sample_td``,
    ``log_inc_density`` / ``log_q_ratio``."""

    def get_name(self) -> str:
        return self.name

    def sample(self, key, n: int, beta: float = 1.0):
        """Reference-compatible layout: ``(n, dim)`` increments
        (proposal_distributions/base.py:31-44)."""
        return jnp.moveaxis(self.sample_td(key, jnp.asarray(beta), (n,)), 0, -1)

    def log_q_ratio(self, inc, betas):
        """Asymmetric-MH correction ``log q(x|y) - log q(y|x)`` for a move
        ``y = x + inc`` — the reference's ``symmetric=False`` proposal term
        (/root/reference/algorithms/rwm.py:59-66, which evaluates both
        proposal pdfs; here via the increment density: q(x|y) = g(-inc),
        q(y|x) = g(inc)).

        All library proposals have even increment densities g(-z) = g(z), so
        this is identically zero for them — the hook exists so the accept
        rule is *computed* correctly when ``symmetric=False`` is requested
        and so custom asymmetric proposals can override it.  Unlike the
        reference (which evaluates the correction at the untempered base
        variance, rwm.py:61-65), the density here uses the rung's effective
        scale — immaterial for symmetric proposals (both give 0).
        """
        return self.log_inc_density(-inc, betas) - self.log_inc_density(inc, betas)


@struct.dataclass
class NormalProposal(Proposal):
    """Isotropic Gaussian increments; effective variance = base_variance/beta
    (reference normal.py:27-33)."""

    dim: int = struct.field(pytree_node=False)
    base_variance_scalar: jax.Array
    name: str = struct.field(pytree_node=False, default="Normal")

    @classmethod
    def create(cls, dim: int, base_variance_scalar: float) -> "NormalProposal":
        if base_variance_scalar <= 0:
            raise ValueError("base_variance_scalar must be positive")
        return cls(dim=dim, base_variance_scalar=jnp.asarray(base_variance_scalar,
                                                             default_float()))

    def sample_td(self, key, betas, batch_shape):
        betas = jnp.asarray(betas)
        z = jax.random.normal(key, (self.dim,) + tuple(batch_shape))
        std = jnp.sqrt(self.base_variance_scalar / betas)
        if std.ndim > 0:
            std = _expand(std, len(batch_shape))
        return z * std

    def log_inc_density(self, inc, betas):
        """log N(inc; 0, (base_variance/beta) I) reduced over dim -> (*B,)."""
        betas = jnp.asarray(betas)
        var_eff = self.base_variance_scalar / betas          # () or (T,)
        sq = jnp.sum(inc * inc, axis=0)                      # (*B,)
        if var_eff.ndim > 0:
            var_eff = var_eff.reshape(var_eff.shape + (1,) * (sq.ndim - 1))
        return -0.5 * self.dim * jnp.log(2.0 * jnp.pi * var_eff) \
            - 0.5 * sq / var_eff


@struct.dataclass
class LaplaceProposal(Proposal):
    """Per-dimension Laplace increments via inverse CDF
    ``X = -scale * sign(U) * log1p(-2|U|)`` with the reference's clamp
    (laplace.py:46-69).  ``scale = sqrt((base_variance/beta) / 2)``
    (laplace.py:29-32); supports anisotropic variance vectors."""

    dim: int = struct.field(pytree_node=False)
    base_variance_vector: jax.Array  # (d,)
    name: str = struct.field(pytree_node=False, default="Laplace")

    @classmethod
    def create(cls, dim: int, base_variance_vector) -> "LaplaceProposal":
        v = jnp.asarray(base_variance_vector, default_float())
        if v.ndim == 0:
            v = jnp.full((dim,), v)
        if v.shape != (dim,):
            raise ValueError(f"base_variance_vector must have shape ({dim},), "
                             f"got {v.shape}")
        if not bool(jnp.all(v > 0)):
            raise ValueError("All elements of base_variance_vector must be positive")
        return cls(dim=dim, base_variance_vector=v)

    def sample_td(self, key, betas, batch_shape):
        betas = jnp.asarray(betas)
        u = jax.random.uniform(key, (self.dim,) + tuple(batch_shape),
                               minval=-0.5, maxval=0.5)
        # scale: (d,) or (d, T) -> broadcastable (d, T, 1...)
        var_eff = self.base_variance_vector[:, None] / betas if betas.ndim > 0 \
            else self.base_variance_vector / betas
        scale = jnp.sqrt(var_eff / 2.0)
        scale = scale.reshape(scale.shape + (1,) * (u.ndim - scale.ndim))
        clamped = jnp.maximum(-2.0 * jnp.abs(u), -0.999999)  # laplace.py:64-67
        return -scale * jnp.sign(u) * jnp.log1p(clamped)

    def _scale(self, betas, batch_ndim):
        betas = jnp.asarray(betas)
        var_eff = self.base_variance_vector[:, None] / betas if betas.ndim > 0 \
            else self.base_variance_vector / betas
        scale = jnp.sqrt(var_eff / 2.0)
        return scale.reshape(scale.shape + (1,) * (1 + batch_ndim - scale.ndim))

    def log_inc_density(self, inc, betas):
        """Product-Laplace log density reduced over dim -> (*B,)."""
        scale = self._scale(betas, inc.ndim - 1)             # (d, 1...) bcast
        return jnp.sum(-jnp.log(2.0 * scale) - jnp.abs(inc) / scale, axis=0)


@struct.dataclass
class UniformRadiusProposal(Proposal):
    """Uniform increments in an n-ball: Gaussian direction / norm, radius
    ``R_eff * U^(1/d)`` with ``R_eff = base_radius / sqrt(beta)``
    (reference uniform.py:26-73)."""

    dim: int = struct.field(pytree_node=False)
    base_radius: jax.Array
    name: str = struct.field(pytree_node=False, default="UniformRadius")

    @classmethod
    def create(cls, dim: int, base_radius: float) -> "UniformRadiusProposal":
        if base_radius <= 0:
            raise ValueError("base_radius must be positive")
        return cls(dim=dim, base_radius=jnp.asarray(base_radius, default_float()))

    def sample_td(self, key, betas, batch_shape):
        betas = jnp.asarray(betas)
        k_dir, k_rad = jax.random.split(key)
        dirs = jax.random.normal(k_dir, (self.dim,) + tuple(batch_shape))
        norms = jnp.sqrt(jnp.sum(dirs * dirs, axis=0, keepdims=True))
        dirs = dirs / jnp.maximum(norms, 1e-12)   # uniform.py:62-64
        u = jax.random.uniform(k_rad, (1,) + tuple(batch_shape))
        r_eff = self.base_radius / jnp.sqrt(betas)
        if r_eff.ndim > 0:
            r_eff = _expand(r_eff, len(batch_shape))
        radii = r_eff * jnp.power(u, 1.0 / self.dim)  # uniform.py:68-70
        return dirs * radii

    def log_inc_density(self, inc, betas):
        """Uniform-in-ball log density: -log Vol_d(R_eff) inside, -inf
        outside; reduced over dim -> (*B,)."""
        from jax.scipy.special import gammaln
        betas = jnp.asarray(betas)
        d = self.dim
        norm = jnp.sqrt(jnp.sum(inc * inc, axis=0))          # (*B,)
        r_eff = self.base_radius / jnp.sqrt(betas)
        if r_eff.ndim > 0:
            r_eff = r_eff.reshape(r_eff.shape + (1,) * (norm.ndim - 1))
        log_vol = (d * jnp.log(r_eff) + 0.5 * d * jnp.log(jnp.pi)
                   - gammaln(0.5 * d + 1.0))
        return jnp.where(norm <= r_eff, -log_vol, -jnp.inf)


def create_proposal_distribution(dim: int, proposal_config: dict) -> Proposal:
    """Factory mirroring ``MCMCSimulation_GPU._create_proposal_distribution``
    (/root/reference/interfaces/simulation_gpu.py:380-438)."""
    name = proposal_config.get("name")
    params = proposal_config.get("params", {})
    if name == "Normal":
        v = params.get("base_variance_scalar")
        if v is None:
            raise ValueError("Normal proposal requires 'base_variance_scalar' parameter")
        return NormalProposal.create(dim, v)
    if name == "Laplace":
        v = params.get("base_variance_vector")
        if v is None:
            raise ValueError("Laplace proposal requires 'base_variance_vector' parameter")
        return LaplaceProposal.create(dim, v)
    if name == "UniformRadius":
        r = params.get("base_radius")
        if r is None:
            raise ValueError("UniformRadius proposal requires 'base_radius' parameter")
        return UniformRadiusProposal.create(dim, r)
    raise ValueError(f"Unknown proposal distribution name: {name}")
