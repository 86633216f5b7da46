"""Funnel targets.

Re-implements (TPU-native, pure JAX):
  * ``NealFunnelTorch``  (/root/reference/target_distributions/funnel_torch.py:6-109)
  * ``SuperFunnelTorch`` (/root/reference/target_distributions/funnel_torch.py:112-348)

SuperFunnel is the only data-conditioned target.  The reference stores the
design matrices as a Python list of per-group tensors and loops over groups
(funnel_torch.py:219-231); here the group/covariate structure is folded into
flat parameter rows and a static J*K unroll of elementwise broadcasts with
chains on the minor axis — the formulation that lowers through both XLA and
Mosaic (see log_density_td).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from .base import TargetMixin
from ..utils.dtypes import default_float

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class NealFunnel(TargetMixin):
    """v ~ N(mu_v, sigma_v^2), z_k ~ N(mu_z, e^v) (reference :7-16).

    log p(x) = -0.5 log 2pi - 0.5 log sigma_v^2 - 0.5 (v-mu_v)^2/sigma_v^2
               - 0.5 (D-1) log 2pi - 0.5 (D-1) v - 0.5 e^{-v} sum (z_k-mu_z)^2
    No tractable direct sampler (reference raises, :89).
    """

    dim: int = struct.field(pytree_node=False)
    mu_v: jax.Array
    sigma_v_sq: jax.Array
    mu_z: jax.Array
    name: str = struct.field(pytree_node=False, default="NealFunnel")

    @classmethod
    def create(cls, dim: int, mu_v: float = 0.0, sigma_v_sq: float = 9.0,
               mu_z: float = 0.0) -> "NealFunnel":
        if dim < 1:
            raise ValueError("dim must be at least 1 for Neal's Funnel.")
        if sigma_v_sq <= 0:
            raise ValueError("sigma_v_sq must be positive.")
        return cls(dim=dim, mu_v=jnp.asarray(mu_v, default_float()),
                   sigma_v_sq=jnp.asarray(sigma_v_sq, default_float()),
                   mu_z=jnp.asarray(mu_z, default_float()))

    def log_density_td(self, x):
        v = x[0]
        log_prior_v = (-0.5 * _LOG_2PI - 0.5 * jnp.log(self.sigma_v_sq)
                       - 0.5 * (v - self.mu_v) ** 2 / self.sigma_v_sq)
        if self.dim == 1:
            return log_prior_v
        zs = x[1:]
        sum_sq = jnp.sum((zs - self.mu_z) ** 2, axis=0)
        d1 = self.dim - 1
        log_lik = (-0.5 * d1 * _LOG_2PI - 0.5 * d1 * v
                   - 0.5 * jnp.exp(-v) * sum_sq)
        return log_prior_v + log_lik

    def get_name(self) -> str:
        # parity with reference naming: funnel_torch.py:81-82
        return f"{self.name}_D{self.dim}"

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Exact ancestral sampler for the beta-tempered funnel.

        The reference raises NotImplementedError here (funnel_torch.py:89),
        which blocks iterative temperature-ladder construction for funnels —
        but the tempered funnel is exactly samplable: integrating the z's out
        of pi^beta leaves a *Gaussian* v-marginal,

            v ~ N(mu_v + (1-beta)(D-1) sigma_v^2 / (2 beta),  sigma_v^2/beta)
            z_k | v ~ N(mu_z, e^v / beta)

        (the e^{-(D-1)v/2} likelihood normalizer, raised to beta, shifts the
        v mean by the (1-beta) term).  A capability superset of the
        reference, enabling --iterative_temp_spacing on NealFunnel.
        """
        kv, kz = jax.random.split(key)
        beta = jnp.asarray(beta, default_float())
        d1 = self.dim - 1
        mean_v = self.mu_v + (1.0 - beta) * d1 * self.sigma_v_sq / (2.0 * beta)
        v = mean_v + jnp.sqrt(self.sigma_v_sq / beta) * jax.random.normal(kv, (n,))
        if self.dim == 1:
            return v[:, None]
        z = (self.mu_z + jnp.exp(v[:, None] / 2.0) / jnp.sqrt(beta)
             * jax.random.normal(kz, (n, d1)))
        return jnp.concatenate([v[:, None], z], axis=1)

    def marginal_density(self, axis: int, xs):
        """v's marginal is N(mu_v, sigma_v^2) exactly; a z coordinate's
        marginal p(z) = E_v[N(z | mu_z, e^v)] has no closed form but is a 1-D
        integral — evaluated by 64-node Gauss-Hermite quadrature over v
        (error is negligible next to plot resolution)."""
        import numpy as np
        xs = jnp.asarray(xs)
        if axis == 0:
            xc = xs - self.mu_v
            return (jnp.exp(-0.5 * xc * xc / self.sigma_v_sq)
                    / jnp.sqrt(2.0 * jnp.pi * self.sigma_v_sq))
        t, w = np.polynomial.hermite.hermgauss(64)
        v = self.mu_v + jnp.sqrt(2.0 * self.sigma_v_sq) * jnp.asarray(t)  # (64,)
        var_z = jnp.exp(v)[:, None]                                       # (64, 1)
        zc = (xs[None, :] - self.mu_z)
        comp = jnp.exp(-0.5 * zc * zc / var_z) / jnp.sqrt(2.0 * jnp.pi * var_z)
        return jnp.sum(jnp.asarray(w)[:, None] * comp, axis=0) / jnp.sqrt(jnp.pi)


@struct.dataclass
class SuperFunnel(TargetMixin):
    """Hierarchical logistic-regression posterior (reference :112-127).

    State vector Theta = (alphas (J), betas (J*K), mu_alpha, mu_beta (K),
    tau_alpha, tau_beta); dim = J + J*K + 1 + K + 2 (:133-135).
    Priors: alpha_j ~ N(mu_alpha, tau_alpha^2); beta_jk ~ N(mu_beta_k, tau_beta^2);
    hypermeans ~ N(0, prior_hypermean_std^2); taus ~ HalfCauchy(prior_tau_scale).
    No direct sampler (reference raises, :310).
    """

    dim: int = struct.field(pytree_node=False)
    J: int = struct.field(pytree_node=False)
    K: int = struct.field(pytree_node=False)
    # the raw (J, n, K) design matrix is NOT stored: log_density_td reads only
    # X_cols, and a dead pytree leaf would be flattened into every jit/Pallas
    # kernel operand list (duplicating the data in VMEM for the VMEM-resident
    # engine)
    X_cols: jax.Array  # (J*K, n): row j*K+k = X[j, :, k] (see log_density_td)
    Y: jax.Array       # (J, n)
    prior_hypermean_std: jax.Array
    prior_tau_scale: jax.Array
    name: str = struct.field(pytree_node=False, default="SuperFunnel")

    @classmethod
    def create(cls, J: int, K: int, X_data, Y_data,
               prior_hypermean_std: float = 10.0,
               prior_tau_scale: float = 2.5) -> "SuperFunnel":
        X = jnp.asarray(X_data, default_float())
        Y = jnp.asarray(Y_data, default_float())
        if X.ndim != 3 or X.shape[0] != J or X.shape[2] != K:
            raise ValueError(f"X_data must have shape (J={J}, n, K={K}), got {X.shape}")
        if Y.shape != X.shape[:2]:
            raise ValueError(f"Y_data must have shape {X.shape[:2]}, got {Y.shape}")
        dim = J + J * K + 1 + K + 1 + 1
        return cls(dim=dim, J=J, K=K,
                   X_cols=X.transpose(0, 2, 1).reshape(J * K, X.shape[1]),
                   Y=Y,
                   prior_hypermean_std=jnp.asarray(prior_hypermean_std, default_float()),
                   prior_tau_scale=jnp.asarray(prior_tau_scale, default_float()))

    @classmethod
    def create_synthetic(cls, J: int = 5, K: int = 3, n_per_group: int = 20,
                         prior_hypermean_std: float = 10.0,
                         prior_tau_scale: float = 2.5,
                         seed: int = 42) -> "SuperFunnel":
        """Synthetic data generation mirroring the experiment scripts
        (/root/reference/experiment_RWM_GPU.py:103-121): X ~ N(0,1), outcomes
        from logit(p) = 0.5 sum_k X_k."""
        kx, ky = jax.random.split(jax.random.key(seed))
        X = jax.random.normal(kx, (J, n_per_group, K))
        logits = 0.5 * jnp.sum(X, axis=-1)
        Y = jax.random.bernoulli(ky, jax.nn.sigmoid(logits)).astype(default_float())
        return cls.create(J, K, X, Y, prior_hypermean_std, prior_tau_scale)

    def _parse_theta(self, x):
        """Split the dim-leading state (reference _parse_theta, :169-191).

        ``betas`` stay flat ``(J*K, *B)`` (row j*K+k) — the ``(J, K, *B)``
        reshape of a direct transcription is a sublane relayout Mosaic cannot
        lower inside Pallas kernels.
        """
        J, K = self.J, self.K
        i = 0
        alphas = x[i:i + J]; i += J                       # (J, *B)
        betas_flat = x[i:i + J * K]; i += J * K           # (J*K, *B)
        mu_alpha = x[i]; i += 1                           # (*B,)
        mu_beta = x[i:i + K]; i += K                      # (K, *B)
        tau_alpha = x[i]; i += 1
        tau_beta = x[i]
        return alphas, betas_flat, mu_alpha, mu_beta, tau_alpha, tau_beta

    def log_density_td(self, x):
        # Mosaic-friendly formulation: contiguous slices, static row indexing,
        # elementwise ops and axis-0 reductions only.  The group/covariate
        # structure is a static Python unroll over J*K terms (15 at the
        # reference's J=5, K=3) instead of the (J,K,B)-relayout + einsum a
        # direct transcription uses — that pair hangs the Mosaic compiler,
        # which is why SuperFunnel used to be scan-engine-only.
        from .base import bdim
        (alphas, betas_flat, mu_alpha, mu_beta,
         tau_alpha, tau_beta) = self._parse_theta(x)
        J, K = self.J, self.K
        valid = (tau_alpha > 1e-9) & (tau_beta > 1e-9)    # (*B,) (reference :209)
        safe_ta = jnp.where(valid, tau_alpha, 1.0)
        safe_tb = jnp.where(valid, tau_beta, 1.0)

        # Likelihood: eta_{j,n} = alpha_j + sum_k X_{j,n,k} beta_{j,k}  (:219-231)
        ll = 0.0
        for j in range(J):
            eta = alphas[j][None]                         # (1, *B)
            for k in range(K):
                jk = j * K + k
                eta = eta + bdim(self.X_cols[jk], x) * betas_flat[jk][None]
            yj = bdim(self.Y[j], x)                       # (n, 1...)
            ll = ll + jnp.sum(yj * jax.nn.log_sigmoid(eta)
                              + (1 - yj) * jax.nn.log_sigmoid(-eta), axis=0)

        # Prior alphas: N(mu_alpha, tau_alpha^2)  (:240-244)
        da = alphas - mu_alpha[None]
        lp_alpha = (-0.5 * J * _LOG_2PI - J * jnp.log(safe_ta)
                    - 0.5 * jnp.sum(da * da, axis=0) / safe_ta ** 2)

        # Prior betas: N(mu_beta_k, tau_beta^2)  (:255-262); mu_beta is tiled
        # J times along the flat (J*K,) beta axis by concatenation
        mu_beta_t = jnp.concatenate([mu_beta] * J, axis=0)  # (J*K, *B)
        db = betas_flat - mu_beta_t
        lp_beta = (-0.5 * J * K * _LOG_2PI - J * K * jnp.log(safe_tb)
                   - 0.5 * jnp.sum(db * db, axis=0) / safe_tb ** 2)

        # Hypermean priors  (:265-275)
        hv = self.prior_hypermean_std ** 2
        lp_mu_a = -0.5 * _LOG_2PI - 0.5 * jnp.log(hv) - 0.5 * mu_alpha ** 2 / hv
        lp_mu_b = (-0.5 * K * _LOG_2PI - 0.5 * K * jnp.log(hv)
                   - 0.5 * jnp.sum(mu_beta * mu_beta, axis=0) / hv)

        # HalfCauchy tau priors: log 2 - log pi - log s - log1p((tau/s)^2)  (:277-287)
        s = self.prior_tau_scale
        lc = math.log(2.0) - math.log(math.pi) - jnp.log(s)
        lp_tau = (lc - jnp.log1p((safe_ta / s) ** 2)
                  + lc - jnp.log1p((safe_tb / s) ** 2))

        total = ll + lp_alpha + lp_beta + lp_mu_a + lp_mu_b + lp_tau
        return jnp.where(valid, total, -jnp.inf)

    def get_name(self) -> str:
        # parity with reference naming: funnel_torch.py:296-297
        return f"{self.name}_J{self.J}_K{self.K}"
