"""Target-distribution protocol for the TPU-native MCMC framework.

Design notes (TPU-first, not a port)
------------------------------------
The reference implements targets as stateful torch ``nn.Module``-ish classes with
``log_density(x)`` over ``(batch, dim)`` tensors (``/root/reference/interfaces/target_torch.py:5-68``).
Here every target is an immutable ``flax.struct`` pytree of parameters with *pure*
log-density functions, so it can be closed over by ``jax.jit``/``lax.scan``/``shard_map``
and traced once.

Layout: the hot kernels keep the state in **dim-leading** layout ``(dim, *batch)``
with the chain axis minor-most.  On TPU the minor-most axis maps to the 128-wide
vector lanes, so with thousands of chains every VPU lane is busy; the small
``dim`` axis (2-100 in all reference workloads) lives on sublanes instead of
wasting lanes.  All targets therefore implement :meth:`log_density_td` reducing
over axis 0.  The user-facing :meth:`log_density` accepts the conventional
``(..., dim)`` layout for parity with the reference API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bdim(p: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a per-dimension parameter vector ``(d,)`` against ``(d, *batch)``."""
    return p.reshape(p.shape + (1,) * (x.ndim - 1))


def _as_batched_td(x: jax.Array) -> jax.Array:
    """Move the trailing dim axis of ``(..., d)`` input to the front -> ``(d, ...)``."""
    return jnp.moveaxis(jnp.asarray(x), -1, 0)


class TargetMixin:
    """Shared behaviour for all target dataclasses.

    Mirrors the surface of ``TorchTargetDistribution``
    (``/root/reference/interfaces/target_torch.py:22-68``): ``density``,
    ``log_density``, ``get_name``, plus the direct samplers used for
    temperature-ladder construction (``draw_samples_torch`` in the reference).
    """

    # -- public API (batch-last layout, reference-compatible) -----------------
    def log_density(self, x):
        """Log density at ``x`` of shape ``(dim,)`` or ``(..., dim)``.

        Returns shape ``()`` / ``(...,)`` matching the reference semantics
        (``/root/reference/interfaces/target_torch.py:34-44``).
        """
        return self.log_density_td(_as_batched_td(x))

    def density(self, x):
        """``exp(log_density(x))`` (reference: ``target_torch.py:22-32``)."""
        return jnp.exp(self.log_density(x))

    def get_name(self) -> str:
        return self.name

    # -- hooks a concrete target may override ---------------------------------
    def log_density_td(self, x):  # pragma: no cover - abstract
        """Log density with dim-leading layout ``x: (dim, *batch) -> (*batch)``."""
        raise NotImplementedError

    def direct_sample(self, key, n: int, beta: float = 1.0):
        """Draw ``(n, dim)`` samples from the beta-tempered target.

        Used only for iterative ladder construction, mirroring
        ``draw_samples_torch`` (e.g. ``multivariate_normal_torch.py:101-121``).
        Targets without a tractable sampler raise ``NotImplementedError``
        exactly like the reference (``rosenbrock_torch.py:103``,
        ``funnel_torch.py:89``).
        """
        raise NotImplementedError(
            f"{self.get_name()} has no direct sampler; use a geometric or "
            "manual temperature ladder."
        )

    def marginal_density(self, axis: int, xs):
        """Exact 1-D marginal density along coordinate ``axis`` at points
        ``xs`` (shape ``(n,)``), or ``None`` when intractable.

        Used by the histogram overlay (api/simulation.py
        ``samples_histogram``).  The reference overlays a *conditional slice*
        — the joint density with every other coordinate pinned to 0
        (/root/reference/interfaces/simulation_gpu.py:345-378) — which is the
        wrong curve for correlated targets; targets with tractable marginals
        override this so the overlay is the true marginal, and the harness
        falls back to a clearly-labeled slice otherwise.
        """
        return None

    def init_sample(self, key, n: int):
        """Initial chain states ``(n, dim)``.

        Default mirrors ``MHAlgorithm.__init__``'s fallback initial point
        ``1e-8 * N(0, I)`` (``/root/reference/interfaces/metropolis.py:66``).
        Targets with constrained support override this (Beta/Gamma/multimodal
        heuristics at ``metropolis.py:22-64``).
        """
        return 1e-8 * jax.random.normal(key, (n, self.dim))
