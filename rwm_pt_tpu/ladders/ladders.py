"""Inverse-temperature (beta) ladder construction.

Re-implements the two ladder builders of the reference PT algorithm:

* Geometric spacing with c = 0.5 down to beta_min = 1e-2
  (/root/reference/algorithms/pt_rwm_gpu_optimized.py:245-257).
* Iterative stochastic-approximation construction targeting a desired
  adjacent-rung swap acceptance rate
  (/root/reference/algorithms/pt_rwm_gpu_optimized.py:283-426), using the
  recurrence  rho_{n+1} = rho_n + n^p (a_hat - a*),  beta* = beta / (1 + e^rho).

The outer search is inherently data-dependent and stays on the host; only the
Monte-Carlo swap-probability estimator is jitted (one compile, reused for
every (beta, beta*) probe because the betas are traced scalars).
"""
from __future__ import annotations

import math
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from ..utils.dtypes import default_float


def construct_geometric_ladder(beta_0: float = 1.0, beta_min: float = 1e-2,
                               c: float = 0.5) -> List[float]:
    """Geometric ladder: multiply by ``c`` until ``beta_min``, then append it
    (reference :245-257 — also pt_rwm.py:40-52 on the CPU path)."""
    ladder = []
    curr = beta_0
    while curr > beta_min:
        ladder.append(curr)
        curr = curr * c
    ladder.append(beta_min)
    return ladder


@partial(jax.jit, static_argnames=("n_samples",))
def _estimate_swap_prob(target, key, beta_curr, beta_star, n_samples: int):
    """a_hat = E[min(1, exp((beta_curr - beta_star)(logpi(x*) - logpi(x))))]
    with x* tempered at beta_star and x at beta_curr (reference :356-368)."""
    k_star, k_curr = jax.random.split(key)
    samples_star = target.direct_sample(k_star, n_samples, beta_star)
    samples_curr = target.direct_sample(k_curr, n_samples, beta_curr)
    lp_star = target.log_density(samples_star)
    lp_curr = target.log_density(samples_curr)
    log_r = (beta_curr - beta_star) * (lp_star - lp_curr)
    return jnp.mean(jnp.exp(jnp.minimum(log_r, 0.0)))


def construct_iterative_ladder(target, *,
                               target_swap_acceptance_rate: float = 0.234,
                               beta_min: float = 0.01,
                               N_samples_swap_est: int = 3000,
                               tolerance: float = 0.005,
                               initial_pn: float = 0.5,
                               pn_update_power: float = -0.25,
                               max_pn_adjustment_steps: int = 100,
                               pn_clamping_range=(-10.0, 10.0),
                               convergence_failure_tolerance_factor: float = 3.0,
                               seed: int = 0,
                               verbose: bool = False) -> List[float]:
    """Iterative ladder construction (reference :283-426).

    Requires the target to implement ``direct_sample`` — mirrors the
    reference's requirement of ``draw_samples_torch`` (:271-277).
    """
    try:
        target.direct_sample(jax.random.key(0), 1)
    except NotImplementedError as e:
        raise NotImplementedError(
            "The target distribution must implement 'direct_sample(key, n, "
            "beta)' for iterative temperature ladder construction.") from e

    key = jax.random.key(seed)
    ladder = [1.0]
    beta_curr = 1.0
    probe = 0

    def log(msg):
        if verbose:
            print(msg)

    while True:
        if beta_curr <= beta_min + 1e-6:
            break
        pn = initial_pn
        n_updates = 1
        found = False
        last_beta_star = -1.0
        last_a_hat = -1.0

        for adj_iter in range(1, max_pn_adjustment_steps + 1):
            clamped = float(np.clip(pn, *pn_clamping_range))
            if beta_curr < 1e-9:
                last_beta_star = -1.0
                break
            denom = 1.0 + math.exp(clamped)
            beta_star = beta_curr / denom
            last_beta_star = beta_star
            if beta_star < beta_min:
                break

            probe += 1
            a_hat = float(_estimate_swap_prob(
                target, jax.random.fold_in(key, probe),
                jnp.asarray(beta_curr, default_float()), jnp.asarray(beta_star, default_float()),
                N_samples_swap_est))
            last_a_hat = a_hat
            log(f"  probe beta*={beta_star:.6f} a_hat={a_hat:.4f}")

            if abs(a_hat - target_swap_acceptance_rate) <= tolerance:
                ladder.append(beta_star)
                beta_curr = beta_star
                found = True
                break
            pn += (n_updates ** pn_update_power) * (a_hat - target_swap_acceptance_rate)
            n_updates += 1

        if not found:
            # convergence-failure handling (reference :385-407)
            if (adj_iter == max_pn_adjustment_steps and last_beta_star >= beta_min
                    and last_beta_star != -1.0):
                wider = tolerance * convergence_failure_tolerance_factor
                if abs(last_a_hat - target_swap_acceptance_rate) <= wider:
                    log(f"  accepting beta*={last_beta_star:.6f} at wider tol")
                    ladder.append(last_beta_star)
                    beta_curr = last_beta_star
                    continue
            break

    # finalize: append beta_min if meaningfully above it (reference :411-422)
    if ladder[-1] > beta_min + 1e-5:
        ladder.append(beta_min)
    return ladder
