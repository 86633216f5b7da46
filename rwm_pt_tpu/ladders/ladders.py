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
    with x* tempered at beta_star and x at beta_curr (reference :356-368).

    Pinned to true-f32 matmul precision: on TPU the default bf16 MXU
    passes make quadratic-form log-densities a step function of beta*
    (measured ~0.009 jumps at knife-edge beta* for MVN d=20), which the
    production tolerance 1e-4 can then never satisfy — the SA build would
    stop with a spuriously short ladder."""
    with jax.default_matmul_precision("float32"):
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


@partial(jax.jit, static_argnames=("n_samples", "max_pn_steps", "max_T",
                                   "matmul_precision"))
def _device_ladder(target, key, rate, beta_min, n_samples: int,
                   tolerance, initial_pn, max_pn_steps: int,
                   fail_tol_factor, max_T: int,
                   matmul_precision: str = "float32"):
    """Whole SA ladder build as ONE compiled program (no host syncs).

    Same recurrence, stop rules and rescue path as
    :func:`construct_iterative_ladder` (reference pt_rwm_gpu_optimized.py:
    283-426), with the probe counter feeding ``fold_in`` streams.  Returns
    ``(betas (max_T,), T)``; unused slots hold ``beta_min``.
    """
    f = default_float()
    rate = jnp.asarray(rate, f)
    beta_min = jnp.asarray(beta_min, f)
    tolerance = jnp.asarray(tolerance, f)

    def probe(ctr, beta_curr, beta_star):
        # true-f32 matmul precision by default: see _estimate_swap_prob
        # (bf16 MXU passes break the tol=1e-4 production builds).  The
        # ensemble instrument passes "bfloat16" deliberately, to sample the
        # construction realizations of a quantized-matmul estimator — the
        # analogue of the reference campaign's TF32 torch builds
        # (rwm_gpu_optimized.py:148-151 enables TF32)
        with jax.default_matmul_precision(matmul_precision):
            k = jax.random.fold_in(key, ctr)
            k_star, k_curr = jax.random.split(k)
            xs = target.direct_sample(k_star, n_samples, beta_star)
            xc = target.direct_sample(k_curr, n_samples, beta_curr)
            log_r = (beta_curr - beta_star) * (target.log_density(xs)
                                               - target.log_density(xc))
            return jnp.mean(jnp.exp(jnp.minimum(log_r, 0.0)))

    def build_rung(beta_curr, ctr):
        """Inner pn-adjustment loop for one rung (reference :332-382)."""
        # state: pn, n_updates, adj_iter, found, stop, last_bstar, last_ahat, ctr
        init = (jnp.asarray(initial_pn, f), jnp.asarray(1, jnp.int32),
                jnp.asarray(0, jnp.int32), jnp.asarray(False),
                jnp.asarray(False), jnp.asarray(-1.0, f),
                jnp.asarray(-1.0, f), ctr)

        def cond(s):
            pn, nu, it, found, stop, bs, ah, c = s
            return (~found) & (~stop) & (it < max_pn_steps)

        def body(s):
            pn, nu, it, found, stop, _, _, c = s
            clamped = jnp.clip(pn, -10.0, 10.0)
            beta_star = beta_curr / (1.0 + jnp.exp(clamped))
            below = beta_star < beta_min

            def do_probe():
                a = probe(c + 1, beta_curr, beta_star)
                hit = jnp.abs(a - rate) <= tolerance
                pn_new = pn + (nu.astype(f) ** -0.25) * (a - rate)
                return (jnp.where(hit, pn, pn_new), nu + 1, it + 1, hit,
                        jnp.asarray(False), beta_star, a, c + 1)

            def stop_below():
                # reference :104: break before probing, rescue impossible
                return (pn, nu, it, jnp.asarray(False), jnp.asarray(True),
                        beta_star, jnp.asarray(-1.0, f), c)

            return jax.lax.cond(below, stop_below, do_probe)

        pn, nu, it, found, stop, bstar, ahat, c = jax.lax.while_loop(
            cond, body, init)
        exhausted = (~found) & (~stop) & (it >= max_pn_steps)
        # convergence-failure rescue (reference :385-407): only after a full
        # exhausted loop, candidate above beta_min, within the widened tol
        rescue = (exhausted & (bstar >= beta_min)
                  & (jnp.abs(ahat - rate) <= tolerance * fail_tol_factor))
        ok = found | rescue
        return ok, bstar, c

    def outer_cond(s):
        betas, t, beta_curr, ctr, done = s
        return (~done) & (beta_curr > beta_min + 1e-6) & (t < max_T - 1)

    def outer_body(s):
        betas, t, beta_curr, ctr, done = s
        ok, bstar, ctr = build_rung(beta_curr, ctr)
        betas = jnp.where(ok, betas.at[t].set(bstar), betas)
        return (betas, jnp.where(ok, t + 1, t),
                jnp.where(ok, bstar, beta_curr), ctr, ~ok)

    betas0 = jnp.full((max_T,), beta_min, f).at[0].set(1.0)
    betas, t, beta_curr, ctr, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (betas0, jnp.asarray(1, jnp.int32), jnp.asarray(1.0, f),
         jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    # finalize (reference :411-422): append beta_min if meaningfully above
    append = betas[t - 1] > beta_min + 1e-5
    betas = jnp.where(append, betas.at[t].set(beta_min), betas)
    t = jnp.where(append, t + 1, t)
    return betas, t


def construct_iterative_ladder_device(target, *,
                                      target_swap_acceptance_rate: float = 0.234,
                                      beta_min: float = 0.01,
                                      N_samples_swap_est: int = 3000,
                                      tolerance: float = 0.005,
                                      initial_pn: float = 0.5,
                                      max_pn_adjustment_steps: int = 100,
                                      convergence_failure_tolerance_factor:
                                      float = 3.0,
                                      seed: int = 0,
                                      max_T: int = 24,
                                      matmul_precision: str = "float32",
                                      ) -> List[float]:
    """Fully-on-device iterative ladder construction.

    Semantics of :func:`construct_iterative_ladder` (the reference SA build,
    pt_rwm_gpu_optimized.py:283-426), but the whole data-dependent search
    compiles to one XLA program — no per-probe host round-trip.  On the
    tunneled TPU dev chip a production-precision build (N=1e6, tol=1e-4,
    max_pn=1000) drops from ~30-90 CPU-min (host loop, cached by
    scripts/build_ladder_cache.py) to seconds-to-minutes of pure device
    time, which is what makes N>=16 construction-realization ensembles
    tractable (scripts/pt_ladder_ensemble.py).

    The probe stream (``fold_in(key, probe_counter)`` then a star/curr
    split) matches :func:`construct_iterative_ladder` exactly, so for the
    same seed the device build makes the same probe decisions and lands the
    same ladder up to f32 rounding of the scalar rho recurrence (the host
    runs it in float64; verified in tests/test_adaptive.py).  Distinct
    seeds give the independent construction realizations the ensemble
    samples.
    """
    try:
        target.direct_sample(jax.random.key(0), 1)
    except NotImplementedError as e:
        raise NotImplementedError(
            "The target distribution must implement 'direct_sample(key, n, "
            "beta)' for iterative temperature ladder construction.") from e
    betas, t = _device_ladder(
        target, jax.random.key(seed),
        target_swap_acceptance_rate, beta_min, N_samples_swap_est,
        tolerance, initial_pn, max_pn_adjustment_steps,
        convergence_failure_tolerance_factor, max_T,
        matmul_precision=matmul_precision)
    t = int(t)
    return [float(b) for b in jax.device_get(betas)[:t]]
