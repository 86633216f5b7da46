"""Adaptive proposal-scale tuning (burn-in only).

A capability the reference lacks: it finds the ESJD-optimal proposal scale by
re-running every experiment over a 40-point scale grid
(/root/reference/experiment_RWM_GPU.py:213-243, experiment_pt_GPU.py:214).
The theory both codebases exist to study (Li, Wang, Dou, Rosenthal 2025) says
the optimum sits at acceptance ~0.234, so this module *tunes to it directly*:
during burn-in a Robbins-Monro recursion adjusts a log-scale multiplier from
the pooled windowed acceptance rate, then freezes it, leaving the post-burn-in
phase an exact MH chain (frozen adaptation keeps the stationary distribution
intact).  One run replaces the sweep.

TPU-native trick: all three proposals scale with temperature as
``variance/beta`` (Normal, Laplace) or ``radius/sqrt(beta)`` (UniformRadius)
— exactly the same law a variance multiplier ``c`` follows.  So the tuner
never rebuilds proposal pytrees inside the scan: it draws increments at an
*effective* inverse temperature ``beta / c`` while the accept ratio keeps the
true beta.  The recursion mirrors the reference's ladder-search style
(rho_{n+1} = rho_n + n^p (a_hat - a*), pt_rwm_gpu_optimized.py:373-382),
applied to log c instead of log spacing.

For PT every rung tunes its own multiplier from its own windowed acceptance —
the per-rung analog of one global sigma being right for at most one rung.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.dtypes import default_float
from .pt import PTResult, _mh_phase, _swap_phase, pt_init
from .rwm import RWMResult, _rwm_step_core, rwm_init


class AdaptiveRWMResult(NamedTuple):
    result: RWMResult
    tuned_scale_multiplier: jax.Array   # (): effective variance = base * c
    tuned_acceptance_target: float


class AdaptivePTResult(NamedTuple):
    result: PTResult
    tuned_scale_multipliers: jax.Array  # (T,) per-rung c
    tuned_acceptance_target: float


def _rm_update(log_c, window_acc, n_updates, target, power, rate):
    """One Robbins-Monro step on log c: acceptance above target means the
    steps are too timid -> grow the scale (and vice versa).  ``rate`` is the
    base gain: d(acceptance)/d(log c) is ~-0.2..-0.4 for RWM near the 0.234
    optimum, so rate~3 makes the first updates roughly Newton steps."""
    gamma = rate * jnp.power(n_updates.astype(default_float()), power)
    return log_c + gamma * (window_acc - target)


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "adapt_every",
                     "target_accept", "rm_power", "rm_rate", "unroll"))
def run_rwm_adaptive(target: Any, proposal: Any, key, *,
                     num_chains: int, num_iterations: int, burn_in: int,
                     beta: float = 1.0, target_accept: float = 0.234,
                     adapt_every: int = 100, rm_power: float = -0.5,
                     rm_rate: float = 3.0, init_states=None,
                     unroll: int = 2) -> AdaptiveRWMResult:
    """RWM with the proposal scale tuned to ``target_accept`` during burn-in.

    Post-burn-in the multiplier is frozen, so acceptance/ESJD accounting is
    exact MH at the tuned scale.  ``burn_in`` should contain at least a few
    ``adapt_every`` windows (e.g. 2000 steps of 100-step windows).
    """
    beta = jnp.asarray(beta, default_float())
    k_init, k_run = jax.random.split(jax.random.fold_in(key, 0x414454))
    state = rwm_init(target, k_init, num_chains, init_states)
    total = burn_in + num_iterations

    def one_step(carry, t):
        st, log_c, win_acc, n_upd = carry
        # the canonical fused MH step (kernels/rwm.py) with only the
        # increment draw rescaled by the current multiplier
        st, accept = _rwm_step_core(
            st, jax.random.fold_in(k_run, st.step), target, proposal, beta,
            burn_in, beta_proposal=beta / jnp.exp(log_c))
        # ---- adaptation (burn-in only, every adapt_every steps) ----
        win_acc = win_acc + jnp.mean(accept.astype(default_float()))
        do_adapt = (st.step % adapt_every == 0) & (st.step <= burn_in)
        new_log_c = _rm_update(log_c, win_acc / adapt_every, n_upd + 1,
                               target_accept, rm_power, rm_rate)
        log_c = jnp.where(do_adapt, new_log_c, log_c)
        n_upd = n_upd + do_adapt.astype(jnp.int32)
        win_acc = jnp.where(do_adapt, 0.0, win_acc)
        return (st, log_c, win_acc, n_upd), None

    carry0 = (state, jnp.zeros((), default_float()),
              jnp.zeros((), default_float()), jnp.zeros((), jnp.int32))
    (state, log_c, _, _), _ = jax.lax.scan(one_step, carry0,
                                           jnp.arange(total), unroll=unroll)
    n = jnp.maximum(state.step - burn_in, 1).astype(default_float())
    res = RWMResult(state=state,
                    acceptance_rate=state.accept_count / n,
                    esjd=state.sum_sq_jump / n,
                    chain=None)
    return AdaptiveRWMResult(result=res,
                             tuned_scale_multiplier=jnp.exp(log_c),
                             tuned_acceptance_target=target_accept)


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "swap_every",
                     "adapt_every", "target_accept", "rm_power", "rm_rate", "unroll"))
def run_pt_adaptive(target: Any, proposal: Any, key, betas, *,
                    num_chains: int, num_iterations: int, burn_in: int,
                    swap_every: int = 100, target_accept: float = 0.234,
                    adapt_every: int = 100, rm_power: float = -0.5,
                    rm_rate: float = 3.0, init_states=None,
                    unroll: int = 1) -> AdaptivePTResult:
    """PT with *per-rung* proposal scales tuned to ``target_accept``.

    The fixed-scale kernel gives every rung variance ``base/beta_t``
    (reference pt_rwm_gpu_optimized.py:446-455), which lands at 0.234 only
    where the target's local geometry matches the iid heuristic; here each
    rung steers its own multiplier from its own windowed MH acceptance during
    burn-in.  Swap phases are identical to :func:`rwm_pt_tpu.kernels.run_pt`
    (even/odd half-sweeps, post-burn-in only), and since adaptation freezes
    before burn-in ends, the sampled phase is exact MH+PT.
    """
    betas = jnp.asarray(betas, default_float())
    T = betas.shape[0]
    k_init, k_run = jax.random.split(jax.random.fold_in(key, 0x414455))
    state = pt_init(target, k_init, betas, num_chains, init_states)
    total = burn_in + num_iterations

    def one_step(carry, t):
        st, log_c, win_acc, n_upd = carry
        k_mh, k_swap = jax.random.split(jax.random.fold_in(k_run, st.step))
        step_counter = st.step + 1
        cold_before = st.x[:, 0, :]

        # the canonical fused MH phase (kernels/pt.py) at tuned per-rung
        # scales — betas/c shapes only the increments, not the accept ratio
        st, accept = _mh_phase(st, k_mh, target, proposal, betas, burn_in,
                               betas_proposal=betas / jnp.exp(log_c))
        post = step_counter > burn_in
        should_swap = (step_counter % swap_every == 0) & post
        st = jax.lax.cond(should_swap,
                          lambda s: _swap_phase(s, k_swap, betas),
                          lambda s: s, st)
        jump = jnp.sum(jnp.square(st.x[:, 0, :] - cold_before), axis=0)
        st = st.replace(
            sum_sq_jump_cold=st.sum_sq_jump_cold + jnp.where(post, jump, 0.0),
            step=step_counter)

        # ---- per-rung adaptation (burn-in only) ----
        win_acc = win_acc + jnp.mean(accept.astype(default_float()), axis=1)
        do_adapt = (step_counter % adapt_every == 0) & (step_counter <= burn_in)
        new_log_c = _rm_update(log_c, win_acc / adapt_every, n_upd + 1,
                               target_accept, rm_power, rm_rate)
        log_c = jnp.where(do_adapt, new_log_c, log_c)
        n_upd = n_upd + do_adapt.astype(jnp.int32)
        win_acc = jnp.where(do_adapt, jnp.zeros_like(win_acc), win_acc)
        return (st, log_c, win_acc, n_upd), None

    carry0 = (state, jnp.zeros((T,), default_float()),
              jnp.zeros((T,), default_float()), jnp.zeros((), jnp.int32))
    (state, log_c, _, _), _ = jax.lax.scan(one_step, carry0,
                                           jnp.arange(total), unroll=unroll)
    n = jnp.maximum(state.step - burn_in, 1).astype(default_float())
    attempts = jnp.maximum(state.swap_attempt_count, 1).astype(default_float())
    res = PTResult(
        state=state,
        swap_acceptance_rate=state.swap_accept_count / attempts,
        pt_esjd=state.sum_beta_sq_jump / attempts,
        cold_esjd=state.sum_sq_jump_cold / n,
        acceptance_rate=state.accept_count / n,
        chain=None)
    return AdaptivePTResult(result=res,
                            tuned_scale_multipliers=jnp.exp(log_c),
                            tuned_acceptance_target=target_accept)
