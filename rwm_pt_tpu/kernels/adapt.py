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
from .pt import PTResult, _mh_phase, _swap_half_sweep, _swap_phase, pt_init
from .rwm import RWMResult, _rwm_step_core, rwm_init


class AdaptiveRWMResult(NamedTuple):
    result: RWMResult
    tuned_scale_multiplier: jax.Array   # (): effective variance = base * c
    tuned_acceptance_target: float


class AdaptivePTResult(NamedTuple):
    result: PTResult
    tuned_scale_multipliers: jax.Array  # (T,) per-rung c
    tuned_acceptance_target: float


class AdaptiveLadderPTResult(NamedTuple):
    result: PTResult
    tuned_betas: jax.Array              # (T,) adapted ladder
    tuned_swap_target: float


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


def _betas_from_rho(rho):
    """Ladder from per-pair log-spacings: beta_{t+1} = beta_t / (1 + e^rho_t).

    The reference's own ladder parametrization (pt_rwm_gpu_optimized.py:
    332-348) — monotone decreasing with beta_0 = 1 by construction, for any
    real rho."""
    ratios = 1.0 / (1.0 + jnp.exp(rho))
    return jnp.concatenate([jnp.ones((1,), rho.dtype), jnp.cumprod(ratios)])


def _measured_swap(state, key, betas):
    """Swap event that mixes the state but touches NO official counters;
    returns the per-pair pooled acceptance (T-1,) for the ladder tuner."""
    k_even, k_odd = jax.random.split(key)
    x, lp, a0 = _swap_half_sweep(state.x, state.logp, k_even, betas, 0)
    x, lp, a1 = _swap_half_sweep(x, lp, k_odd, betas, 1)
    pair_acc = jnp.mean((a0 | a1).astype(default_float()), axis=1)
    return state.replace(x=x, logp=lp), pair_acc


@functools.partial(
    jax.jit,
    static_argnames=("num_rungs", "num_chains", "num_iterations", "burn_in",
                     "swap_every", "adapt_swap_every", "adapt_every",
                     "target_swap_accept", "beta_min", "rm_power", "rm_rate",
                     "rho_clamp", "unroll"))
def run_pt_ladder_adaptive(target: Any, proposal: Any, key, *,
                           num_rungs: int, num_chains: int,
                           num_iterations: int, burn_in: int,
                           swap_every: int = 100, adapt_swap_every: int = 10,
                           adapt_every: int = 100,
                           target_swap_accept: float = 0.234,
                           beta_min: float = 0.01, rm_power: float = -0.5,
                           rm_rate: float = 3.0, rho_clamp: float = 10.0,
                           init_states=None,
                           unroll: int = 1) -> AdaptiveLadderPTResult:
    """PT with the temperature ladder itself adapted during burn-in.

    The reference's iterative ladder construction (SURVEY.md §3.4) needs the
    target to implement a tempered direct sampler and raises otherwise
    (pt_rwm_gpu_optimized.py:271-277) — FullRosenbrock, NealFunnel and
    SuperFunnel are stuck with geometric ladders.  This kernel removes that
    restriction: it measures swap acceptance on the *running chains* instead
    of on direct samples, so it works for every target.

    Mechanics: the ladder is parametrized by per-pair log-spacings rho
    (T-1,), beta_{t+1} = beta_t / (1 + e^rho_t) — the reference's own ladder
    recurrence.  During burn-in, swap events fire every ``adapt_swap_every``
    steps purely for measurement (they mix the state but are excluded from
    the official swap statistics); every ``adapt_every`` steps a per-pair
    Robbins-Monro step moves rho_t by gamma_n (a_hat_t - a*): acceptance
    above target means the rungs are closer than they need to be, so the
    spacing grows.  The recursion is the stochastic-approximation update of
    pt_rwm_gpu_optimized.py:373-382 applied per-pair and in-run.  After
    burn-in the ladder freezes and the sampled phase is exact PT with the
    reference's accounting (swap events every ``swap_every``).

    Initial ladder: geometric from 1 to ``beta_min`` over ``num_rungs`` rungs
    (the reference's fallback, :245-257).  ``burn_in`` needs at least a few
    ``adapt_every`` windows, each containing adapt_every/adapt_swap_every
    measurement events.
    """
    if adapt_every % adapt_swap_every:
        raise ValueError("adapt_every must be a multiple of adapt_swap_every")
    T = num_rungs
    f = default_float()
    # rho0 from the geometric ratio r = beta_min^(1/(T-1)): 1/(1+e^rho) = r
    r = float(beta_min) ** (1.0 / max(T - 1, 1))
    rho0 = jnp.full((T - 1,), jnp.log(1.0 / r - 1.0), f)

    k_init, k_run = jax.random.split(jax.random.fold_in(key, 0x4C414444))
    state = pt_init(target, k_init, _betas_from_rho(rho0), num_chains,
                    init_states)
    total = burn_in + num_iterations
    meas_per_window = adapt_every // adapt_swap_every

    def one_step(carry, t):
        st, rho, win, n_upd = carry
        betas_cur = _betas_from_rho(rho)
        k_mh, k_meas, k_swap = jax.random.split(
            jax.random.fold_in(k_run, st.step), 3)
        step_counter = st.step + 1
        cold_before = st.x[:, 0, :]
        in_burn = step_counter <= burn_in

        st, _ = _mh_phase(st, k_mh, target, proposal, betas_cur, burn_in)

        # measurement swaps (burn-in only): mix the state, feed the tuner
        do_meas = in_burn & (step_counter % adapt_swap_every == 0)
        st, pair_acc = jax.lax.cond(
            do_meas,
            lambda s: _measured_swap(s, k_meas, betas_cur),
            lambda s: (s, jnp.zeros((T - 1,), f)), st)
        win = win + pair_acc

        # production swaps (post-burn-in, official accounting)
        should_swap = (~in_burn) & (step_counter % swap_every == 0)
        st = jax.lax.cond(should_swap,
                          lambda s: _swap_phase(s, k_swap, betas_cur),
                          lambda s: s, st)

        # per-pair Robbins-Monro on the log-spacings (burn-in only)
        do_adapt = in_burn & (step_counter % adapt_every == 0)
        new_rho = jnp.clip(
            _rm_update(rho, win / meas_per_window, n_upd + 1,
                       target_swap_accept, rm_power, rm_rate),
            -rho_clamp, rho_clamp)
        rho = jnp.where(do_adapt, new_rho, rho)
        n_upd = n_upd + do_adapt.astype(jnp.int32)
        win = jnp.where(do_adapt, jnp.zeros_like(win), win)

        post = step_counter > burn_in
        jump = jnp.sum(jnp.square(st.x[:, 0, :] - cold_before), axis=0)
        st = st.replace(
            sum_sq_jump_cold=st.sum_sq_jump_cold + jnp.where(post, jump, 0.0),
            step=step_counter)
        return (st, rho, win, n_upd), None

    carry0 = (state, rho0, jnp.zeros((T - 1,), f), jnp.zeros((), jnp.int32))
    (state, rho, _, _), _ = jax.lax.scan(one_step, carry0, jnp.arange(total),
                                         unroll=unroll)
    n = jnp.maximum(state.step - burn_in, 1).astype(f)
    attempts = jnp.maximum(state.swap_attempt_count, 1).astype(f)
    res = PTResult(
        state=state,
        swap_acceptance_rate=state.swap_accept_count / attempts,
        pt_esjd=state.sum_beta_sq_jump / attempts,
        cold_esjd=state.sum_sq_jump_cold / n,
        acceptance_rate=state.accept_count / n,
        chain=None)
    return AdaptiveLadderPTResult(result=res,
                                  tuned_betas=_betas_from_rho(rho),
                                  tuned_swap_target=target_swap_accept)
