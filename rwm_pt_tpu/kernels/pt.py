"""Fused Parallel Tempering RWM kernel.

TPU-native replacement for ``ParallelTemperingRWM_GPU_Optimized``
(``/root/reference/algorithms/pt_rwm_gpu_optimized.py:101-841``).  Design:

* State is ``(dim, T, C)``: ``T`` temperature rungs x ``C`` independent PT
  *replicas* (each replica carries a full ladder).  The chain axis is
  minor-most so it maps to TPU vector lanes; the reference has exactly one
  replica (C=1) and loops the time axis on the host.
* The per-step MH move across all rungs and replicas is one fused region:
  per-rung beta-scaled increments (replacing the per-chain Cholesky bmm at
  pt_rwm_gpu_optimized.py:86-99 — all reference proposal covariances are
  diagonal), batched log-density, and the accept/select kernel
  (``ultra_fused_parallel_mcmc_step``, pt_rwm_gpu_optimized.py:61-84).
* Replica swaps: the reference sweeps adjacent pairs sequentially with a
  device->host sync per pair (pt_rwm_gpu_optimized.py:594-633).  Here a swap
  event executes two vectorized half-sweeps — even pairs then odd pairs —
  which attempts the same T-1 adjacent pairs per event with no syncs.  Parity
  with the sequential sweep is statistical (swap-acceptance rate and
  beta-ESJD within MC error), as specified in SURVEY.md §7.
* Swap log-probability ``(beta_j - beta_k)(logpi_k - logpi_j)`` matches
  ``fused_swap_probability_calculation`` (pt_rwm_gpu_optimized.py:36-48).
  Swaps only run post-burn-in every ``swap_every`` steps (:569-571).
* ESJD accounting matches the reference: beta-space ESJD accumulates
  ``(beta_j - beta_k)^2`` per accepted swap normalized by total attempts
  (:627-633); cold-chain x-space ESJD accumulates post-burn-in squared jumps
  of rung 0 including swap moves (:772-789).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct
from ..utils.dtypes import default_float
from .rwm import maybe_report_progress, progress_run_id


@struct.dataclass
class PTState:
    x: jax.Array                 # (d, T, C)
    logp: jax.Array              # (T, C)
    accept_count: jax.Array      # (T, C) int32, post burn-in MH accepts
    swap_attempt_count: jax.Array  # () int32, per-replica swap attempts
    swap_accept_count: jax.Array   # (C,) int32
    sum_beta_sq_jump: jax.Array    # (C,) f32, beta-space ESJD numerator
    sum_sq_jump_cold: jax.Array    # (C,) f32, x-space cold-chain jumps
    step: jax.Array                # () int32


class PTResult(NamedTuple):
    state: PTState
    swap_acceptance_rate: jax.Array  # (C,)
    pt_esjd: jax.Array               # (C,) beta-space ESJD
    cold_esjd: jax.Array             # (C,) x-space cold-chain ESJD
    acceptance_rate: jax.Array       # (T, C) per-rung MH acceptance
    chain: Optional[jax.Array]       # (n_rec, d, C_rec) thinned cold trace


def pt_init(target, key, betas, num_chains: int, init_states=None) -> PTState:
    """All rungs start from the same target-specific initial point
    (reference :478-484 starts every chain at the base-class initial state)."""
    T = betas.shape[0]
    if init_states is None:
        x0 = target.init_sample(key, num_chains).T          # (d, C)
        x0 = jnp.broadcast_to(x0[:, None, :], (target.dim, T, num_chains))
    else:
        x0 = jnp.asarray(init_states)
    logp0 = target.log_density_td(x0)
    C = x0.shape[2]
    return PTState(
        x=x0, logp=logp0,
        accept_count=jnp.zeros((T, C), jnp.int32),
        swap_attempt_count=jnp.zeros((), jnp.int32),
        swap_accept_count=jnp.zeros(C, jnp.int32),
        sum_beta_sq_jump=jnp.zeros(C, default_float()),
        sum_sq_jump_cold=jnp.zeros(C, default_float()),
        step=jnp.zeros((), jnp.int32))


def _bc(v, batch_ndim: int):
    """Right-pad a per-rung vector with singleton axes so it broadcasts over
    the batch: (T,) -> (T, 1) against (T, C); a flat (T*C,) vector is
    returned untouched against a flat (T*C,) batch."""
    v = jnp.asarray(v)
    return v.reshape(v.shape + (1,) * (batch_ndim - v.ndim)) \
        if v.ndim < batch_ndim else v


def _mh_phase(state: PTState, key, target, proposal, betas, burn_in,
              rung_mask=None, betas_proposal=None, symmetric: bool = True):
    """Batched MH move — the reference's fused parallel step
    (pt_rwm_gpu_optimized.py:61-84) plus increment generation (:576-592).
    Returns ``(new_state, accept_mask)``.

    Shape-agnostic over the batch: the canonical layout is ``(T, C)``
    (``betas``/``rung_mask`` per-rung vectors broadcast via ``_bc``); the
    fast path flattens to ``(T*C,)`` with pre-expanded ``betas`` (see
    ``run_pt`` ``layout="flat"``).

    ``rung_mask``: optional bool — entries where it is False keep their
    state (used by CPU semantics, where only the hottest rung moves on swap
    steps, pt_rwm.py:169-184).
    ``betas_proposal``: optional — rescales only the increment draws
    (the adaptive tuner's per-rung scale multipliers, kernels/adapt.py); the
    accept ratio always uses the true ``betas``."""
    B = state.logp.shape
    k_inc, k_u = jax.random.split(key)
    inc = proposal.sample_td(
        k_inc, betas if betas_proposal is None else betas_proposal, B)
    prop = state.x + inc
    lp_prop = target.log_density_td(prop)                   # (*B,)
    log_ratio = _bc(betas, len(B)) * (lp_prop - state.logp)
    if not symmetric:
        # asymmetric-MH proposal correction (reference rwm.py:59-66);
        # identically zero for the symmetric library proposals
        log_ratio = log_ratio + proposal.log_q_ratio(inc, betas)
    u = jax.random.uniform(k_u, B)
    accept = (log_ratio > 0.0) | (u < jnp.exp(log_ratio))
    if rung_mask is not None:
        accept = accept & _bc(rung_mask, len(B))
    x_new = jnp.where(accept[None], prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.logp)
    post = state.step + 1 > burn_in
    return state.replace(
        x=x_new, logp=lp_new,
        accept_count=state.accept_count + jnp.where(post, accept, False)), accept


def _swap_half_sweep(x, lp, key, betas, parity):
    """Vectorized attempt of all adjacent pairs (j, j+1) with j % 2 == parity.

    Disjoint pairs swap via parity-masked shifted selects — the collective-free
    equivalent of ``fused_swap_execution_no_clone``
    (pt_rwm_gpu_optimized.py:50-59).  Returns updated (x, lp) and the
    parity-masked per-pair accept mask ``(T-1, C)``.
    """
    T, C = lp.shape
    dlp = lp[1:] - lp[:-1]                      # logpi_{j+1} - logpi_j, (T-1, C)
    dbeta = betas[:-1] - betas[1:]              # (T-1,)
    log_swap = dbeta[:, None] * dlp             # (:36-48)
    u = jax.random.uniform(key, (T - 1, C))
    acc = u < jnp.exp(log_swap)                 # NaN-safe: NaN -> reject
    pair_mask = (jnp.arange(T - 1) % 2) == parity
    acc = acc & pair_mask[:, None]

    pad = jnp.zeros((1, C), bool)
    swap_up = jnp.concatenate([acc, pad], axis=0)    # rung j takes j+1's state
    swap_dn = jnp.concatenate([pad, acc], axis=0)    # rung j+1 takes j's state

    x_up = jnp.roll(x, -1, axis=1)
    x_dn = jnp.roll(x, 1, axis=1)
    x_new = jnp.where(swap_up[None], x_up, jnp.where(swap_dn[None], x_dn, x))
    lp_up = jnp.roll(lp, -1, axis=0)
    lp_dn = jnp.roll(lp, 1, axis=0)
    lp_new = jnp.where(swap_up, lp_up, jnp.where(swap_dn, lp_dn, lp))

    return x_new, lp_new, acc


def _swap_phase(state: PTState, key, betas) -> PTState:
    """One swap event: even half-sweep, then odd half-sweep on the updated
    log-densities (mirrors the cascading of the reference's in-order sweep,
    pt_rwm_gpu_optimized.py:594-633).  Attempts T-1 pairs total per event."""
    T = betas.shape[0]
    k_even, k_odd = jax.random.split(key)
    x, lp, a0 = _swap_half_sweep(state.x, state.logp, k_even, betas, 0)
    x, lp, a1 = _swap_half_sweep(x, lp, k_odd, betas, 1)
    acc = a0 | a1                                # parities are disjoint pairs
    dbeta = betas[:-1] - betas[1:]
    return state.replace(
        x=x, logp=lp,
        swap_attempt_count=state.swap_attempt_count + (T - 1),
        swap_accept_count=state.swap_accept_count
        + jnp.sum(acc, axis=0, dtype=jnp.int32),
        sum_beta_sq_jump=state.sum_beta_sq_jump
        + jnp.sum(acc * (dbeta ** 2)[:, None], axis=0))


def _swap_phase_sequential(state: PTState, key, betas) -> PTState:
    """One swap event with the reference's exact in-order sweep over adjacent
    pairs j = 0..T-2 (pt_rwm_gpu_optimized.py:594-633): each pair's decision
    sees the states already updated by lower pairs, so a state accepted down
    at pair j can cascade through pair j+1 within the same event.  The
    even/odd half-sweeps (:func:`_swap_phase`) cascade only even->odd; the
    two orders are statistically close but not identical — at production
    precision the difference is resolvable (docs/PARITY_MATRIX.md footnotes).
    Cost: a T-1-step ``fori_loop`` of (d, 2, C) slices per swap event — at
    the reference's swap_every=100 and T<=12 this is noise next to the MH
    phase."""
    T = betas.shape[0]
    C = state.logp.shape[1]
    u = jax.random.uniform(key, (T - 1, C))
    dbeta = betas[:-1] - betas[1:]

    def pair(j, carry):
        x, lp, acc, bsq = carry
        lp_pair = jax.lax.dynamic_slice_in_dim(lp, j, 2, axis=0)   # (2, C)
        x_pair = jax.lax.dynamic_slice_in_dim(x, j, 2, axis=1)     # (d, 2, C)
        log_swap = dbeta[j] * (lp_pair[1] - lp_pair[0])            # (:36-48)
        a = u[j] < jnp.exp(log_swap)                 # NaN-safe: NaN -> reject
        x_sw = jnp.where(a[None, None, :], x_pair[:, ::-1, :], x_pair)
        lp_sw = jnp.where(a[None, :], lp_pair[::-1], lp_pair)
        return (jax.lax.dynamic_update_slice_in_dim(x, x_sw, j, axis=1),
                jax.lax.dynamic_update_slice_in_dim(lp, lp_sw, j, axis=0),
                acc + a.astype(jnp.int32),
                bsq + a * dbeta[j] ** 2)

    x, lp, acc, bsq = jax.lax.fori_loop(
        0, T - 1, pair,
        (state.x, state.logp, jnp.zeros(C, jnp.int32),
         jnp.zeros(C, default_float())))
    return state.replace(
        x=x, logp=lp,
        swap_attempt_count=state.swap_attempt_count + (T - 1),
        swap_accept_count=state.swap_accept_count + acc,
        sum_beta_sq_jump=state.sum_beta_sq_jump + bsq)


def _swap_dispatch(state: PTState, key, betas, sweep, flat_tc):
    """Run a swap sweep; with ``flat_tc=(T, C)`` the state is stored flat
    ``(d, T*C)`` and is viewed as ``(d, T, C)`` just for the sweep (row-major
    reshape: flat index t*C + c).  The reshape costs one relayout per swap
    event — amortized over ``swap_every`` MH steps."""
    if flat_tc is None:
        return sweep(state, key, betas)
    T, C = flat_tc
    d = state.x.shape[0]
    tc = state.replace(x=state.x.reshape(d, T, C),
                       logp=state.logp.reshape(T, C))
    tc = sweep(tc, key, betas)
    return state.replace(
        x=tc.x.reshape(d, T * C), logp=tc.logp.reshape(T * C),
        swap_attempt_count=tc.swap_attempt_count,
        swap_accept_count=tc.swap_accept_count,
        sum_beta_sq_jump=tc.sum_beta_sq_jump)


def pt_step(state: PTState, key, target, proposal, betas, burn_in,
            swap_every, cpu_semantics: bool = False,
            symmetric: bool = True, swap_sweep: str = "even_odd",
            flat_tc=None, betas_mh=None, betas_proposal_mh=None) -> PTState:
    """One full PT step.

    GPU semantics (default): MH move for every rung, then (conditionally) a
    swap event — chains move *and then* swap (pt_rwm_gpu_optimized.py:541-574).
    CPU semantics (``cpu_semantics=True``): on swap steps chains attempt swaps
    *instead of* MH moves, with no burn-in gate on swaps (pt_rwm.py:169-184).
    The GPU semantics produced the paper's GPU data (SURVEY.md §3.3).

    ``swap_sweep``: ``"even_odd"`` (vectorized half-sweeps, the default) or
    ``"sequential"`` (the reference's exact in-order pair sweep).

    ``flat_tc``: when set to ``(T, C)`` the state is stored flat —
    ``x: (d, T*C)``, ``logp``/``accept_count``: ``(T*C,)`` — and
    ``betas_mh`` must be the per-entry ``(T*C,)`` beta vector.  On TPU the
    canonical ``(d, T, C)`` layout wastes sublanes whenever T is not a
    multiple of the 8-row tile (T=10 occupies 10/16 rows), costing ~2.4x;
    the flat layout packs rungs into the lane axis like a plain RWM batch.

    ``betas_proposal_mh``: optional, same shape as the effective
    ``betas_mh`` — rescales only the increment draws (per-rung tuned scale
    multipliers, ``run_pt(scale_multipliers=...)``); the accept ratio
    always uses the true betas.
    """
    if swap_sweep == "sequential":
        _swap = _swap_phase_sequential
    elif swap_sweep == "even_odd":
        _swap = _swap_phase
    else:
        raise ValueError("swap_sweep must be 'even_odd' or 'sequential'")
    if betas_mh is None:
        betas_mh = betas
    T = betas.shape[0]
    C = state.logp.shape[-1] if flat_tc is None else flat_tc[1]
    k_mh, k_swap = jax.random.split(key)
    cold_before = state.x[:, :C] if flat_tc is not None else state.x[:, 0, :]
    step_counter = state.step + 1
    if cpu_semantics:
        # swap steps: rungs 0..T-2 attempt swaps instead of MH moves, but the
        # hottest rung (T-1, the reference's chain without an upper partner)
        # still takes its MH move (pt_rwm.py:175-181)
        if flat_tc is None:
            last_only = jnp.arange(T) == T - 1
        else:
            last_only = jnp.arange(T * C) >= (T - 1) * C
        is_swap_step = step_counter % swap_every == 0
        state = jax.lax.cond(
            is_swap_step,
            lambda s: _mh_phase(_swap_dispatch(s, k_swap, betas, _swap,
                                               flat_tc),
                                k_mh, target, proposal, betas_mh, burn_in,
                                rung_mask=last_only, symmetric=symmetric,
                                betas_proposal=betas_proposal_mh)[0],
            lambda s: _mh_phase(s, k_mh, target, proposal, betas_mh, burn_in,
                                symmetric=symmetric,
                                betas_proposal=betas_proposal_mh)[0],
            state)
    else:
        state, _ = _mh_phase(state, k_mh, target, proposal, betas_mh, burn_in,
                             symmetric=symmetric,
                             betas_proposal=betas_proposal_mh)
        should_swap = (step_counter % swap_every == 0) & (step_counter > burn_in)
        state = jax.lax.cond(
            should_swap,
            lambda s: _swap_dispatch(s, k_swap, betas, _swap, flat_tc),
            lambda s: s, state)
    post = step_counter > burn_in
    cold_after = state.x[:, :C] if flat_tc is not None else state.x[:, 0, :]
    jump = jnp.sum(jnp.square(cold_after - cold_before), axis=0)
    return state.replace(
        sum_sq_jump_cold=state.sum_sq_jump_cold + jnp.where(post, jump, 0.0),
        step=step_counter)


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "swap_every",
                     "record_every", "record_chains", "unroll",
                     "cpu_semantics", "symmetric", "progress_every",
                     "swap_sweep", "layout"))
def run_pt(target: Any, proposal: Any, key, betas, *,
           num_chains: int, num_iterations: int, burn_in: int = 0,
           swap_every: int = 100, init_states=None,
           record_every: Optional[int] = None, record_chains: int = 1,
           unroll: int = 2, cpu_semantics: bool = False,
           resume_state=None, symmetric: bool = True,
           progress_every: Optional[int] = None,
           swap_sweep: str = "even_odd", layout: str = "flat",
           scale_multipliers=None) -> PTResult:
    """Run ``burn_in + num_iterations`` PT steps on ``num_chains`` replicas.

    ``swap_every`` defaults to 100 like the GPU reference
    (pt_rwm_gpu_optimized.py:130).  Metrics use the reference normalizations:
    swap acceptance = accepts / attempts, beta-ESJD = sum (dbeta^2) / attempts
    (:627-633), cold ESJD = mean post-burn-in squared jump (:772-789).

    ``layout``: internal state layout for the compiled loop.  ``"flat"``
    (default) packs the rung axis into the chain/lane axis — ``(d, T*C)`` —
    which tiles the TPU vector unit like a plain RWM batch and is ~2.4x
    faster than ``"tc"`` whenever T is not a multiple of the 8-row sublane
    tile (measured 243M -> 595M MH steps/s on the 30-d T=10 headline; the
    state is viewed as ``(d, T, C)`` only inside swap events).  Use
    ``"tc"`` when inputs are mesh-sharded over a ``temps`` axis (a flat
    reshape across a sharded axis would insert per-step collectives).
    Both layouts produce bitwise-identical trajectories: the per-step keys,
    draw shapes, and arithmetic are the same up to a row-major reshape.
    The returned :class:`PTResult`/:class:`PTState` is always canonical
    ``(d, T, C)`` — checkpoints are layout-independent.

    ``scale_multipliers``: optional ``(T,)`` per-rung proposal-scale
    multipliers ``c`` (effective variance ``base * c_t / beta_t``) — the
    frozen output of a burn-in autotune (kernels/adapt.py) fed back into a
    plain run; only the increment draws are rescaled, the accept ratio
    keeps the true betas, so the sampled kernel is exact MH.
    """
    if layout not in ("flat", "tc"):
        raise ValueError("layout must be 'flat' or 'tc'")
    betas = jnp.asarray(betas, default_float())
    k_init, k_run = jax.random.split(jax.random.fold_in(key, 0x5054))
    if resume_state is not None:
        state = resume_state
        total = num_iterations
    else:
        state = pt_init(target, k_init, betas, num_chains, init_states)
        total = burn_in + num_iterations

    T = betas.shape[0]
    d, _, C = state.x.shape
    flat_tc = None
    betas_mh = None
    betas_prop = None
    if scale_multipliers is not None:
        betas_prop = betas / jnp.asarray(scale_multipliers, betas.dtype)
    if layout == "flat":
        flat_tc = (T, C)
        betas_mh = jnp.repeat(betas, C)                       # (T*C,)
        if betas_prop is not None:
            betas_prop = jnp.repeat(betas_prop, C)            # (T*C,)
        state = state.replace(x=state.x.reshape(d, T * C),
                              logp=state.logp.reshape(T * C),
                              accept_count=state.accept_count.reshape(T * C))

    end_step = state.step + total

    def one_step(st, t):
        # key by absolute step counter (resume-safe)
        st = pt_step(st, jax.random.fold_in(k_run, st.step), target,
                     proposal, betas, burn_in, swap_every, cpu_semantics,
                     symmetric=symmetric, swap_sweep=swap_sweep,
                     flat_tc=flat_tc, betas_mh=betas_mh,
                     betas_proposal_mh=betas_prop)
        maybe_report_progress(st.step, end_step, progress_every,
                              progress_run_id(k_run))
        return st

    def cold_slice(st):
        return (st.x[:, :record_chains] if flat_tc is not None
                else st.x[:, 0, :record_chains])

    chain = None
    if record_every:
        n_rec = total // record_every
        rem = total - n_rec * record_every

        def outer(st, i):
            st = jax.lax.fori_loop(
                0, record_every,
                lambda j, s: one_step(s, i * record_every + j), st,
                unroll=unroll)
            return st, cold_slice(st)

        state, chain = jax.lax.scan(outer, state, jnp.arange(n_rec))
        if rem:
            state = jax.lax.fori_loop(
                0, rem, lambda j, s: one_step(s, n_rec * record_every + j),
                state, unroll=unroll)
    else:
        state = jax.lax.fori_loop(0, total, lambda t, s: one_step(s, t),
                                  state, unroll=unroll)

    if layout == "flat":
        # restore the canonical (d, T, C) public layout
        state = state.replace(x=state.x.reshape(d, T, C),
                              logp=state.logp.reshape(T, C),
                              accept_count=state.accept_count.reshape(T, C))

    n = jnp.maximum(state.step - burn_in, 1).astype(default_float())
    attempts = jnp.maximum(state.swap_attempt_count, 1).astype(default_float())
    if cpu_semantics:
        # rungs 0..T-2 only attempt MH on non-swap steps (swap steps are the
        # post-burn-in multiples of swap_every with no burn-in gate); the
        # hottest rung attempts MH every step
        n_swap_steps = (state.step // swap_every
                        - burn_in // swap_every).astype(default_float())
        T = betas.shape[0]
        mh_attempts = jnp.where(jnp.arange(T)[:, None] == T - 1, n,
                                jnp.maximum(n - n_swap_steps, 1.0))
    else:
        mh_attempts = n
    return PTResult(
        state=state,
        swap_acceptance_rate=state.swap_accept_count / attempts,
        pt_esjd=state.sum_beta_sq_jump / attempts,
        cold_esjd=state.sum_sq_jump_cold / n,
        acceptance_rate=state.accept_count / mh_attempts,
        chain=chain)
