"""Fused Random Walk Metropolis kernel.

TPU-native replacement for the reference's single-chain GPU RWM
(``/root/reference/algorithms/rwm_gpu_optimized.py:79-580``).  Key differences,
by design:

* The reference drives one chain from a Python host loop with a per-step
  ``.item()`` device->host sync (rwm_gpu_optimized.py:289-336), capping it at
  ~3k steps/s.  Here the *entire* run is one compiled ``lax.scan``: proposal
  draw, log-density, accept/select (the reference's ``ultra_fused_mcmc_step_basic``
  kernel, rwm_gpu_optimized.py:9-32) and diagnostic accumulation all fuse into
  a single XLA program with zero host round-trips.
* Instead of one chain, a batch of ``C`` independent chains is advanced in
  lockstep, laid out ``(dim, C)`` so chains ride the 128-wide vector lanes.
  One chain per "seed" subsumes the reference's Slurm seed arrays
  (run_rwm_gpu.sbatch:9).
* Randomness is counter-based: ``fold_in(key, step)`` replaces the reference's
  pre-computed random pools (rwm_gpu_optimized.py:490-511) with zero memory.
* Acceptance counts and ESJD are accumulated online post-burn-in
  (semantics of rwm_gpu_optimized.py:327-334 and :513-534), so 10^8-step runs
  never materialize chains; a thinned trace can optionally be recorded.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct
from ..utils.dtypes import default_float


@struct.dataclass
class RWMState:
    """Carried state of a batched RWM run."""
    x: jax.Array             # (d, C) current states
    logp: jax.Array          # (C,) cached log densities (rwm.py:41-66 caching)
    accept_count: jax.Array  # (C,) int32, post burn-in accepts
    sum_sq_jump: jax.Array   # (C,) f32, post burn-in sum ||x_{t+1}-x_t||^2
    step: jax.Array          # () int32, steps taken so far


class RWMResult(NamedTuple):
    state: RWMState
    acceptance_rate: jax.Array   # (C,)
    esjd: jax.Array              # (C,)
    chain: Optional[jax.Array]   # (n_rec, d, C_rec) thinned trace or None


# per-run progress state: run_id -> (last_step, last_walltime).  Keyed by a
# runtime id derived from the run's RNG key so two simulations progressing
# concurrently in one process (even through the SAME compiled executable)
# keep independent rate estimates instead of interleaving through shared
# mutable state.  Bounded: oldest entries evicted beyond 64 live runs.
_progress_state: dict = {}


def _progress_report(run_id, step, end):
    """Host-side liveness line for ``progress_bar=True`` runs — the compiled
    analogue of the reference's samples/s prints every 1000 steps
    (rwm_gpu_optimized.py:459-467).  Invoked via ``jax.debug.callback`` from
    inside the compiled loop; rate is per chain (multiply by the chain/rung
    batch for total MH steps/s)."""
    import time
    run_id, step, end = int(run_id), int(step), int(end)
    now = time.time()
    last = _progress_state.get(run_id)
    if last and last[0] < step and last[1] < now:
        rate = (step - last[0]) / (now - last[1])
        print(f"  progress: step {step:,}/{end:,} "
              f"({rate:,.0f} steps/s/chain)", flush=True)
    else:
        print(f"  progress: step {step:,}/{end:,}", flush=True)
    while len(_progress_state) >= 64 and run_id not in _progress_state:
        _progress_state.pop(next(iter(_progress_state)))
    _progress_state[run_id] = (step, now)


def progress_run_id(key):
    """Runtime (traced) id for one run's progress state: the low 31 bits of
    the run key's counter words — unique per run with overwhelming
    probability, and computed on-device so it ships with the callback."""
    data = jax.random.key_data(key).ravel().astype(jnp.uint32)
    return (data[-1] ^ data[0] << 7 if data.shape[0] > 1
            else data[0]) & jnp.uint32(0x7FFFFFFF)


def maybe_report_progress(step, end, progress_every, run_id=0):
    """Emit a progress callback when ``step`` hits a ``progress_every``
    multiple (no-op when ``progress_every`` is falsy)."""
    if progress_every:
        jax.lax.cond(step % progress_every == 0,
                     lambda s: jax.debug.callback(_progress_report, run_id,
                                                  s, end),
                     lambda s: None, step)


def rwm_init(target, key, num_chains: int, init_states=None) -> RWMState:
    """Initialize chains with the target's init heuristic
    (reference metropolis.py:22-64)."""
    if init_states is None:
        x0 = target.init_sample(key, num_chains).T  # (d, C)
    else:
        x0 = jnp.asarray(init_states)
        if x0.ndim == 1:
            x0 = jnp.broadcast_to(x0[:, None], (target.dim, num_chains))
    logp0 = target.log_density_td(x0)
    C = x0.shape[1]
    return RWMState(x=x0, logp=logp0,
                    accept_count=jnp.zeros(C, jnp.int32),
                    sum_sq_jump=jnp.zeros(C, default_float()),
                    step=jnp.zeros((), jnp.int32))


def _rwm_step_core(state: RWMState, key, target, proposal, beta, burn_in,
                   beta_proposal=None, symmetric: bool = True):
    """One fused MH step; returns ``(new_state, accept_mask)``.

    ``beta_proposal`` optionally rescales only the increment draw (used by
    the adaptive tuner, kernels/adapt.py); the accept ratio always uses the
    true ``beta``.

    ``symmetric=False`` adds the asymmetric-MH proposal correction
    ``log q(x|y) - log q(y|x)`` to the accept ratio — the reference's
    non-symmetric branch (/root/reference/algorithms/rwm.py:59-66).  All
    library proposals are symmetric (the term is identically zero); the hook
    exists for custom asymmetric proposals and so the flag is honored rather
    than silently ignored.
    """
    k_inc, k_u = jax.random.split(key)
    C = state.x.shape[1]
    inc = proposal.sample_td(
        k_inc, beta if beta_proposal is None else beta_proposal, (C,))
    prop = state.x + inc
    lp_prop = target.log_density_td(prop)
    log_ratio = beta * (lp_prop - state.logp)
    if not symmetric:
        log_ratio = log_ratio + proposal.log_q_ratio(inc, beta)
    u = jax.random.uniform(k_u, (C,))
    accept = (log_ratio > 0.0) | (u < jnp.exp(log_ratio))

    x_new = jnp.where(accept[None, :], prop, state.x)
    lp_new = jnp.where(accept, lp_prop, state.logp)

    # post-burn-in accounting (rwm_gpu_optimized.py:327-334)
    post = state.step + 1 > burn_in
    jump = jnp.sum(jnp.square(x_new - state.x), axis=0)
    return RWMState(
        x=x_new, logp=lp_new,
        accept_count=state.accept_count + jnp.where(post, accept, False),
        sum_sq_jump=state.sum_sq_jump + jnp.where(post, jump, 0.0),
        step=state.step + 1), accept


def rwm_step(state: RWMState, key, target, proposal, beta, burn_in,
             symmetric: bool = True) -> RWMState:
    """One fused MH step for all chains.

    Accept rule ``(r > 0) | (u < exp(r))`` with ``r = beta (logpi(y)-logpi(x))``
    matches the reference kernel exactly (rwm_gpu_optimized.py:9-32); NaN from
    (-inf) - (-inf) compares False on both sides => reject, like torch.
    """
    return _rwm_step_core(state, key, target, proposal, beta, burn_in,
                          symmetric=symmetric)[0]


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in",
                     "record_every", "record_chains", "unroll", "symmetric",
                     "progress_every"),
    donate_argnames=())
def run_rwm(target: Any, proposal: Any, key, *,
            num_chains: int, num_iterations: int, burn_in: int = 0,
            beta: float = 1.0, init_states=None, resume_state=None,
            record_every: Optional[int] = None, record_chains: int = 1,
            unroll: int = 4, symmetric: bool = True,
            progress_every: Optional[int] = None) -> RWMResult:
    """Run ``burn_in + num_iterations`` fused MH steps on ``num_chains`` chains.

    Returns per-chain acceptance rate and ESJD with the reference's
    normalization: both divide by the ``num_iterations`` post-burn-in steps
    (rwm_gpu_optimized.py:327-334, :513-534).  When ``record_every`` is set,
    a thinned trace of the first ``record_chains`` chains is collected via a
    nested scan (states after every ``record_every``-th step).

    ``resume_state``: a previously returned :class:`RWMState` to continue
    from (checkpoint/resume — a capability the reference lacks, SURVEY.md §5);
    steps continue counting from ``state.step`` so burn-in gating stays
    consistent, and another ``num_iterations`` steps are run.
    """
    beta = jnp.asarray(beta, default_float())
    k_init, k_run = jax.random.split(jax.random.fold_in(key, 0x52574d))
    if resume_state is not None:
        state = resume_state
        total = num_iterations
    else:
        state = rwm_init(target, k_init, num_chains, init_states)
        total = burn_in + num_iterations

    end_step = state.step + total

    def one_step(st, t):
        # key derived from the absolute step counter so resumed runs draw
        # fresh randomness instead of replaying the first segment's stream
        st = rwm_step(st, jax.random.fold_in(k_run, st.step), target,
                      proposal, beta, burn_in, symmetric=symmetric)
        maybe_report_progress(st.step, end_step, progress_every,
                              progress_run_id(k_run))
        return st

    chain = None
    if record_every:
        n_rec = total // record_every
        rem = total - n_rec * record_every

        def outer(st, i):
            st = jax.lax.fori_loop(
                0, record_every,
                lambda j, s: one_step(s, i * record_every + j), st,
                unroll=unroll)
            return st, st.x[:, :record_chains]

        state, chain = jax.lax.scan(outer, state, jnp.arange(n_rec))
        if rem:
            state = jax.lax.fori_loop(
                0, rem, lambda j, s: one_step(s, n_rec * record_every + j),
                state, unroll=unroll)
    else:
        state = jax.lax.fori_loop(0, total, lambda t, s: one_step(s, t),
                                  state, unroll=unroll)

    # normalize by the cumulative post-burn-in step count (equals
    # num_iterations for fresh runs; stays correct across resumed segments)
    n = jnp.maximum(state.step - burn_in, 1).astype(default_float())
    return RWMResult(state=state,
                     acceptance_rate=state.accept_count / n,
                     esjd=state.sum_sq_jump / n,
                     chain=chain)
