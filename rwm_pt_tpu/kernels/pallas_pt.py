"""Pallas TPU kernel: multi-step fused Parallel Tempering RWM.

PT analogue of :mod:`pallas_rwm`: each grid block holds a ``(T, dim, BLOCK)``
tile of replicas fully in VMEM and runs the whole ``burn_in + num_iterations``
loop on-chip — MH moves for every rung plus swap events — with the hardware
PRNG.  HBM sees only the initial load and the final state + accumulators.

Because everything is on-chip, the swap phase here is the reference's *exact*
sequential adjacent-pair sweep (pt_rwm_gpu_optimized.py:594-633) — pair
(0,1), then (1,2), ... — not the even/odd approximation the HBM-level scan
kernel uses; a state can cascade up the ladder within one sweep, exactly like
the reference.  Swap accounting matches :mod:`pt` (attempts = T-1 per event,
post-burn-in only, beta-space ESJD over accepted swaps).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rwm import (_flatten_params, _laplace, _normal, _proposal_kind,
                         _uniform, _uniform_ball)
from .pt import PTResult, PTState


def _make_kernel(treedef, shapes, n_params: int, total_steps: int,
                 burn_in: int, swap_every: int, dim: int, T: int,
                 kind: str = "Normal"):
    def kernel(seed_ref, stds_ref, betas_ref, *refs):
        param_refs = refs[:n_params]
        if kind == "Laplace":
            # per-rung (d, 1) Laplace scales travel as a (T, d, 1) VMEM input
            pscale_ref = refs[n_params]
            rest = refs[n_params + 1:]
        else:
            pscale_ref = None
            rest = refs[n_params:]
        (x_ref, x_out_ref, lp_out_ref, acc_ref, swapacc_ref, betajump_ref,
         coldjump_ref) = rest
        leaves = [param_refs[i][:].reshape(shapes[i]) for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        if kind == "Normal":
            draw_inc = lambda t, shape: _normal(shape) * stds_ref[t]
        elif kind == "Laplace":
            draw_inc = lambda t, shape: _laplace(shape, pscale_ref[t])
        else:  # UniformRadius: stds_ref holds per-rung effective radii
            draw_inc = lambda t, shape: _uniform_ball(shape, stds_ref[t])

        # carry per-rung arrays as tuples: functional row updates via .at[]
        # would lower to scatter, which Mosaic does not implement
        x0 = tuple(x_ref[t] for t in range(T))            # T x (d, B)
        lp0 = tuple(target.log_density_td(x0[t])[None, :] for t in range(T))
        B = x0[0].shape[-1]
        zeros_b = jnp.zeros((1, B), jnp.float32)
        zeros_i = jnp.zeros((1, B), jnp.int32)

        def body(step, carry):
            # counts are exact int32 (f32 counters saturate at 2^24); the
            # float jump sums use Kahan compensation (cc/bc carries) so
            # 1e8-step accumulations don't drop small increments
            x, lp, acc, swapacc, betajump, bc, coldjump, cc = carry
            x, lp = list(x), list(lp)
            post = step + 1 > burn_in
            cold_before = x[0]

            # ---- MH phase: every rung (unrolled over the T static rungs) ---
            for t in range(T):
                eps = draw_inc(t, (dim, B))
                prop = x[t] + eps
                lp_prop = target.log_density_td(prop)[None, :]   # (1, B)
                log_ratio = betas_ref[t] * (lp_prop - lp[t])
                u = _uniform((1, B))
                accept = (log_ratio > 0.0) | (u < jnp.exp(log_ratio))
                x[t] = jnp.where(accept, prop, x[t])
                lp[t] = jnp.where(accept, lp_prop, lp[t])
                if t == 0:
                    acc = acc + (post & accept).astype(jnp.int32)

            # ---- swap phase: sequential adjacent sweep (reference :594-633) --
            do_swap = post & ((step + 1) % swap_every == 0)
            for j in range(T - 1):
                log_swap = (betas_ref[j] - betas_ref[j + 1]) * (lp[j + 1] - lp[j])
                u = _uniform((1, B))
                sw = do_swap & (u < jnp.exp(log_swap))           # (1, B)
                xj, xk = x[j], x[j + 1]
                x[j] = jnp.where(sw, xk, xj)
                x[j + 1] = jnp.where(sw, xj, xk)
                lpj, lpk = lp[j], lp[j + 1]
                lp[j] = jnp.where(sw, lpk, lpj)
                lp[j + 1] = jnp.where(sw, lpj, lpk)
                swapacc = swapacc + sw.astype(jnp.int32)
                db = betas_ref[j] - betas_ref[j + 1]
                y = jnp.where(sw, db * db, 0.0) - bc
                tot = betajump + y
                bc = (tot - betajump) - y
                betajump = tot

            step_jump = jnp.sum(jnp.square(x[0] - cold_before), axis=0,
                                keepdims=True)
            y = jnp.where(post, step_jump, 0.0) - cc
            tot = coldjump + y
            cc = (tot - coldjump) - y
            return (tuple(x), tuple(lp), acc, swapacc, betajump, bc, tot, cc)

        (x, lp, acc, swapacc, betajump, _, coldjump, _) = jax.lax.fori_loop(
            0, total_steps, body,
            (x0, lp0, zeros_i, zeros_i, zeros_b, zeros_b, zeros_b, zeros_b))
        for t in range(T):
            x_out_ref[t] = x[t]
            lp_out_ref[t] = lp[t][0]
        acc_ref[:] = acc
        swapacc_ref[:] = swapacc
        betajump_ref[:] = betajump
        coldjump_ref[:] = coldjump

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "swap_every",
                     "block", "interpret"))
def run_pt_pallas(target: Any, key, betas, *, base_variance: float = None,
                  num_chains: int, num_iterations: int, burn_in: int = 0,
                  swap_every: int = 100, init_states=None,
                  proposal: Any = None, block: int = 2048,
                  interpret: bool = False) -> PTResult:
    """Pallas-fused PT run.  Metrics contract matches
    :func:`rwm_pt_tpu.kernels.run_pt`; per-rung MH acceptance is tracked for
    the cold rung only (rung 0) to keep the accumulator footprint small.

    ``proposal``: any of the three library proposals; the ``base_variance``
    shorthand means a Normal proposal (like the reference's PT path,
    pt_rwm_gpu_optimized.py:446-455)."""
    dim = target.dim
    kind = "Normal" if proposal is None else _proposal_kind(proposal)
    if proposal is None and base_variance is None:
        raise ValueError("pass either base_variance or a proposal")
    T = int(betas.shape[0]) if hasattr(betas, "shape") else len(betas)
    betas = jnp.asarray(betas, jnp.float32)
    # VMEM: ~ (4*T + 14) live (dim, block) f32 arrays (carry is
    # double-buffered through the fori_loop and the in/out tiles coexist);
    # Laplace/uniform-ball draws add 1-2 live temporaries per rung draw
    live = (4 * T + 14) + {"Normal": 0, "Laplace": 2, "UniformRadius": 4}[kind]
    vmem_cap = max(128, int(11e6 / (live * dim * 4)) // 128 * 128)
    block = min(block, vmem_cap, num_chains)
    if num_chains % block:
        block = int(np.gcd(num_chains, block)) or num_chains
    n_blocks = num_chains // block
    total = burn_in + num_iterations

    if init_states is None:
        x0 = target.init_sample(jax.random.fold_in(key, 0xC0), num_chains).T
        x0 = jnp.broadcast_to(x0[None], (T, dim, num_chains))
    else:
        # accept the scan kernel's (d, T, C) layout
        xi = jnp.asarray(init_states)
        x0 = jnp.moveaxis(xi, 1, 0) if xi.shape[0] == dim else xi
    x0 = x0.astype(jnp.float32)

    seed = jax.random.randint(jax.random.fold_in(key, 0x5EED), (1,),
                              0, np.iinfo(np.int32).max, dtype=jnp.int32)
    # per-rung effective scales (variance/beta for Normal & Laplace,
    # radius/sqrt(beta) for UniformRadius — reference scaling laws)
    extra_inputs, extra_specs = [], []
    if kind == "Normal":
        stds = jnp.sqrt(jnp.asarray(base_variance if proposal is None
                                    else proposal.base_variance_scalar,
                                    jnp.float32) / betas)
    elif kind == "UniformRadius":
        stds = jnp.asarray(proposal.base_radius, jnp.float32) / jnp.sqrt(betas)
    else:  # Laplace: (T, d, 1) per-rung scale tensor
        stds = jnp.ones_like(betas)
        lap = jnp.sqrt(
            jnp.asarray(proposal.base_variance_vector, jnp.float32)[None, :]
            / betas[:, None] / 2.0).reshape(T, dim, 1)
        extra_inputs = [lap]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]

    flat_params, treedef, shapes = _flatten_params(target)
    kernel = _make_kernel(treedef, shapes, len(flat_params), total, burn_in,
                          swap_every, dim, T, kind)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_params]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,        # seed, stds, betas
        grid=(n_blocks,),
        in_specs=param_specs + extra_specs + [
            pl.BlockSpec((T, dim, block), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((T, dim, block), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((1, block), lambda i, *_: (0, i),
                          memory_space=pltpu.VMEM)] * 4,
    )
    x_f, lp_f, acc_f, swapacc_f, betajump_f, coldjump_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, dim, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((T, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.int32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.int32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
        ],
        # TPU-semantics interpreter (supports pltpu.prng_*) for CPU tests
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, stds, betas, *flat_params, *extra_inputs, x0)

    n = jnp.float32(num_iterations)
    # swap events: steps s in (burn_in, total] with s % swap_every == 0
    n_events = total // swap_every - burn_in // swap_every
    attempts = max(n_events * (T - 1), 1)
    acc_count = jnp.zeros((T, num_chains), jnp.int32).at[0].set(
        acc_f[0].astype(jnp.int32))
    state = PTState(
        x=jnp.moveaxis(x_f, 0, 1),     # back to the (d, T, C) convention
        logp=lp_f,
        accept_count=acc_count,
        swap_attempt_count=jnp.asarray(attempts, jnp.int32),
        swap_accept_count=swapacc_f[0].astype(jnp.int32),
        sum_beta_sq_jump=betajump_f[0],
        sum_sq_jump_cold=coldjump_f[0],
        step=jnp.asarray(total, jnp.int32))
    return PTResult(
        state=state,
        swap_acceptance_rate=swapacc_f[0] / attempts,
        pt_esjd=betajump_f[0] / attempts,
        cold_esjd=coldjump_f[0] / n,
        acceptance_rate=acc_count / n,
        chain=None)
