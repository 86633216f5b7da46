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


def pt_vmem_block_cap(dim: int, T: int, kind: str = "Normal") -> int:
    """Largest replica block that fits VMEM: ~(4T + 14) live (dim, block) f32
    arrays (carry is double-buffered through the fori_loop and the in/out
    tiles coexist); Laplace/uniform-ball draws add 1-2 live temporaries per
    rung draw.  Also the API-side eligibility bound for Pallas cold-chain
    recording (single-block requirement)."""
    live = (4 * T + 14) + {"Normal": 0, "Laplace": 2, "UniformRadius": 4}[kind]
    return max(128, int(11e6 / (live * dim * 4)) // 128 * 128)


def _pt_body_fn(target, draw_inc, betas_ref, burn_in, swap_every, dim, T, B,
                step0):
    """The shared per-step PT body (MH phase over all rungs + sequential swap
    sweep + accounting), parametrized by the absolute step offset ``step0``
    (resume support).  Used by both the plain and the recording kernels."""
    def body(step, carry):
        # counts are exact int32 (f32 counters saturate at 2^24); the
        # float jump sums use Kahan compensation (cc/bc carries) so
        # 1e8-step accumulations don't drop small increments
        x, lp, acc, swapacc, betajump, bc, coldjump, cc = carry
        x, lp, acc = list(x), list(lp), list(acc)
        abs_step = step0 + step + 1
        post = abs_step > burn_in
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
            # full per-rung acceptance counters, matching the scan engine's
            # (T, C) accounting (kernels/pt.py accept_count)
            acc[t] = acc[t] + (post & accept).astype(jnp.int32)

        # ---- swap phase: sequential adjacent sweep (reference :594-633) --
        do_swap = post & (abs_step % swap_every == 0)
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
        return (tuple(x), tuple(lp), tuple(acc), swapacc, betajump, bc,
                tot, cc)
    return body


def _split_refs(refs, n_params, kind):
    param_refs = refs[:n_params]
    if kind == "Laplace":
        # per-rung (d, 1) Laplace scales travel as a (T, d, 1) VMEM input
        return param_refs, refs[n_params], refs[n_params + 1:]
    return param_refs, None, refs[n_params:]


def _make_kernel(treedef, shapes, n_params: int, total_steps: int,
                 burn_in: int, swap_every: int, dim: int, T: int,
                 kind: str = "Normal"):
    def kernel(seed_ref, stds_ref, betas_ref, *refs):
        param_refs, pscale_ref, rest = _split_refs(refs, n_params, kind)
        (x_ref, acc0_ref, swapacc0_ref, betajump0_ref, coldjump0_ref,
         x_out_ref, lp_out_ref, acc_ref, swapacc_ref, betajump_ref,
         coldjump_ref) = rest
        leaves = [param_refs[i][:].reshape(shapes[i]) for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        step0 = seed_ref[1]   # absolute step offset (resume; 0 fresh)
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
        acc0 = tuple(acc0_ref[t][None, :] for t in range(T))
        B = x0[0].shape[-1]
        zeros_b = jnp.zeros((1, B), jnp.float32)

        body = _pt_body_fn(target, draw_inc, betas_ref, burn_in, swap_every,
                           dim, T, B, step0)
        (x, lp, acc, swapacc, betajump, _, coldjump, _) = jax.lax.fori_loop(
            0, total_steps, body,
            (x0, lp0, acc0, swapacc0_ref[:], betajump0_ref[:],
             zeros_b, coldjump0_ref[:], zeros_b))
        for t in range(T):
            x_out_ref[t] = x[t]
            lp_out_ref[t] = lp[t][0]
            acc_ref[t] = acc[t][0]
        swapacc_ref[:] = swapacc
        betajump_ref[:] = betajump
        coldjump_ref[:] = coldjump

    return kernel


def _make_record_kernel(treedef, shapes, n_params: int, seg_steps: int,
                        n_segs: int, rem_steps: int, burn_in: int,
                        swap_every: int, dim: int, T: int,
                        kind: str = "Normal"):
    """Recording variant (single chain block): grid over trace segments with
    the ladder state + accumulators carried across segments in VMEM scratch;
    each segment writes one thinned cold-chain snapshot tile to HBM (the
    Pallas analog of the reference's chain materialization,
    pt_rwm_gpu_optimized.py:635-680)."""
    def kernel(seed_ref, stds_ref, betas_ref, *refs):
        param_refs, pscale_ref, rest = _split_refs(refs, n_params, kind)
        (x_ref, acc0_ref, swapacc0_ref, betajump0_ref, coldjump0_ref,
         x_out_ref, lp_out_ref, acc_ref, swapacc_ref, betajump_ref,
         coldjump_ref, rec_ref,
         x_s, lp_s, acc_s, swapacc_s, betajump_s, coldjump_s) = rest
        leaves = [param_refs[i][:].reshape(shapes[i]) for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        r = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + r)
        step0 = seed_ref[1]
        if kind == "Normal":
            draw_inc = lambda t, shape: _normal(shape) * stds_ref[t]
        elif kind == "Laplace":
            draw_inc = lambda t, shape: _laplace(shape, pscale_ref[t])
        else:
            draw_inc = lambda t, shape: _uniform_ball(shape, stds_ref[t])

        @pl.when(r == 0)
        def _init():
            x_s[:] = x_ref[:]
            for t in range(T):
                lp_s[t] = target.log_density_td(x_ref[t])
            acc_s[:] = acc0_ref[:]
            swapacc_s[:] = swapacc0_ref[:]
            betajump_s[:] = betajump0_ref[:]
            coldjump_s[:] = coldjump0_ref[:]

        x0 = tuple(x_s[t] for t in range(T))
        lp0 = tuple(lp_s[t][None, :] for t in range(T))
        acc0 = tuple(acc_s[t][None, :] for t in range(T))
        B = x0[0].shape[-1]
        zeros_b = jnp.zeros((1, B), jnp.float32)

        body = _pt_body_fn(target, draw_inc, betas_ref, burn_in, swap_every,
                           dim, T, B, step0 + r * seg_steps)
        carry = jax.lax.fori_loop(
            0, seg_steps, body,
            (x0, lp0, acc0, swapacc_s[:], betajump_s[:], zeros_b,
             coldjump_s[:], zeros_b))
        rec_ref[0] = carry[0][0]          # cold-chain snapshot
        if rem_steps:
            carry = jax.lax.cond(
                r == n_segs - 1,
                lambda c: jax.lax.fori_loop(seg_steps, seg_steps + rem_steps,
                                            body, c),
                lambda c: c, carry)
        x, lp, acc, swapacc, betajump, _, coldjump, _ = carry
        for t in range(T):
            x_s[t] = x[t]
            lp_s[t] = lp[t][0]
            acc_s[t] = acc[t][0]
        swapacc_s[:] = swapacc
        betajump_s[:] = betajump
        coldjump_s[:] = coldjump
        x_out_ref[:] = x_s[:]
        lp_out_ref[:] = lp_s[:]
        acc_ref[:] = acc_s[:]
        swapacc_ref[:] = swapacc_s[:]
        betajump_ref[:] = betajump_s[:]
        coldjump_ref[:] = coldjump_s[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "swap_every",
                     "block", "record_every", "record_chains", "interpret"))
def run_pt_pallas(target: Any, key, betas, *, base_variance: float = None,
                  num_chains: int, num_iterations: int, burn_in: int = 0,
                  swap_every: int = 100, init_states=None,
                  proposal: Any = None, block: int = 2048,
                  record_every: int = None, record_chains: int = 1,
                  resume_state=None, interpret: bool = False,
                  scale_multipliers=None) -> PTResult:
    """Pallas-fused PT run.  Metrics contract matches
    :func:`rwm_pt_tpu.kernels.run_pt`, including full ``(T, C)`` per-rung MH
    acceptance counters.

    ``proposal``: any of the three library proposals; the ``base_variance``
    shorthand means a Normal proposal (like the reference's PT path,
    pt_rwm_gpu_optimized.py:446-455).

    ``record_every``: thinned cold-chain recording (snapshots of rung 0 of
    the first ``record_chains`` replicas), streamed VMEM->HBM one tile per
    segment; needs the whole replica batch in one VMEM block.

    ``resume_state``: continue a previous :class:`PTState` for another
    ``num_iterations`` steps with cumulative accounting (statistical, not
    bitwise, continuation — the hardware PRNG re-seeds per segment).

    ``scale_multipliers``: optional ``(T,)`` per-rung proposal-scale
    multipliers ``c`` (effective variance ``base * c_t / beta_t``) — lets a
    scan-engine burn-in autotune hand its full tuned vector to this engine
    for the measurement phase (api/simulation.py autotune + engine='pallas')."""
    dim = target.dim
    kind = "Normal" if proposal is None else _proposal_kind(proposal)
    if proposal is None and base_variance is None:
        raise ValueError("pass either base_variance or a proposal")
    T = int(betas.shape[0]) if hasattr(betas, "shape") else len(betas)
    betas = jnp.asarray(betas, jnp.float32)
    vmem_cap = pt_vmem_block_cap(dim, T, kind)
    if record_every:
        block = num_chains    # recording requires a single replica block
    block = min(block, vmem_cap, num_chains)
    if num_chains % block:
        block = int(np.gcd(num_chains, block)) or num_chains
    n_blocks = num_chains // block

    if resume_state is not None:
        # accept the scan/API (d, T, C) state layout
        x0 = jnp.moveaxis(resume_state.x, 1, 0)          # (T, d, C)
        acc0 = resume_state.accept_count.astype(jnp.int32)        # (T, C)
        swapacc0 = resume_state.swap_accept_count[None, :].astype(jnp.int32)
        betajump0 = resume_state.sum_beta_sq_jump[None, :].astype(jnp.float32)
        coldjump0 = resume_state.sum_sq_jump_cold[None, :].astype(jnp.float32)
        step0 = resume_state.step.astype(jnp.int32)
        total = num_iterations
    else:
        if init_states is None:
            x0 = target.init_sample(jax.random.fold_in(key, 0xC0),
                                    num_chains).T
            x0 = jnp.broadcast_to(x0[None], (T, dim, num_chains))
        else:
            # accept the scan kernel's (d, T, C) layout
            xi = jnp.asarray(init_states)
            x0 = jnp.moveaxis(xi, 1, 0) if xi.shape[0] == dim else xi
        acc0 = jnp.zeros((T, num_chains), jnp.int32)
        swapacc0 = jnp.zeros((1, num_chains), jnp.int32)
        betajump0 = jnp.zeros((1, num_chains), jnp.float32)
        coldjump0 = jnp.zeros((1, num_chains), jnp.float32)
        step0 = jnp.zeros((), jnp.int32)
        total = burn_in + num_iterations
    x0 = x0.astype(jnp.float32)

    # fold the step offset into the seed: resumed segments draw fresh streams
    k_seed = jax.random.fold_in(jax.random.fold_in(key, 0x5EED), step0)
    seed = jax.random.randint(k_seed, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    seed = jnp.stack([seed[0], step0])
    # per-rung effective scales (variance/beta for Normal & Laplace,
    # radius/sqrt(beta) for UniformRadius — reference scaling laws),
    # optionally rescaled by tuned per-rung variance multipliers c
    mult = (jnp.ones_like(betas) if scale_multipliers is None
            else jnp.asarray(scale_multipliers, jnp.float32))
    extra_inputs, extra_specs = [], []
    if kind == "Normal":
        stds = jnp.sqrt(jnp.asarray(base_variance if proposal is None
                                    else proposal.base_variance_scalar,
                                    jnp.float32) * mult / betas)
    elif kind == "UniformRadius":
        stds = (jnp.asarray(proposal.base_radius, jnp.float32)
                * jnp.sqrt(mult) / jnp.sqrt(betas))
    else:  # Laplace: (T, d, 1) per-rung scale tensor
        stds = jnp.ones_like(betas)
        lap = jnp.sqrt(
            jnp.asarray(proposal.base_variance_vector, jnp.float32)[None, :]
            * mult[:, None] / betas[:, None] / 2.0).reshape(T, dim, 1)
        extra_inputs = [lap]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]

    flat_params, treedef, shapes = _flatten_params(target)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_params]
    cube_spec = pl.BlockSpec((T, dim, block), lambda *ix: (0, 0, ix[0]),
                             memory_space=pltpu.VMEM)
    rung_spec = pl.BlockSpec((T, block), lambda *ix: (0, ix[0]),
                             memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, block), lambda *ix: (0, ix[0]),
                            memory_space=pltpu.VMEM)
    interp = pltpu.InterpretParams() if interpret else False
    out_shape = [
        jax.ShapeDtypeStruct((T, dim, num_chains), jnp.float32),
        jax.ShapeDtypeStruct((T, num_chains), jnp.float32),
        jax.ShapeDtypeStruct((T, num_chains), jnp.int32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.int32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
    ]

    chain = None
    if record_every:
        if n_blocks != 1:
            raise ValueError(
                f"Pallas trace recording needs the whole replica batch in "
                f"one VMEM block: num_chains={num_chains} exceeds the "
                f"~{block}-chain cap at T={T}, dim={dim} (use the scan "
                f"engine or fewer chains)")
        n_segs = total // record_every
        rem = total - n_segs * record_every
        if n_segs == 0:
            raise ValueError("record_every exceeds the total step count")
        kernel = _make_record_kernel(treedef, shapes, len(flat_params),
                                     record_every, n_segs, rem, burn_in,
                                     swap_every, dim, T, kind)
        cube0 = pl.BlockSpec((T, dim, block), lambda r, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        rung0 = pl.BlockSpec((T, block), lambda r, *_: (0, 0),
                             memory_space=pltpu.VMEM)
        vec0 = pl.BlockSpec((1, block), lambda r, *_: (0, 0),
                            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,        # seed(+step0), stds, betas
            grid=(n_segs,),
            in_specs=param_specs + extra_specs + [cube0, rung0, vec0, vec0,
                                                  vec0],
            out_specs=[cube0, rung0, rung0, vec0, vec0, vec0,
                       pl.BlockSpec((1, dim, block), lambda r, *_: (r, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((T, dim, block), jnp.float32),
                            pltpu.VMEM((T, block), jnp.float32),
                            pltpu.VMEM((T, block), jnp.int32),
                            pltpu.VMEM((1, block), jnp.int32),
                            pltpu.VMEM((1, block), jnp.float32),
                            pltpu.VMEM((1, block), jnp.float32)],
        )
        (x_f, lp_f, acc_f, swapacc_f, betajump_f, coldjump_f,
         rec) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape + [
                jax.ShapeDtypeStruct((n_segs, dim, num_chains), jnp.float32)],
            interpret=interp,
        )(seed, stds, betas, *flat_params, *extra_inputs, x0, acc0,
          swapacc0, betajump0, coldjump0)
        chain = rec[:, :, :record_chains]
    else:
        kernel = _make_kernel(treedef, shapes, len(flat_params), total,
                              burn_in, swap_every, dim, T, kind)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,        # seed(+step0), stds, betas
            grid=(n_blocks,),
            in_specs=param_specs + extra_specs + [cube_spec, rung_spec,
                                                  vec_spec, vec_spec,
                                                  vec_spec],
            out_specs=[cube_spec, rung_spec, rung_spec, vec_spec, vec_spec,
                       vec_spec],
        )
        (x_f, lp_f, acc_f, swapacc_f, betajump_f,
         coldjump_f) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            # TPU-semantics interpreter (supports pltpu.prng_*) for CPU tests
            interpret=interp,
        )(seed, stds, betas, *flat_params, *extra_inputs, x0, acc0,
          swapacc0, betajump0, coldjump0)

    # cumulative post-burn-in normalization (resume-safe, like run_pt)
    n = jnp.maximum(step0 + total - burn_in, 1).astype(jnp.float32)
    # swap events: steps s in (burn_in, step0 + total] with s % swap_every == 0
    n_events = (step0 + total) // swap_every - burn_in // swap_every
    attempts = jnp.maximum(n_events * (T - 1), 1)
    state = PTState(
        x=jnp.moveaxis(x_f, 0, 1),     # back to the (d, T, C) convention
        logp=lp_f,
        accept_count=acc_f.astype(jnp.int32),
        swap_attempt_count=attempts.astype(jnp.int32),
        swap_accept_count=swapacc_f[0].astype(jnp.int32),
        sum_beta_sq_jump=betajump_f[0],
        sum_sq_jump_cold=coldjump_f[0],
        step=step0 + jnp.asarray(total, jnp.int32))
    return PTResult(
        state=state,
        swap_acceptance_rate=swapacc_f[0] / attempts,
        pt_esjd=betajump_f[0] / attempts,
        cold_esjd=coldjump_f[0] / n,
        acceptance_rate=acc_f / n,
        chain=chain)
