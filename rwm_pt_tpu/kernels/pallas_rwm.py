"""Pallas TPU kernel: multi-step fused RWM.

The ``lax.scan`` kernel (kernels/rwm.py) is already fully fused within a step,
but XLA still round-trips the chain state through HBM between scan iterations
and spends cycles on threefry random bits.  This kernel is the
"speed-of-light" variant (SURVEY.md §7 phase 9): each grid block loads a
``(dim, BLOCK)`` tile of chains into VMEM **once**, runs the entire
``burn_in + num_iterations`` step loop on-chip with the TPU hardware PRNG
(`pltpu.prng_random_bits` + Box-Muller), and writes back only the final state
and the online accumulators.  HBM traffic is O(state) instead of
O(state x steps).

Equivalent of the reference's hottest TorchScript kernel
(``ultra_fused_mcmc_step_basic``, /root/reference/algorithms/rwm_gpu_optimized.py:9-32)
fused across *steps*, which the reference explicitly could not do
(rwm_gpu_optimized.py:402-421 "sequential steps cannot be batched" — true for
one chain in time, but the whole loop can still live on-chip).

Works for any target whose ``log_density_td`` uses only elementwise ops and
axis-0 reductions (all 13 library targets).  All three reference proposals are
supported — Normal, Laplace and UniformRadius (the reference's TorchScript
sampler kernels, proposal_distributions/{normal,laplace,uniform}.py:46-101) —
drawn on-chip from the hardware PRNG.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rwm import RWMResult, RWMState

_TWO_PI = 2.0 * np.pi


def _uniform(shape):
    """U[0,1) from the hardware PRNG: top 24 bits scaled by 2^-24.

    ``prng_random_bits`` yields int32 on TPU — bitcast to uint32 first so the
    shift is logical, not arithmetic (a sign-extending shift makes half the
    "uniforms" negative, silently auto-accepting every proposal)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)  # < 2^24, so int32-exact;
    # Mosaic has no uint32->f32 cast, int32->f32 is supported
    return top24.astype(jnp.float32) * (1.0 / (1 << 24))


def _normal(shape):
    """Standard normals via Box-Muller, using BOTH outputs (cos and sin of the
    same angle are independent N(0,1)) to halve the log/trig cost — the kernel
    is VPU-transcendental-bound."""
    d = shape[0]
    half = (d + 1) // 2
    u1 = jnp.maximum(_uniform((half,) + shape[1:]), 1e-7)
    u2 = _uniform((half,) + shape[1:])
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    theta = _TWO_PI * u2
    z = jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)], axis=0)
    return z[:d]


def _laplace(shape, scale):
    """Per-dimension Laplace increments via the reference's inverse CDF
    ``X = -scale * sign(U) * log1p(max(-2|U|, -0.999999))``
    (proposal_distributions/laplace.py:46-69); U ~ U(-0.5, 0.5)."""
    u = _uniform(shape) - 0.5
    clamped = jnp.maximum(-2.0 * jnp.abs(u), -0.999999)
    return -scale * jnp.sign(u) * jnp.log1p(clamped)


def _uniform_ball(shape, radius):
    """Uniform increments in the ``radius``-ball: Gaussian direction / norm,
    radius ``R * U^(1/d)`` (proposal_distributions/uniform.py:47-73).
    ``U^(1/d)`` is computed as ``exp(log(U)/d)`` — exact incl. U=0 -> 0."""
    d = shape[0]
    dirs = _normal(shape)
    norms = jnp.sqrt(jnp.sum(dirs * dirs, axis=0, keepdims=True))
    dirs = dirs / jnp.maximum(norms, 1e-12)
    u = _uniform((1,) + tuple(shape[1:]))
    return dirs * (radius * jnp.exp(jnp.log(u) * (1.0 / d)))


def _proposal_kind(proposal) -> str:
    kind = getattr(proposal, "name", "Normal")
    if kind not in ("Normal", "Laplace", "UniformRadius"):
        raise ValueError(f"Pallas engine: unsupported proposal '{kind}'")
    return kind


def _flatten_params(target):
    """Split a target into (array leaves reshaped 2-D, treedef, orig shapes).

    Pallas kernels cannot capture traced constants, so the target's parameter
    pytree travels as explicit VMEM inputs and is rebuilt inside the kernel.
    """
    leaves, treedef = jax.tree_util.tree_flatten(target)
    shapes = [l.shape for l in leaves]
    # pad to >=2-D by prepending singleton dims (TPU wants 2-D operands);
    # the in-kernel reshape back only drops leading 1s, which Mosaic supports.
    flat = [jnp.asarray(l).reshape((1,) * max(0, 2 - l.ndim) + l.shape)
            for l in leaves]
    return flat, treedef, shapes


def _make_kernel(treedef, shapes, n_params: int, total_steps: int,
                 burn_in: int, dim: int, kind: str = "Normal"):
    def kernel(seed_ref, scale_ref, *refs):
        param_refs = refs[:n_params]
        if kind == "Laplace":
            # per-dimension Laplace scale travels as a (d, 1) VMEM input
            pscale_ref = refs[n_params]
            rest = refs[n_params + 1:]
        else:
            pscale_ref = None
            rest = refs[n_params:]
        x_ref, x_out_ref, lp_out_ref, acc_ref, jump_ref = rest
        leaves = [param_refs[i][:].reshape(shapes[i])
                  for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        # distinct stream per chain block
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        std = scale_ref[0]    # effective std (Normal) / radius (UniformRadius)
        beta = scale_ref[1]
        if kind == "Normal":
            draw_inc = lambda shape: _normal(shape) * std
        elif kind == "Laplace":
            lap_scale = pscale_ref[:]                     # (d, 1)
            draw_inc = lambda shape: _laplace(shape, lap_scale)
        else:  # UniformRadius
            draw_inc = lambda shape: _uniform_ball(shape, std)
        x0 = x_ref[:]
        lp0 = target.log_density_td(x0)[None, :]          # (1, BLOCK)
        zeros = jnp.zeros_like(lp0)
        zeros_i = jnp.zeros(lp0.shape, jnp.int32)

        def body(t, carry):
            # acc is an exact int32 counter (an f32 counter saturates at 2^24
            # accepts); jump uses Kahan compensation (jc) so 1e8-step sums
            # don't lose small increments once the running total grows
            x, lp, acc, jump, jc = carry
            eps = draw_inc(x.shape)
            prop = x + eps
            lp_prop = target.log_density_td(prop)[None, :]
            log_ratio = beta * (lp_prop - lp)
            u = _uniform(lp.shape)
            accept = (log_ratio > 0.0) | (u < jnp.exp(log_ratio))
            x_new = jnp.where(accept, prop, x)            # (1,B) -> (d,B)
            lp_new = jnp.where(accept, lp_prop, lp)
            post = t + 1 > burn_in
            acc = acc + (post & accept).astype(jnp.int32)
            step_jump = jnp.sum(jnp.square(x_new - x), axis=0, keepdims=True)
            y = jnp.where(post, step_jump, 0.0) - jc
            tot = jump + y
            jc = (tot - jump) - y
            return x_new, lp_new, acc, tot, jc

        x, lp, acc, jump, _ = jax.lax.fori_loop(
            0, total_steps, body, (x0, lp0, zeros_i, zeros, zeros))
        x_out_ref[:] = x
        lp_out_ref[:] = lp
        acc_ref[:] = acc
        jump_ref[:] = jump

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "block",
                     "interpret"))
def run_rwm_pallas(target: Any, key, *, base_variance: float = None,
                   num_chains: int, num_iterations: int, burn_in: int = 0,
                   beta: float = 1.0, init_states=None, block: int = 1024,
                   proposal: Any = None, interpret: bool = False) -> RWMResult:
    """Pallas-fused RWM run.  Same metrics contract as ``run_rwm``.

    ``proposal`` may be any of the three library proposals (Normal / Laplace /
    UniformRadius) with the reference's beta-scaling laws.  The back-compat
    ``base_variance`` shorthand means a Normal proposal with effective std
    ``sqrt(base_variance / beta)`` (reference normal.py:27-33).
    """
    dim = target.dim
    kind = "Normal" if proposal is None else _proposal_kind(proposal)
    if proposal is None and base_variance is None:
        raise ValueError("pass either base_variance or a proposal")
    # cap the block so ~11 live (dim, block) f32 arrays fit the 16MB VMEM
    # budget (measured: blk=16384 at d=30 needs 21MB and OOMs).  The Laplace
    # and uniform-ball draws keep 1-2 extra (dim, block) temporaries live
    # (sign/dirs + Box-Muller intermediates), so their caps shrink.
    bytes_per_lane = {"Normal": 44, "Laplace": 48,
                      "UniformRadius": 56}[kind] * dim
    vmem_cap = max(128, int(14e6 / bytes_per_lane) // 128 * 128)
    block = min(block, vmem_cap, num_chains)
    # gcd fallback: measured as fast as the largest-divisor search (at d=100
    # the kernel is bandwidth-bound, bigger tiles don't help) and compiles
    # much faster
    if num_chains % block:
        block = int(np.gcd(num_chains, block)) or num_chains
    n_blocks = num_chains // block
    total = burn_in + num_iterations

    if init_states is None:
        x0 = target.init_sample(jax.random.fold_in(key, 0xC0), num_chains).T
    else:
        x0 = jnp.asarray(init_states)
    x0 = x0.astype(jnp.float32)

    seed = jax.random.randint(jax.random.fold_in(key, 0x5EED), (1,),
                              0, np.iinfo(np.int32).max, dtype=jnp.int32)
    beta_arr = jnp.asarray(beta, jnp.float32)
    # per-kind effective scale (the reference's beta laws: variance/beta for
    # Normal & Laplace, radius/sqrt(beta) for UniformRadius)
    extra_inputs, extra_specs = [], []
    if kind == "Normal":
        s = jnp.sqrt(jnp.asarray(base_variance if proposal is None
                                 else proposal.base_variance_scalar,
                                 jnp.float32) / beta_arr)
    elif kind == "UniformRadius":
        s = jnp.asarray(proposal.base_radius, jnp.float32) / jnp.sqrt(beta_arr)
    else:  # Laplace: (d,) scale vector as a replicated (d, 1) VMEM input
        s = jnp.float32(1.0)
        lap = jnp.sqrt(jnp.asarray(proposal.base_variance_vector, jnp.float32)
                       / beta_arr / 2.0).reshape(dim, 1)
        extra_inputs = [lap]
        extra_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    scale = jnp.stack([s, beta_arr])

    flat_params, treedef, shapes = _flatten_params(target)
    kernel = _make_kernel(treedef, shapes, len(flat_params), total, burn_in,
                          dim, kind)
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_params]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,        # seed, scale
        grid=(n_blocks,),
        in_specs=param_specs + extra_specs + [
            pl.BlockSpec((dim, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((dim, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    x_f, lp_f, acc_f, jump_f = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.int32),
            jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
        ],
        # the TPU-semantics interpreter (supports pltpu.prng_*) for CPU tests
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, scale, *flat_params, *extra_inputs, x0)

    n = jnp.float32(num_iterations)
    state = RWMState(x=x_f, logp=lp_f[0],
                     accept_count=acc_f[0].astype(jnp.int32),
                     sum_sq_jump=jump_f[0],
                     step=jnp.asarray(total, jnp.int32))
    return RWMResult(state=state,
                     acceptance_rate=acc_f[0] / n,
                     esjd=jump_f[0] / n,
                     chain=None)
