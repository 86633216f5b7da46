"""Pallas TPU kernel: multi-step fused RWM.

The ``lax.scan`` kernel (kernels/rwm.py) is already fully fused within a step,
but XLA still round-trips the chain state through HBM between scan iterations
and spends cycles on threefry random bits.  This kernel is the
"speed-of-light" variant (SURVEY.md §7 phase 9): each grid block loads a
``(dim, BLOCK)`` tile of chains into VMEM **once**, runs the entire
``burn_in + num_iterations`` step loop on-chip with the TPU hardware PRNG
(`pltpu.prng_random_bits` + inverse-CDF normals), and writes back only the final state
and the online accumulators.  HBM traffic is O(state) instead of
O(state x steps).

Equivalent of the reference's hottest TorchScript kernel
(``ultra_fused_mcmc_step_basic``, /root/reference/algorithms/rwm_gpu_optimized.py:9-32)
fused across *steps*, which the reference explicitly could not do
(rwm_gpu_optimized.py:402-421 "sequential steps cannot be batched" — true for
one chain in time, but the whole loop can still live on-chip).

Works for any target whose ``log_density_td`` uses only elementwise ops and
axis-0 reductions (all 14 registry targets).  All three reference proposals are
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


def _normal_bm(shape):
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


# Giles (2010), "Approximating the erfinv function": the single-precision
# branchy rational-free polynomial XLA itself uses to lower ErfInv on GPUs.
# Per normal: 1 log + 1 sqrt + ~18 FMA + 1 select — no divisions, no trig.
_GILES_P1 = (2.81022636e-08, 3.43273939e-07, -3.5233877e-06,
             -4.39150654e-06, 0.00021858087, -0.00125372503,
             -0.00417768164, 0.246640727, 1.50140941)
_GILES_P2 = (-0.000200214257, 0.000100950558, 0.00134934322,
             -0.00367342844, 0.00573950773, -0.0076224613,
             0.00943887047, 1.00167406, 2.83297682)


def _erfinv_giles(x):
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-37))
    wc = w - 2.5                 # central branch argument (w < 5)
    wt = jnp.sqrt(w) - 3.0       # tail branch argument
    pc = jnp.full_like(x, _GILES_P1[0])
    pt = jnp.full_like(x, _GILES_P2[0])
    for c1, c2 in zip(_GILES_P1[1:], _GILES_P2[1:]):
        pc = pc * wc + c1
        pt = pt * wt + c2
    return x * jnp.where(w < 5.0, pc, pt)


_SQRT2 = float(np.sqrt(2.0))

# Cephes logf minimax polynomial for log(1+f), f in [sqrt(1/2)-1, sqrt(2)-1]
# (~1 ulp in f32); used by the bit-trick log below.
_LOGF_P = (7.0376836292e-2, -1.1514610310e-1, 1.1676998740e-1,
           -1.2420140846e-1, 1.4249322787e-1, -1.6668057665e-1,
           2.0000714765e-1, -2.4999993993e-1, 3.3333331174e-1)
_LN2 = 0.6931471805599453


def _fast_log(y):
    """log(y) for finite y > 0 via exponent extraction + mantissa
    polynomial — pure integer/FMA ops, no transcendental-unit call.
    Accuracy ~1-2 f32 ulp (Cephes logf scheme): y = m 2^e with
    m in [sqrt(1/2), sqrt(2)), log y = e ln2 + log m."""
    bits = pltpu.bitcast(y, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = pltpu.bitcast((bits & 0x007FFFFF) | 0x3F800000, jnp.float32)
    big = m > 1.41421356
    m = jnp.where(big, m * 0.5, m)
    e = (e + big).astype(jnp.float32)
    f = m - 1.0
    p = jnp.full_like(f, _LOGF_P[0])
    for c in _LOGF_P[1:]:
        p = p * f + c
    f2 = f * f
    return (f2 * f) * p - 0.5 * f2 + f + e * _LN2


def _normal_icdf_fastlog(shape):
    """ICDF normals with the bit-trick log replacing the transcendental
    log in the Giles erfinv — the draw's last transcendental-unit call
    besides sqrt.  Same distribution to f32 accuracy."""
    u = _uniform(shape)
    x = 2.0 * u - 1.0 + (1.0 / (1 << 24))
    w = -_fast_log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-37))
    wc = w - 2.5
    wt = jnp.sqrt(w) - 3.0
    pc = jnp.full_like(x, _GILES_P1[0])
    pt = jnp.full_like(x, _GILES_P2[0])
    for c1, c2 in zip(_GILES_P1[1:], _GILES_P2[1:]):
        pc = pc * wc + c1
        pt = pt * wt + c2
    return _SQRT2 * x * jnp.where(w < 5.0, pc, pt)


def _normal_icdf(shape):
    """Standard normals via the inverse CDF: z = sqrt(2) erfinv(2u - 1),
    with the Giles single-precision polynomial.  An exact-in-distribution
    alternative to Box-Muller that trades sin+cos for pure FMA chains —
    which of the two wins is a property of the VPU transcendental unit and
    is measured, not assumed (scripts/bench_normal_impl.py)."""
    u = _uniform(shape)
    return _SQRT2 * _erfinv_giles(2.0 * u - 1.0 + (1.0 / (1 << 24)))


def _normal_laxerfinv(shape):
    """Inverse CDF via jax.lax.erf_inv — whatever lowering Mosaic picks."""
    u = _uniform(shape)
    return _SQRT2 * jax.lax.erf_inv(2.0 * u - 1.0 + (1.0 / (1 << 24)))


def _normal_fake_uniform(shape):
    """NOT a normal: variance-matched uniform (u - 0.5) * sqrt(12).  Only
    for roofline probing (scripts/bench_normal_impl.py): timing the kernel
    with this draw isolates the transcendental cost of the real normal —
    never statistically valid for sampling."""
    return (_uniform(shape) - 0.5) * float(np.sqrt(12.0))


_NORMAL_IMPLS = {
    "bm": _normal_bm,
    "icdf": _normal_icdf,
    "icdf_fastlog": _normal_icdf_fastlog,
    "lax_erfinv": _normal_laxerfinv,
    "fake_uniform": _normal_fake_uniform,
}

# Module-level override, read at TRACE time: to force an impl, set it before
# the first kernel call of the process (scripts/bench_normal_impl.py runs one
# subprocess per impl — an already-jitted kernel won't retrace on a global
# change).  The default "auto" resolves per (kernel, block) from the measured
# decision matrix (round 5, data/rwm_impl_block.json + data/normal_impl_bench
# .json, docs/PERFORMANCE.md normal-draw table): the ICDF Giles-polynomial
# draw is the fastest exact draw wherever its extra VMEM temporaries don't
# spill the block (PT always — its VMEM cap keeps blocks small — and RWM at
# block <= 1024: 1.28B MH steps/s at block 512 vs Box-Muller's 1.07B), while
# Box-Muller wins at the large RWM blocks the ICDF temporaries spill
# (bm 824M vs icdf 646M at block 8192).  Distributional exactness of both is
# gated by tests/test_pallas_kernels.py::test_normal_impl_* and the
# smoke-gate invariance check.
NORMAL_IMPL = "auto"


def resolve_normal_impl(kernel: str, block: int) -> str:
    """The (kernel, block) -> draw-impl DECISION (measured, not a knob).

    Honors a non-"auto" ``NORMAL_IMPL`` module override; otherwise: PT uses
    the ICDF draw unconditionally (+26% on the headline bench), RWM uses it
    up to block 1024 and Box-Muller above (the spill crossover measured in
    data/rwm_impl_block.json — see scripts/bench_rwm_impl_block.py)."""
    if NORMAL_IMPL != "auto":
        return NORMAL_IMPL
    if kernel == "pt":
        return "icdf"
    return "icdf" if block <= 1024 else "bm"


def _normal(shape, impl: str = None):
    if impl is None or impl == "auto":
        impl = NORMAL_IMPL if NORMAL_IMPL != "auto" else "icdf"
    return _NORMAL_IMPLS[impl](shape)


def _laplace(shape, scale):
    """Per-dimension Laplace increments via the reference's inverse CDF
    ``X = -scale * sign(U) * log1p(max(-2|U|, -0.999999))``
    (proposal_distributions/laplace.py:46-69); U ~ U(-0.5, 0.5)."""
    u = _uniform(shape) - 0.5
    clamped = jnp.maximum(-2.0 * jnp.abs(u), -0.999999)
    return -scale * jnp.sign(u) * jnp.log1p(clamped)


def _uniform_ball(shape, radius, impl: str = None):
    """Uniform increments in the ``radius``-ball: Gaussian direction / norm,
    radius ``R * U^(1/d)`` (proposal_distributions/uniform.py:47-73).
    ``U^(1/d)`` is computed as ``exp(log(U)/d)`` — exact incl. U=0 -> 0."""
    d = shape[0]
    dirs = _normal(shape, impl)
    norms = jnp.sqrt(jnp.sum(dirs * dirs, axis=0, keepdims=True))
    dirs = dirs / jnp.maximum(norms, 1e-12)
    u = _uniform((1,) + tuple(shape[1:]))
    return dirs * (radius * jnp.exp(jnp.log(u) * (1.0 / d)))


def rwm_vmem_block_cap(dim: int, kind: str = "Normal") -> int:
    """Largest chain block that fits VMEM: ~11 live (dim, block) f32 arrays
    within the 16MB budget (measured: blk=16384 at d=30 needs 21MB and OOMs).
    The Laplace and uniform-ball draws keep 1-2 extra (dim, block)
    temporaries live (sign/dirs + Box-Muller intermediates), so their caps
    shrink.  Also the API-side eligibility bound for Pallas trace recording
    (which needs the whole batch in one block)."""
    bytes_per_lane = {"Normal": 44, "Laplace": 48,
                      "UniformRadius": 56}[kind] * dim
    return max(128, int(14e6 / bytes_per_lane) // 128 * 128)


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
                 burn_in: int, dim: int, kind: str = "Normal",
                 normal_impl: str = None):
    def kernel(seed_ref, scale_ref, *refs):
        param_refs = refs[:n_params]
        if kind == "Laplace":
            # per-dimension Laplace scale travels as a (d, 1) VMEM input
            pscale_ref = refs[n_params]
            rest = refs[n_params + 1:]
        else:
            pscale_ref = None
            rest = refs[n_params:]
        (x_ref, acc0_ref, jump0_ref,
         x_out_ref, lp_out_ref, acc_ref, jump_ref) = rest
        leaves = [param_refs[i][:].reshape(shapes[i])
                  for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        # distinct stream per chain block; resumed segments re-seed from a
        # fresh fold of the host key (statistical, not bitwise, continuation)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        step0 = seed_ref[1]   # absolute step offset (resume; 0 for fresh runs)
        std = scale_ref[0]    # effective std (Normal) / radius (UniformRadius)
        beta = scale_ref[1]
        if kind == "Normal":
            draw_inc = lambda shape: _normal(shape, normal_impl) * std
        elif kind == "Laplace":
            lap_scale = pscale_ref[:]                     # (d, 1)
            draw_inc = lambda shape: _laplace(shape, lap_scale)
        else:  # UniformRadius
            draw_inc = lambda shape: _uniform_ball(shape, std, normal_impl)
        x0 = x_ref[:]
        lp0 = target.log_density_td(x0)[None, :]          # (1, BLOCK)
        zeros = jnp.zeros_like(lp0)

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
            post = step0 + t + 1 > burn_in
            acc = acc + (post & accept).astype(jnp.int32)
            step_jump = jnp.sum(jnp.square(x_new - x), axis=0, keepdims=True)
            y = jnp.where(post, step_jump, 0.0) - jc
            tot = jump + y
            jc = (tot - jump) - y
            return x_new, lp_new, acc, tot, jc

        x, lp, acc, jump, _ = jax.lax.fori_loop(
            0, total_steps, body, (x0, lp0, acc0_ref[:], jump0_ref[:], zeros))
        x_out_ref[:] = x
        lp_out_ref[:] = lp
        acc_ref[:] = acc
        jump_ref[:] = jump

    return kernel


def _make_record_kernel(treedef, shapes, n_params: int, seg_steps: int,
                        n_segs: int, rem_steps: int, burn_in: int, dim: int,
                        kind: str = "Normal", normal_impl: str = None):
    """Recording variant: grid over ``n_segs`` trace segments (single chain
    block).  Chain state and accumulators persist across grid steps in VMEM
    scratch; each segment runs ``seg_steps`` on-chip steps and writes one
    thinned snapshot tile to HBM — the periodic VMEM->HBM output tiling that
    gives the Pallas engine the scan engine's ``record_every`` capability
    (reference chain materialization: rwm_gpu_optimized.py:224-243)."""
    def kernel(seed_ref, scale_ref, *refs):
        param_refs = refs[:n_params]
        if kind == "Laplace":
            pscale_ref = refs[n_params]
            rest = refs[n_params + 1:]
        else:
            pscale_ref = None
            rest = refs[n_params:]
        (x_ref, acc0_ref, jump0_ref,
         x_out_ref, lp_out_ref, acc_ref, jump_ref, rec_ref,
         x_s, lp_s, acc_s, jump_s) = rest
        leaves = [param_refs[i][:].reshape(shapes[i])
                  for i in range(n_params)]
        target = jax.tree_util.tree_unflatten(treedef, leaves)
        r = pl.program_id(0)
        # seed once per segment with a distinct per-segment stream; segments
        # run sequentially so the scratch carry is exact
        pltpu.prng_seed(seed_ref[0] + r)
        step0 = seed_ref[1]
        std = scale_ref[0]
        beta = scale_ref[1]
        if kind == "Normal":
            draw_inc = lambda shape: _normal(shape, normal_impl) * std
        elif kind == "Laplace":
            lap_scale = pscale_ref[:]
            draw_inc = lambda shape: _laplace(shape, lap_scale)
        else:
            draw_inc = lambda shape: _uniform_ball(shape, std, normal_impl)

        @pl.when(r == 0)
        def _init():
            x_s[:] = x_ref[:]
            lp_s[:] = target.log_density_td(x_ref[:])[None, :]
            acc_s[:] = acc0_ref[:]
            jump_s[:] = jump0_ref[:]

        def body(t, carry):
            x, lp, acc, jump = carry
            eps = draw_inc(x.shape)
            prop = x + eps
            lp_prop = target.log_density_td(prop)[None, :]
            log_ratio = beta * (lp_prop - lp)
            u = _uniform(lp.shape)
            accept = (log_ratio > 0.0) | (u < jnp.exp(log_ratio))
            x_new = jnp.where(accept, prop, x)
            lp_new = jnp.where(accept, lp_prop, lp)
            post = step0 + r * seg_steps + t + 1 > burn_in
            acc = acc + (post & accept).astype(jnp.int32)
            step_jump = jnp.sum(jnp.square(x_new - x), axis=0, keepdims=True)
            jump = jump + jnp.where(post, step_jump, 0.0)
            return x_new, lp_new, acc, jump

        x, lp, acc, jump = jax.lax.fori_loop(
            0, seg_steps, body, (x_s[:], lp_s[:], acc_s[:], jump_s[:]))
        rec_ref[0] = x                    # snapshot after (r+1)*seg_steps
        if rem_steps:                     # trailing non-recorded remainder
            @pl.when(r == n_segs - 1)
            def _tail():
                xr, lpr, accr, jumpr = jax.lax.fori_loop(
                    seg_steps, seg_steps + rem_steps, body, (x, lp, acc, jump))
                x_s[:] = xr
                lp_s[:] = lpr
                acc_s[:] = accr
                jump_s[:] = jumpr

            @pl.when(r < n_segs - 1)
            def _keep():
                x_s[:] = x
                lp_s[:] = lp
                acc_s[:] = acc
                jump_s[:] = jump
        else:
            x_s[:] = x
            lp_s[:] = lp
            acc_s[:] = acc
            jump_s[:] = jump
        x_out_ref[:] = x_s[:]
        lp_out_ref[:] = lp_s[:]
        acc_ref[:] = acc_s[:]
        jump_ref[:] = jump_s[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_chains", "num_iterations", "burn_in", "block",
                     "record_every", "record_chains", "interpret"))
def run_rwm_pallas(target: Any, key, *, base_variance: float = None,
                   num_chains: int, num_iterations: int, burn_in: int = 0,
                   beta: float = 1.0, init_states=None, block: int = 512,
                   proposal: Any = None, record_every: int = None,
                   record_chains: int = 1, resume_state=None,
                   interpret: bool = False) -> RWMResult:
    """Pallas-fused RWM run.  Same metrics contract as ``run_rwm``.

    ``proposal`` may be any of the three library proposals (Normal / Laplace /
    UniformRadius) with the reference's beta-scaling laws.  The back-compat
    ``base_variance`` shorthand means a Normal proposal with effective std
    ``sqrt(base_variance / beta)`` (reference normal.py:27-33).

    ``record_every``: thinned-trace recording like ``run_rwm`` — snapshots of
    the first ``record_chains`` chains after every ``record_every``-th step,
    streamed VMEM->HBM one tile per segment.  Requires the whole chain batch
    to fit a single VMEM block.

    ``resume_state``: continue a previous :class:`RWMState` for another
    ``num_iterations`` steps with cumulative accounting.  Continuation is
    *statistical*, not bitwise (the hardware PRNG re-seeds per segment),
    matching this engine's general PRNG contract vs the scan engine.
    """
    dim = target.dim
    kind = "Normal" if proposal is None else _proposal_kind(proposal)
    if proposal is None and base_variance is None:
        raise ValueError("pass either base_variance or a proposal")
    vmem_cap = rwm_vmem_block_cap(dim, kind)
    if record_every:
        block = num_chains    # recording requires a single chain block
    block = min(block, vmem_cap, num_chains)
    # gcd fallback: measured as fast as the largest-divisor search (at d=100
    # the kernel is bandwidth-bound, bigger tiles don't help) and compiles
    # much faster
    if num_chains % block:
        block = int(np.gcd(num_chains, block)) or num_chains
    n_blocks = num_chains // block
    # draw-impl decision follows the FINAL block (single-block recording runs
    # can exceed the auto crossover)
    normal_impl = resolve_normal_impl("rwm", block)

    if resume_state is not None:
        x0 = resume_state.x
        acc0 = resume_state.accept_count[None, :].astype(jnp.int32)
        jump0 = resume_state.sum_sq_jump[None, :].astype(jnp.float32)
        step0 = resume_state.step.astype(jnp.int32)
        total = num_iterations
    else:
        if init_states is None:
            x0 = target.init_sample(jax.random.fold_in(key, 0xC0),
                                    num_chains).T
        else:
            x0 = jnp.asarray(init_states)
        acc0 = jnp.zeros((1, num_chains), jnp.int32)
        jump0 = jnp.zeros((1, num_chains), jnp.float32)
        step0 = jnp.zeros((), jnp.int32)
        total = burn_in + num_iterations
    x0 = x0.astype(jnp.float32)

    # fold the absolute step offset into the seed so a resumed segment draws
    # a fresh stream instead of replaying the first segment's
    k_seed = jax.random.fold_in(jax.random.fold_in(key, 0x5EED), step0)
    seed = jax.random.randint(k_seed, (1,), 0, np.iinfo(np.int32).max,
                              dtype=jnp.int32)
    seed = jnp.stack([seed[0], step0])
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
    param_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat_params]
    vec_spec = pl.BlockSpec((1, block), lambda *ix: (0, ix[0]),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((dim, block), lambda *ix: (0, ix[0]),
                            memory_space=pltpu.VMEM)
    interp = pltpu.InterpretParams() if interpret else False
    out_shape = [
        jax.ShapeDtypeStruct((dim, num_chains), jnp.float32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.int32),
        jax.ShapeDtypeStruct((1, num_chains), jnp.float32),
    ]

    chain = None
    if record_every:
        if n_blocks != 1:
            raise ValueError(
                f"Pallas trace recording needs the whole chain batch in one "
                f"VMEM block: num_chains={num_chains} exceeds the "
                f"~{block}-chain cap at dim={dim} (use the scan engine or "
                f"fewer chains)")
        n_segs = total // record_every
        rem = total - n_segs * record_every
        if n_segs == 0:
            raise ValueError("record_every exceeds the total step count")
        kernel = _make_record_kernel(treedef, shapes, len(flat_params),
                                     record_every, n_segs, rem, burn_in, dim,
                                     kind, normal_impl)
        # single chain block: the grid runs over trace segments, so all
        # state/accumulator tiles pin to block 0; only the trace output
        # advances with the segment index
        vec0 = pl.BlockSpec((1, block), lambda r, *_: (0, 0),
                            memory_space=pltpu.VMEM)
        mat0 = pl.BlockSpec((dim, block), lambda r, *_: (0, 0),
                            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,        # seed(+step0), scale
            grid=(n_segs,),
            in_specs=param_specs + extra_specs + [mat0, vec0, vec0],
            out_specs=[mat0, vec0, vec0, vec0,
                       pl.BlockSpec((1, dim, block), lambda r, *_: (r, 0, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((dim, block), jnp.float32),
                            pltpu.VMEM((1, block), jnp.float32),
                            pltpu.VMEM((1, block), jnp.int32),
                            pltpu.VMEM((1, block), jnp.float32)],
        )
        x_f, lp_f, acc_f, jump_f, rec = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape + [
                jax.ShapeDtypeStruct((n_segs, dim, num_chains), jnp.float32)],
            interpret=interp,
        )(seed, scale, *flat_params, *extra_inputs, x0, acc0, jump0)
        chain = rec[:, :, :record_chains]
    else:
        kernel = _make_kernel(treedef, shapes, len(flat_params), total,
                              burn_in, dim, kind, normal_impl)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,        # seed(+step0), scale
            grid=(n_blocks,),
            in_specs=param_specs + extra_specs + [mat_spec, vec_spec,
                                                  vec_spec],
            out_specs=[mat_spec, vec_spec, vec_spec, vec_spec],
        )
        x_f, lp_f, acc_f, jump_f = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            # TPU-semantics interpreter (supports pltpu.prng_*) for CPU tests
            interpret=interp,
        )(seed, scale, *flat_params, *extra_inputs, x0, acc0, jump0)

    # cumulative post-burn-in normalization (resume-safe, like run_rwm)
    n = jnp.maximum(step0 + total - burn_in, 1).astype(jnp.float32)
    state = RWMState(x=x_f, logp=lp_f[0],
                     accept_count=acc_f[0].astype(jnp.int32),
                     sum_sq_jump=jump_f[0],
                     step=step0 + jnp.asarray(total, jnp.int32))
    return RWMResult(state=state,
                     acceptance_rate=acc_f[0] / n,
                     esjd=jump_f[0] / n,
                     chain=chain)
