"""High-level MCMC simulation harness.

Mirrors the surface of ``MCMCSimulation_GPU``
(/root/reference/interfaces/simulation_gpu.py:13-438): construction from
``sigma`` (back-compat Normal proposal) or a ``proposal_config`` dict,
algorithm dispatch (RWM vs PT), seeded runs, acceptance rate, ESJD variants,
traceplots/histograms, and performance benchmarking — plus capabilities the
reference lacks: many vectorized chains per run, checkpoint/resume, and mesh
sharding.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import run_pt, run_rwm
from ..ladders import construct_geometric_ladder, construct_iterative_ladder
from ..parallel import make_mesh, shard_init_states
from ..proposals import create_proposal_distribution
from ..targets import get_target_distribution
from ..targets.base import TargetMixin
# force(): sync via a 1-scalar fetch — jax.block_until_ready does not
# reliably block over the tunneled axon TPU platform, which would let every
# walltime/progress measurement read queued-but-unfinished work as done
from ..utils import force
from ..utils.dtypes import default_float

_RECORD_LIMIT = 2_000_000  # max recorded floats per run before auto-thinning


class MCMCSimulation:
    """Run batched RWM or PT-RWM on a target distribution.

    Parameters follow ``MCMCSimulation_GPU.__init__``
    (simulation_gpu.py:21-57); additions are ``num_chains`` (vectorized
    independent chains — the reference always runs 1) and ``mesh``/sharding.
    """

    def __init__(self,
                 dim: int,
                 sigma: float = None,
                 proposal_config: dict = None,
                 num_iterations: int = 1000,
                 algorithm: str = "RWM",
                 target_dist: Union[str, TargetMixin] = None,
                 symmetric: bool = True,
                 seed: Optional[int] = None,
                 beta_ladder: Optional[list] = None,
                 swap_acceptance_rate: Optional[float] = None,
                 burn_in: int = 0,
                 num_chains: int = 1,
                 swap_every: int = 100,
                 swap_sweep: str = "even_odd",
                 cpu_semantics: bool = False,
                 rng_impl: str = "threefry2x32",
                 iterative_temp_spacing: bool = False,
                 geom_temp_spacing: bool = False,
                 beta_min_iterative: float = 0.01,
                 N_samples_swap_est: int = 3000,
                 iterative_tolerance: float = 0.005,
                 iterative_initial_pn: float = 0.5,
                 iterative_pn_update_power: float = -0.25,
                 iterative_max_pn_steps: int = 100,
                 iterative_pn_clamp_min: float = -10.0,
                 iterative_pn_clamp_max: float = 10.0,
                 iterative_fail_tol_factor: float = 3.0,
                 record_chain: Optional[bool] = None,
                 record_every: Optional[int] = None,
                 record_chains: int = 1,
                 use_mesh: bool = False,
                 target_kwargs: Optional[dict] = None,
                 engine: str = "auto",
                 autotune: bool = False,
                 autotune_target: float = 0.234,
                 autotune_every: int = 100,
                 autotune_ladder: bool = False,
                 **kwargs):
        # proposal resolution: sigma back-compat path (simulation_gpu.py:58-66)
        if proposal_config is None and sigma is not None:
            proposal_config = {"name": "Normal",
                               "params": {"base_variance_scalar": sigma}}
        elif proposal_config is None and sigma is None:
            raise ValueError("Either sigma (backward compatibility) or "
                             "proposal_config must be provided")

        # algorithm may be a string or a class (simulation_gpu.py:81-141);
        # resolve PT-ness once, before target resolution, so the variant
        # default below can't diverge from the dispatch predicate
        algo = algorithm if isinstance(algorithm, str) else getattr(
            algorithm, "__name__", str(algorithm))
        # the reference dispatches PT by 'ParallelTempering' in the class
        # name (simulation_gpu.py:83); "PT"-prefixed short aliases are ours.
        # NOT a bare substring test: "RandomWalkMH_GPU_OPTimized" contains
        # "pt" and must dispatch to RWM (round-5 fix).
        _up = algo.upper().replace("-", "_")
        is_pt = ("PARALLELTEMPERING" in _up or _up == "PT"
                 or _up.startswith(("PT_", "PTRWM"))
                 or _up.endswith("_PT"))

        if isinstance(target_dist, str):
            tk = dict(target_kwargs or {})
            # pick the reference factory whose constants produced the
            # matching data family: experiment_pt_GPU.py for PT,
            # experiment_RWM_GPU.py for RWM (targets/registry.py docstring)
            tk.setdefault("variant", "pt_gpu" if is_pt else "rwm_gpu")
            target_dist = get_target_distribution(target_dist, dim, **tk)
        if target_dist is None:
            raise ValueError("target_dist is required")

        # targets whose dimension is derived from their own structure
        # (SuperFunnel: J+JK+1+K+2, HybridRosenbrock: 1+n2(n1-1)) override a
        # missing/mismatched dim, like the CLIs' resolve_actual_dim
        self.dim = target_dist.dim
        dim = target_dist.dim
        self.num_iterations = num_iterations
        self.burn_in = max(0, burn_in)
        self.target_dist = target_dist
        self.proposal_config = proposal_config
        self.proposal_dist = create_proposal_distribution(dim, proposal_config)
        # optional per-rung tuned variance multipliers riding in the config
        # (the round-trip output of tuned_proposal_config() on an autotuned
        # PT run): effective variance = base * c_t / beta_t; increments only,
        # the accept ratio keeps the true betas (kernels/adapt.py law)
        self._rung_multipliers = None
        rm = (proposal_config.get("params") or {}).get(
            "rung_scale_multipliers")
        if rm is not None:
            if not is_pt:
                raise ValueError("rung_scale_multipliers in proposal_config "
                                 "requires a PT algorithm (it is per-rung)")
            if use_mesh:
                raise ValueError("rung_scale_multipliers is not supported "
                                 "with use_mesh yet; drop the mesh")
            self._rung_multipliers = np.asarray(rm, float)
        self.num_chains = num_chains
        self.swap_every = swap_every
        # swap-event pair order on the scan engine: "even_odd" (vectorized
        # half-sweeps) or "sequential" (the reference's exact in-order sweep,
        # pt_rwm_gpu_optimized.py:594-633 — what the Pallas engine always
        # does).  Statistically close; sequential reproduces the reference's
        # achieved swap rates exactly at production precision
        # (docs/PARITY_MATRIX.md footnotes).
        if swap_sweep not in ("even_odd", "sequential"):
            raise ValueError("swap_sweep must be 'even_odd' or 'sequential'")
        self.swap_sweep = swap_sweep
        # scan-engine PT state layout: flat (d, T*C) tiles the TPU lanes like
        # a plain RWM batch (~2.4x, kernels/pt.py run_pt docstring); sharded
        # runs need the canonical (d, T, C) so mesh axes line up
        self._pt_layout = "tc" if use_mesh else "flat"
        # reference CPU PT semantics: swap *instead of* move on swap steps
        # (pt_rwm.py:169-184); default False = GPU semantics (SURVEY.md §3.3)
        self.cpu_semantics = cpu_semantics
        self.seed = 42 if seed is None else seed
        # 'rbg' uses the TPU-friendly RBG generator: ~25% faster scan-engine
        # steps (the scan kernels are threefry-bound), same statistical
        # behavior in all suite checks; threefry stays the default for its
        # stronger fold_in stream-separation guarantees
        self.rng_impl = rng_impl
        self.key = jax.random.key(self.seed, impl=rng_impl)
        self.symmetric = symmetric

        self.is_pt = is_pt
        self.algorithm_name = ("PT_RWM_TPU" if self.is_pt else "RWM_TPU")

        if self.is_pt:
            if geom_temp_spacing and iterative_temp_spacing:
                raise ValueError("geom_temp_spacing and iterative_temp_spacing"
                                 " are mutually exclusive (geometric is the "
                                 "default when neither is set)")
            if beta_ladder is not None:
                self.beta_ladder = list(beta_ladder)
            elif iterative_temp_spacing:
                self.beta_ladder = construct_iterative_ladder(
                    target_dist,
                    target_swap_acceptance_rate=(swap_acceptance_rate or 0.234),
                    beta_min=beta_min_iterative,
                    N_samples_swap_est=N_samples_swap_est,
                    tolerance=iterative_tolerance,
                    initial_pn=iterative_initial_pn,
                    pn_update_power=iterative_pn_update_power,
                    max_pn_adjustment_steps=iterative_max_pn_steps,
                    pn_clamping_range=(iterative_pn_clamp_min,
                                       iterative_pn_clamp_max),
                    convergence_failure_tolerance_factor=iterative_fail_tol_factor,
                    seed=self.seed)
            else:
                # geometric default, like the reference's fallback
                # (pt_rwm_gpu_optimized.py:208-213)
                self.beta_ladder = construct_geometric_ladder()
            self.algorithm_name = ("PT_RWM_TPU_ITERATIVE_LADDER"
                                   if iterative_temp_spacing else "PT_RWM_TPU")
            if (self._rung_multipliers is not None
                    and len(self._rung_multipliers) != len(self.beta_ladder)):
                raise ValueError(
                    f"rung_scale_multipliers has {len(self._rung_multipliers)}"
                    f" entries but the ladder has {len(self.beta_ladder)} "
                    f"rungs; pass the beta_ladder the tuning run used "
                    f"(MCMCSimulation(beta_ladder=...))")
        else:
            self.beta_ladder = None

        # burn-in proposal-scale autotuning to the optimal acceptance rate —
        # replaces the reference's 40-point scale sweeps (kernels/adapt.py)
        self.autotune = autotune
        self.autotune_target = autotune_target
        self.autotune_every = autotune_every
        self._tuned = None
        if autotune and record_chain:
            raise ValueError("autotune=True requires record_chain=False "
                             "(the adaptive kernels record no traces)")
        if autotune and self.burn_in < autotune_every:
            raise ValueError(
                f"autotune=True needs burn_in >= autotune_every "
                f"({autotune_every}) adaptation windows to run; got "
                f"burn_in={self.burn_in}. Use burn_in of at least a few "
                f"thousand steps so the recursion can converge.")
        if autotune and cpu_semantics:
            raise ValueError("autotune is not implemented for the CPU PT "
                             "semantics path (cpu_semantics=True)")
        # autotune + engine='pallas' is the two-phase flow: tune on the scan
        # engine during burn-in, then hand the frozen per-rung multipliers
        # to the Pallas engine for the measurement phase (generate_samples)
        if autotune and engine == "pallas" and use_mesh:
            raise ValueError("autotune with engine='pallas' does not "
                             "support a mesh (the tuned handoff resumes an "
                             "unsharded scan state); drop use_mesh or use "
                             "engine='scan'")
        if autotune:
            record_chain = False

        # burn-in ladder adaptation: Robbins-Monro on the per-pair beta
        # spacings from measured swap acceptance (kernels/adapt.py
        # run_pt_ladder_adaptive) — works for targets WITHOUT a direct
        # sampler, which the reference's iterative construction requires
        self.autotune_ladder = autotune_ladder
        self._tuned_ladder = None
        self._target_swap_accept = swap_acceptance_rate or 0.234
        self._beta_min = beta_min_iterative
        if autotune_ladder:
            if not self.is_pt:
                raise ValueError("autotune_ladder=True requires a PT "
                                 "algorithm (it adapts the beta ladder)")
            if autotune:
                raise ValueError("autotune and autotune_ladder are mutually "
                                 "exclusive (run the ladder tuner first, "
                                 "then feed its beta_ladder to a scale-"
                                 "autotuned run)")
            if iterative_temp_spacing:
                raise ValueError("autotune_ladder replaces "
                                 "iterative_temp_spacing; pick one")
            if cpu_semantics:
                raise ValueError("autotune_ladder runs on the scan engine "
                                 "with GPU swap semantics")
            if engine == "pallas" and use_mesh:
                raise ValueError("autotune_ladder with engine='pallas' does "
                                 "not support a mesh; drop use_mesh or use "
                                 "engine='scan'")
            if record_chain:
                raise ValueError("autotune_ladder=True requires "
                                 "record_chain=False")
            if self.burn_in < autotune_every:
                raise ValueError(
                    f"autotune_ladder=True needs burn_in >= autotune_every "
                    f"({autotune_every}); got burn_in={self.burn_in}")
            record_chain = False

        # how many of the vectorized replicas get their (cold-)trace recorded;
        # >1 enables the cross-chain diagnostics (split_rhat / ESS)
        if not 1 <= record_chains <= num_chains:
            raise ValueError(f"record_chains must be in [1, num_chains"
                             f"={num_chains}], got {record_chains}")
        self.record_chains = record_chains

        # chain recording policy: record everything for small runs (parity
        # with the reference's materialized chains), auto-thin for large ones.
        # The budget counts every recorded float: steps x dim x record_chains.
        n_total = (self.burn_in + num_iterations)
        rec_floats = n_total * dim * record_chains
        if record_chain is None:
            record_chain = rec_floats <= _RECORD_LIMIT
        self.record_chain = record_chain
        # an explicit record_chains>1 request is a request for recorded
        # diagnostics — fail at construction, not after an hours-long run
        if record_chains > 1 and not record_chain:
            raise ValueError(
                "record_chains > 1 requires chain recording, but recording "
                "is off for this run ("
                + ("autotune=True disables it"
                   if autotune else
                   "record_chain=False" if record_chain is False and
                   rec_floats <= _RECORD_LIMIT else
                   f"{rec_floats:,} recorded floats exceed the "
                   f"{_RECORD_LIMIT:,} budget; raise record_every or lower "
                   f"num_iterations/record_chains, or pass record_chain=True "
                   f"to force it") + ")")
        if record_every is None:
            record_every = 1
            if record_chain and rec_floats > _RECORD_LIMIT:
                record_every = max(1, rec_floats // _RECORD_LIMIT)
        self.record_every = record_every

        self.mesh = make_mesh() if use_mesh else None
        # engine selection: the Pallas VMEM-resident kernel is ~1.5x (RWM) to
        # ~5x (PT) faster on TPU but does no trace recording or sharding;
        # 'auto' picks it when eligible.
        if engine not in ("auto", "pallas", "scan"):
            raise ValueError("engine must be 'auto', 'pallas', or 'scan'")
        self.engine = engine
        self._engine_used = None   # engine of the last run ("scan"/"pallas")
        self._result = None
        self._chain_np = None
        self._elapsed = None

    def _pallas_record_ok(self) -> bool:
        """Recording on the Pallas engine needs the whole batch in one VMEM
        block (the trace segments stream from that block) and no mesh."""
        if not self.record_chain:
            return True
        if self.mesh is not None:
            return False
        kind = self.proposal_config.get("name")
        if self.is_pt:
            from ..kernels.pallas_pt import pt_vmem_block_cap
            cap = pt_vmem_block_cap(self.dim, len(self.beta_ladder), kind)
        else:
            from ..kernels.pallas_rwm import rwm_vmem_block_cap
            cap = rwm_vmem_block_cap(self.dim, kind)
        return self.num_chains <= cap

    def _use_pallas(self) -> bool:
        if self.engine == "scan":
            return False
        # chains-sharded meshes run the full VMEM-resident kernel per device
        # via shard_map (kernels/pallas_sharded.py).  For PT, a temps-sharded
        # mesh uses the hybrid (Pallas MH segments + ppermute swap events,
        # run_pt_pallas_tempsharded) when T divides the temps axis; RWM has
        # no temps axis to shard.
        if self.mesh is None:
            mesh_ok = True
        else:
            shape = dict(self.mesh.shape)
            n_c = shape.get("chains", 1)
            n_t = shape.get("temps", 1)
            mesh_ok = (
                all(shape[a] == 1 for a in shape
                    if a not in ("chains", "temps"))
                and self.num_chains % n_c == 0
                and (n_t == 1 or (self.is_pt
                                  and len(self.beta_ladder) % n_t == 0)))
        eligible = (self.proposal_config.get("name") in
                    ("Normal", "Laplace", "UniformRadius")
                    and mesh_ok
                    and jax.default_backend() == "tpu"
                    and not jax.config.jax_enable_x64
                    and not self.cpu_semantics
                    and self.symmetric
                    and not self.autotune
                    and not self.autotune_ladder)
        if self.engine == "pallas":
            # an explicit pallas request honors trace recording via the
            # segmented VMEM->HBM kernel when the batch fits one block
            if not (eligible and self._pallas_record_ok()):
                raise ValueError(
                    "engine='pallas' requires a library proposal (Normal/"
                    "Laplace/UniformRadius), a chains-only mesh (or none) "
                    "with num_chains divisible by its size, the TPU backend, "
                    "float32 (x64 disabled), symmetric=True (the VMEM "
                    "kernels omit the asymmetric correction term), and — "
                    "when record_chain=True — no mesh plus a chain batch "
                    "small enough for one VMEM block")
            return True
        # 'auto' keeps recorded runs on the scan engine: its plain-scan trace
        # path beats segment-per-snapshot VMEM round-trips at record_every=1
        return eligible and not self.record_chain

    # ------------------------------------------------------------------ run
    def has_run(self) -> bool:
        return self._result is not None

    def reset(self):
        """Reset to initial state (simulation_gpu.py:153-155)."""
        self._result = None
        self._chain_np = None
        self._elapsed = None

    def _init_states(self):
        k_init = jax.random.fold_in(self.key, 0xC0)
        x0 = self.target_dist.init_sample(k_init, self.num_chains).T  # (d, C)
        if self.is_pt:
            T = len(self.beta_ladder)
            x0 = jnp.broadcast_to(x0[:, None, :], (self.dim, T, self.num_chains))
        if self.mesh is not None:
            x0 = shard_init_states(x0, self.mesh, pt=self.is_pt)
        return x0

    def generate_samples(self, progress_bar: bool = False, verbose: bool = True,
                         checkpoint_every: Optional[int] = None,
                         checkpoint_path: Optional[str] = None):
        """Run the compiled sampler; returns the (cold-)chain of replica 0 as
        a ``(num_iterations, dim)`` array when recording is on, else ``None``.

        Burn-in handling matches the reference: the returned chain excludes
        the initial state and burn-in samples
        (rwm_gpu_optimized.py:475-488, pt_rwm_gpu_optimized.py:760-770).

        ``progress_bar=True`` emits periodic in-run progress lines (the
        compiled analogue of the reference's tqdm + samples/s prints,
        interfaces/simulation.py:46, rwm_gpu_optimized.py:459-467): the scan
        engine reports from inside the compiled loop via
        ``jax.debug.callback`` (trajectory unchanged); the Pallas engine runs
        in segments and reports between them (statistically equivalent run,
        same contract as :meth:`resume`).

        ``checkpoint_every``/``checkpoint_path``: persist the full sampler
        state to ``checkpoint_path`` every ``checkpoint_every`` post-burn-in
        iterations, so a killed long run resumes from the last segment via
        :meth:`resume` (fault tolerance for pod runs — SURVEY.md §5 lists
        mid-run persistence as absent from the reference).  On the scan
        engine segmentation is *bitwise-free*: per-step randomness is keyed
        on the absolute step counter, so a segmented run equals the
        uninterrupted run exactly.  On the Pallas engine cumulative
        accounting is exact but the continuation is statistical.  Requires
        ``record_chain=False``.
        """
        if self.has_run():
            raise ValueError("Please reset the algorithm before running it again.")
        if checkpoint_every:
            if checkpoint_path is None:
                raise ValueError("checkpoint_every requires checkpoint_path")
            if self.autotune or self.autotune_ladder:
                raise ValueError("autotune and checkpoint_every cannot be "
                                 "combined (the adaptive kernels are not "
                                 "resumable mid-adaptation)")
            if self.num_iterations <= 0:
                raise ValueError("checkpoint_every requires num_iterations > 0")
            if self.record_chain:
                raise ValueError("periodic checkpointing requires "
                                 "record_chain=False (thinned traces cannot "
                                 "be stitched across segments)")
            if self.engine == "pallas" and self.mesh is not None:
                raise ValueError("periodic checkpointing on the Pallas "
                                 "engine requires no mesh (the sharded "
                                 "Pallas runner is not resumable); drop the "
                                 "mesh or use engine='scan'")
            return self._generate_samples_segmented(
                checkpoint_every, checkpoint_path, verbose,
                progress=progress_bar)
        progress_every = None
        if progress_bar and not (self.autotune or self.autotune_ladder):
            # ~20 in-run updates, but never chattier than the reference's
            # every-1000-steps prints (rwm_gpu_optimized.py:459-467)
            progress_every = max(1000,
                                 (self.burn_in + self.num_iterations) // 20)
        start = time.time()
        rec = self.record_every if self.record_chain else None
        init_states = self._init_states()
        self._engine_used = "scan"
        if self.autotune:
            from ..kernels import run_pt_adaptive, run_rwm_adaptive
            # engine='pallas': two-phase — tune during burn-in on the scan
            # engine (num_iterations=0: the adaptive scan covers exactly the
            # burn_in steps, where adaptation lives anyway), then run the
            # measurement phase on the Pallas engine, resuming the tuned
            # state at the frozen per-rung multipliers.
            two_phase = self.engine == "pallas"
            if two_phase:
                # fail before the tuning run, not after it
                self._check_pallas_measurement()
            tune_iters = 0 if two_phase else self.num_iterations
            if self.is_pt:
                tuned = run_pt_adaptive(
                    self.target_dist, self.proposal_dist, self.key,
                    jnp.asarray(self.beta_ladder, default_float()),
                    num_chains=self.num_chains,
                    num_iterations=tune_iters, burn_in=self.burn_in,
                    swap_every=self.swap_every,
                    target_accept=self.autotune_target,
                    adapt_every=self.autotune_every, init_states=init_states)
            else:
                tuned = run_rwm_adaptive(
                    self.target_dist, self.proposal_dist, self.key,
                    num_chains=self.num_chains,
                    num_iterations=tune_iters, burn_in=self.burn_in,
                    target_accept=self.autotune_target,
                    adapt_every=self.autotune_every, init_states=init_states)
            tuned = force(tuned)
            self._tuned = tuned
            if two_phase:
                self._result = force(self._pallas_measurement(
                    tuned.result.state, np.asarray(tuned[1])))
                self._engine_used = "pallas"
            else:
                self._result = tuned.result
            self._elapsed = time.time() - start
            if verbose:
                mult = np.asarray(tuned[1])
                print(f"Autotuned proposal scale multiplier: "
                      f"{np.array2string(mult, precision=3)} "
                      f"(target acceptance {self.autotune_target})"
                      + (" [measurement phase: pallas]" if two_phase else ""))
            return None
        if self.autotune_ladder:
            from ..kernels import run_pt_ladder_adaptive
            two_phase = self.engine == "pallas"
            if two_phase:
                self._check_pallas_measurement()
            tune_iters = 0 if two_phase else self.num_iterations
            tuned = run_pt_ladder_adaptive(
                self.target_dist, self.proposal_dist, self.key,
                num_rungs=len(self.beta_ladder),
                num_chains=self.num_chains,
                num_iterations=tune_iters, burn_in=self.burn_in,
                swap_every=self.swap_every,
                adapt_every=self.autotune_every,
                target_swap_accept=self._target_swap_accept,
                beta_min=self._beta_min, init_states=init_states)
            tuned = force(tuned)
            self._tuned_ladder = np.asarray(tuned.tuned_betas)
            # the tuned ladder becomes the run's ladder: diagnostics, JSON
            # output and follow-up runs all see the adapted betas
            self.beta_ladder = [float(b) for b in self._tuned_ladder]
            if two_phase:
                self._result = force(self._pallas_measurement(
                    tuned.result.state, None))
                self._engine_used = "pallas"
            else:
                self._result = tuned.result
            self._elapsed = time.time() - start
            if verbose:
                print(f"Autotuned beta ladder: "
                      f"{np.array2string(self._tuned_ladder, precision=4)} "
                      f"(target swap acceptance {self._target_swap_accept})"
                      + (" [measurement phase: pallas]" if two_phase else ""))
            return None
        if self._use_pallas():
            self._engine_used = "pallas"
            if progress_every and self.mesh is None and not self.record_chain:
                # Pallas kernels run the whole batch on-chip with no host
                # callbacks; liveness comes from segmenting the run instead
                return self._generate_samples_segmented(
                    max(1, (self.burn_in + self.num_iterations) // 10),
                    None, verbose, progress=True)
            if progress_every and verbose:
                print("  (in-run progress is unavailable for recorded or "
                      "sharded Pallas runs; use engine='scan' for live "
                      "progress)")
            from ..kernels import (run_pt_pallas, run_pt_pallas_sharded,
                                   run_pt_pallas_tempsharded,
                                   run_rwm_pallas, run_rwm_pallas_sharded)
            if self.mesh is not None and self.is_pt:
                # temps-sharded meshes take the hybrid (Pallas MH segments +
                # ppermute swap events); chains-only meshes keep the
                # whole-ladder per-device kernel
                pt_sharded = (run_pt_pallas_tempsharded
                              if self.mesh.shape.get("temps", 1) > 1
                              else run_pt_pallas_sharded)
                res = pt_sharded(
                    self.target_dist, self.key,
                    jnp.asarray(self.beta_ladder, default_float()), self.mesh,
                    proposal=self.proposal_dist, num_chains=self.num_chains,
                    num_iterations=self.num_iterations, burn_in=self.burn_in,
                    swap_every=self.swap_every, init_states=init_states)
            elif self.mesh is not None:
                res = run_rwm_pallas_sharded(
                    self.target_dist, self.key, self.mesh,
                    proposal=self.proposal_dist, num_chains=self.num_chains,
                    num_iterations=self.num_iterations, burn_in=self.burn_in,
                    init_states=init_states)
            elif self.is_pt:
                res = run_pt_pallas(
                    self.target_dist, self.key,
                    jnp.asarray(self.beta_ladder, default_float()),
                    proposal=self.proposal_dist, num_chains=self.num_chains,
                    num_iterations=self.num_iterations, burn_in=self.burn_in,
                    swap_every=self.swap_every, init_states=init_states,
                    record_every=rec, record_chains=self.record_chains,
                    scale_multipliers=self._rung_multipliers)
            else:
                res = run_rwm_pallas(
                    self.target_dist, self.key, proposal=self.proposal_dist,
                    num_chains=self.num_chains,
                    num_iterations=self.num_iterations, burn_in=self.burn_in,
                    init_states=init_states,
                    record_every=rec, record_chains=self.record_chains)
        elif self.is_pt:
            res = run_pt(self.target_dist, self.proposal_dist, self.key,
                         jnp.asarray(self.beta_ladder, default_float()),
                         num_chains=self.num_chains,
                         num_iterations=self.num_iterations,
                         burn_in=self.burn_in, swap_every=self.swap_every,
                         cpu_semantics=self.cpu_semantics,
                         init_states=init_states, symmetric=self.symmetric,
                         record_every=rec, record_chains=self.record_chains,
                         progress_every=progress_every,
                         swap_sweep=self.swap_sweep, layout=self._pt_layout,
                         scale_multipliers=self._rung_multipliers)
        else:
            res = run_rwm(self.target_dist, self.proposal_dist, self.key,
                          num_chains=self.num_chains,
                          num_iterations=self.num_iterations,
                          burn_in=self.burn_in, init_states=init_states,
                          symmetric=self.symmetric,
                          record_every=rec, record_chains=self.record_chains,
                          progress_every=progress_every)
        res = force(res)
        self._elapsed = time.time() - start
        self._result = res

        if res.chain is not None:
            # replica 0's trace, burn-in-trimmed by _get_chains_3d
            self._chain_np = self._get_chains_3d()[:, :, 0]
        if verbose:
            total_steps = (self.burn_in + self.num_iterations) * self.num_chains
            if self.is_pt:
                total_steps *= len(self.beta_ladder)
            print(f"Drew {self.num_iterations} samples x {self.num_chains} "
                  f"chains in {self._elapsed:.2f} seconds "
                  f"({total_steps / self._elapsed:,.0f} MH steps/s)")
        return self._chain_np

    def _check_pallas_measurement(self):
        kind = self.proposal_config.get("name")
        ok = (kind in ("Normal", "Laplace", "UniformRadius")
              and jax.default_backend() == "tpu"
              and not jax.config.jax_enable_x64
              and self.symmetric and self.mesh is None
              and not self.cpu_semantics)
        if not ok:
            raise ValueError(
                "autotune with engine='pallas' requires a library proposal "
                "(Normal/Laplace/UniformRadius), the TPU backend, float32 "
                "(x64 disabled), symmetric=True, no mesh, and GPU swap "
                "semantics — use engine='scan' otherwise")

    def _pallas_measurement(self, state, mult):
        """Measurement phase of an autotuned ``engine='pallas'`` run: resume
        the burn-in-tuned scan state on the Pallas engine at the frozen
        tuned scales.

        PT: the FULL per-rung multiplier vector feeds the kernel's per-rung
        scale input (``run_pt_pallas(scale_multipliers=...)``) — no lossy
        cold-rung-only collapse.  RWM: the scalar multiplier folds exactly
        into the proposal's base scale.  ``mult=None`` (ladder autotune)
        keeps the untuned proposal scales and only carries the tuned betas.
        """
        self._check_pallas_measurement()
        from ..kernels import run_pt_pallas, run_rwm_pallas
        if self.is_pt:
            return run_pt_pallas(
                self.target_dist, self.key,
                jnp.asarray(self.beta_ladder, default_float()),
                proposal=self.proposal_dist, num_chains=self.num_chains,
                num_iterations=self.num_iterations, burn_in=self.burn_in,
                swap_every=self.swap_every, resume_state=state,
                scale_multipliers=None if mult is None
                else jnp.asarray(mult, jnp.float32))
        prop = create_proposal_distribution(
            self.dim, self._scaled_config(float(mult)))
        return run_rwm_pallas(
            self.target_dist, self.key, proposal=prop,
            num_chains=self.num_chains, num_iterations=self.num_iterations,
            burn_in=self.burn_in, resume_state=state)

    def _scaled_config(self, c: float) -> dict:
        """The proposal config with its base scale rescaled by a variance
        multiplier ``c`` (variance scales by c for Normal/Laplace, radius by
        sqrt(c) for UniformRadius — the reference scaling laws)."""
        name = self.proposal_config["name"]
        params = dict(self.proposal_config.get("params", {}))
        params.pop("rung_scale_multipliers", None)
        if name == "Normal":
            params["base_variance_scalar"] = (
                float(params["base_variance_scalar"]) * c)
        elif name == "Laplace":
            params["base_variance_vector"] = (
                np.asarray(params["base_variance_vector"], float) * c).tolist()
        else:  # UniformRadius
            params["base_radius"] = (
                float(params["base_radius"]) * float(np.sqrt(c)))
        return {"name": name, "params": params}

    def _generate_samples_segmented(self, segment_every: int,
                                    checkpoint_path: Optional[str],
                                    verbose: bool, progress: bool = False):
        """Segmented run: a checkpoint is written after every segment when
        ``checkpoint_path`` is set; per-segment progress lines are printed
        when ``progress`` is True (the Pallas engine's ``progress_bar``
        path — its kernels host no in-loop callbacks).

        Scan engine: the kernels derive per-step keys by folding the absolute
        step counter (kernels/rwm.py:152-157), so passing the same base key
        to every segment continues the stream exactly where the previous
        segment left it — segment boundaries do not perturb the trajectory.
        Pallas engine: cumulative accounting (accept counts, ESJD sums, step)
        is exact across segments, but the hardware PRNG reseeds per segment
        from a step-folded key, so the segmented run is *statistically* — not
        bitwise — equal to the unsegmented one (same contract as
        :meth:`resume` on Pallas)."""
        use_pallas = self._use_pallas() and self.mesh is None
        self._engine_used = "pallas" if use_pallas else "scan"
        start = time.time()
        state = None
        done = 0
        T = len(self.beta_ladder) if self.is_pt else 1
        while done < self.num_iterations:
            n = min(segment_every, self.num_iterations - done)
            seg_start = time.time()
            seg_steps = (n + (self.burn_in if state is None else 0))
            init = self._init_states() if state is None else None
            if use_pallas:
                from ..kernels import run_pt_pallas, run_rwm_pallas
                if self.is_pt:
                    res = run_pt_pallas(
                        self.target_dist, self.key,
                        jnp.asarray(self.beta_ladder, default_float()),
                        proposal=self.proposal_dist,
                        num_chains=self.num_chains, num_iterations=n,
                        burn_in=self.burn_in, swap_every=self.swap_every,
                        init_states=init, resume_state=state,
                        scale_multipliers=self._rung_multipliers)
                else:
                    res = run_rwm_pallas(
                        self.target_dist, self.key,
                        proposal=self.proposal_dist,
                        num_chains=self.num_chains, num_iterations=n,
                        burn_in=self.burn_in,
                        init_states=init, resume_state=state)
            elif self.is_pt:
                res = run_pt(self.target_dist, self.proposal_dist, self.key,
                             jnp.asarray(self.beta_ladder, default_float()),
                             num_chains=self.num_chains, num_iterations=n,
                             burn_in=self.burn_in, swap_every=self.swap_every,
                             cpu_semantics=self.cpu_semantics,
                             init_states=init, swap_sweep=self.swap_sweep,
                             layout=self._pt_layout,
                             symmetric=self.symmetric, resume_state=state,
                             scale_multipliers=self._rung_multipliers)
            else:
                res = run_rwm(self.target_dist, self.proposal_dist, self.key,
                              num_chains=self.num_chains, num_iterations=n,
                              burn_in=self.burn_in, init_states=init,
                              symmetric=self.symmetric, resume_state=state)
            res = force(res)
            state = res.state
            done += n
            if checkpoint_path:
                self._write_state(state, checkpoint_path)
                if verbose:
                    print(f"  checkpoint @ {done}/{self.num_iterations} "
                          f"iterations -> {checkpoint_path}")
            if progress and verbose:
                rate = (seg_steps * self.num_chains * T
                        / max(time.time() - seg_start, 1e-9))
                print(f"  progress: {done:,}/{self.num_iterations:,} "
                      f"iterations ({rate:,.0f} MH steps/s)", flush=True)
        self._result = res
        self._elapsed = time.time() - start
        if verbose:
            total_steps = (self.burn_in + self.num_iterations) * self.num_chains
            if self.is_pt:
                total_steps *= len(self.beta_ladder)
            print(f"Drew {self.num_iterations} samples x {self.num_chains} "
                  f"chains in {self._elapsed:.2f} seconds "
                  f"({total_steps / self._elapsed:,.0f} MH steps/s)")
        return None

    # ----------------------------------------------------------- diagnostics
    def _require_run(self):
        if not self.has_run():
            raise ValueError("The algorithm has not been run yet.")

    def acceptance_rate(self) -> float:
        """Post-burn-in acceptance rate; for PT this is the swap acceptance
        rate, matching ``MCMCSimulation_GPU.acceptance_rate`` semantics
        (simulation_gpu.py:214-219 + pt algorithm's acceptance_rate field)."""
        self._require_run()
        if self.is_pt:
            return float(jnp.mean(self._result.swap_acceptance_rate))
        return float(jnp.mean(self._result.acceptance_rate))

    def acceptance_rate_per_chain(self) -> np.ndarray:
        self._require_run()
        r = (self._result.swap_acceptance_rate if self.is_pt
             else self._result.acceptance_rate)
        return np.asarray(r)

    def expected_squared_jump_distance(self) -> float:
        """x-space ESJD (cold chain for PT), post burn-in
        (simulation_gpu.py:221-244)."""
        self._require_run()
        esjd = self._result.cold_esjd if self.is_pt else self._result.esjd
        return float(jnp.mean(esjd))

    def expected_squared_jump_distance_per_chain(self) -> np.ndarray:
        self._require_run()
        esjd = self._result.cold_esjd if self.is_pt else self._result.esjd
        return np.asarray(esjd)

    def pt_expected_squared_jump_distance(self) -> float:
        """beta-space PT ESJD (simulation_gpu.py:246-250)."""
        self._require_run()
        if not self.is_pt:
            raise ValueError("pt_expected_squared_jump_distance requires PT")
        return float(jnp.mean(self._result.pt_esjd))

    def swap_acceptance_rate(self) -> float:
        self._require_run()
        return float(jnp.mean(self._result.swap_acceptance_rate))

    @property
    def elapsed_time(self) -> Optional[float]:
        return self._elapsed

    @property
    def engine_used(self) -> Optional[str]:
        """Engine of the last run: 'scan' or 'pallas' (None before a run).
        An autotuned ``engine='pallas'`` run reports 'pallas' — its
        measurement phase ran there (the burn-in tune runs on scan)."""
        return self._engine_used

    def get_diagnostic_info(self) -> dict:
        """Diagnostics dict in the spirit of the reference's
        (rwm_gpu_optimized.py:536-551, pt_rwm_gpu_optimized.py:791-811)."""
        self._require_run()
        info = {
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()],
            "algorithm": self.algorithm_name,
            "num_chains": self.num_chains,
            "num_iterations": self.num_iterations,
            "burn_in": self.burn_in,
            "elapsed_seconds": self._elapsed,
            "engine": self._engine_used,
            "acceptance_rate": self.acceptance_rate(),
            "esjd": self.expected_squared_jump_distance(),
            "optimization_level": "FULLY_COMPILED_LAX_SCAN",
            "rng": "counter-based threefry fold_in(key, step)",
        }
        if self.is_pt:
            info.update({
                "beta_ladder": list(map(float, self.beta_ladder)),
                "num_temps": len(self.beta_ladder),
                "swap_every": self.swap_every,
                "swap_acceptance_rate": self.swap_acceptance_rate(),
                "pt_esjd": self.pt_expected_squared_jump_distance(),
            })
        if self._tuned is not None:
            mult = np.asarray(self._tuned[1])
            info.update({
                "autotune_target": self.autotune_target,
                "tuned_scale_multiplier": (mult.tolist() if mult.ndim
                                           else float(mult)),
            })
        if self._tuned_ladder is not None:
            info.update({
                "autotune_ladder_target": self._target_swap_accept,
                "tuned_beta_ladder": [float(b) for b in self._tuned_ladder],
            })
        return info

    @property
    def tuned_ladder(self):
        """The burn-in-adapted beta ladder (``autotune_ladder=True`` runs),
        or ``None`` if ladder adaptation did not run."""
        return (None if self._tuned_ladder is None
                else [float(b) for b in self._tuned_ladder])

    def tuned_proposal_config(self) -> dict:
        """The proposal config carrying the autotuned multiplier(s) — pass
        it to a fresh ``MCMCSimulation`` to rerun at the tuned scale.

        RWM: the scalar multiplier folds into the base scale (variance
        scales by c for Normal/Laplace, radius by sqrt(c)).  PT: the FULL
        per-rung vector rides along as ``params['rung_scale_multipliers']``
        (effective variance ``base * c_t / beta_t``); the fresh simulation
        must be given the same ``beta_ladder`` this run tuned on
        (``self.beta_ladder``), and both engines honor the vector
        (``run_pt(scale_multipliers=...)`` / ``run_pt_pallas`` per-rung
        stds)."""
        if self._tuned is None:
            raise ValueError("run generate_samples with autotune=True first")
        c = np.asarray(self._tuned[1])
        if c.ndim == 1:   # PT: round-trip the whole tuned vector, lossless
            name = self.proposal_config["name"]
            params = dict(self.proposal_config.get("params", {}))
            params["rung_scale_multipliers"] = [float(x) for x in c]
            return {"name": name, "params": params}
        return self._scaled_config(float(c))

    # ----------------------------------------------------------- persistence
    def _write_state(self, state, path: str):
        flat, _ = jax.tree_util.tree_flatten(state)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # np.savez appends '.npz' itself when missing; normalize so
        # save_checkpoint(p) / resume(p) agree on the file name
        if not path.endswith(".npz"):
            path = path + ".npz"
        # atomic replace: periodic checkpointing overwrites one file, and a
        # kill mid-write (the exact event checkpoints exist for) must not
        # destroy the previous good checkpoint
        tmp = path + ".tmp.npz"
        self._savez(tmp, flat)
        os.replace(tmp, path)

    def _savez(self, path, flat):
        np.savez(path, *[np.asarray(x) for x in flat],
                 meta=json.dumps({
                     "algorithm": self.algorithm_name,
                     "seed": self.seed,
                     "num_iterations": self.num_iterations,
                     "burn_in": self.burn_in,
                     "num_chains": self.num_chains,
                     "beta_ladder": (list(map(float, self.beta_ladder))
                                     if self.beta_ladder else None),
                     # which engine produced this state: resume() honors it
                     # so a scan checkpoint's bitwise continuation contract
                     # can't silently degrade to Pallas' statistical one
                     "engine": self._engine_used,
                 }))

    def save_checkpoint(self, path: str):
        """Persist final sampler state + step + metrics (capability absent
        from the reference — SURVEY.md §5 'Checkpoint / resume: none')."""
        self._require_run()
        self._write_state(self._result.state, path)

    def load_checkpoint(self, path: str):
        if not os.path.exists(path) and not path.endswith(".npz"):
            path = path + ".npz"
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        keys = sorted((k for k in data.files if k != "meta"),
                      key=lambda k: int(k.split("_")[1]))
        arrays = [data[k] for k in keys]
        return arrays, meta

    def restore_state(self, path: str):
        """Rebuild the typed kernel state from a checkpoint file."""
        from ..kernels import PTState, RWMState
        arrays, meta = self.load_checkpoint(path)
        arrays = [jnp.asarray(a) for a in arrays]
        cls = PTState if "PT" in meta["algorithm"] else RWMState
        return cls(*arrays), meta

    def resume(self, path: str, num_iterations: Optional[int] = None):
        """Continue a checkpointed run for ``num_iterations`` more steps
        (mid-run persistence — absent from the reference, SURVEY.md §5).

        Resume contract (scan engine): the kernels derive per-step randomness
        by folding the *absolute* step counter into the run key
        (kernels/rwm.py:152-157), so passing the same base key continues the
        stream exactly where the checkpoint left it — a crash-resumed run is
        bit-identical to the uninterrupted one (same contract as
        ``checkpoint_every`` segments; enforced by
        tests/test_resume_and_utils.py).  On the Pallas engine the
        continuation is statistical (the hardware PRNG re-seeds from a
        step-folded key) with exact cumulative accounting.

        The checkpoint records the engine that wrote it; a scan-written
        checkpoint always resumes on the scan engine (preserving the bitwise
        contract) even when Pallas would otherwise be auto-selected.  A
        Pallas-written checkpoint resumes on Pallas when eligible, else scan
        (its contract is already statistical, so nothing degrades)."""
        from ..kernels import run_pt, run_rwm
        state, meta = self.restore_state(path)
        n = num_iterations or self.num_iterations
        start = time.time()
        key = self.key
        want_pallas = self._use_pallas() and self.mesh is None
        if meta.get("engine") == "scan":
            want_pallas = False
        self._engine_used = "pallas" if want_pallas else "scan"
        if want_pallas:
            from ..kernels import run_pt_pallas, run_rwm_pallas
            if self.is_pt:
                res = run_pt_pallas(
                    self.target_dist, key,
                    jnp.asarray(self.beta_ladder, default_float()),
                    proposal=self.proposal_dist, num_chains=self.num_chains,
                    num_iterations=n, burn_in=self.burn_in,
                    swap_every=self.swap_every, resume_state=state,
                    scale_multipliers=self._rung_multipliers)
            else:
                res = run_rwm_pallas(
                    self.target_dist, key, proposal=self.proposal_dist,
                    num_chains=self.num_chains, num_iterations=n,
                    burn_in=self.burn_in, resume_state=state)
            self._result = force(res)
            self._chain_np = None
            self._elapsed = time.time() - start
            return self._result
        if self.is_pt:
            res = run_pt(self.target_dist, self.proposal_dist, key,
                         jnp.asarray(self.beta_ladder, default_float()),
                         num_chains=self.num_chains, num_iterations=n,
                         burn_in=self.burn_in, swap_every=self.swap_every,
                         cpu_semantics=self.cpu_semantics,
                         swap_sweep=self.swap_sweep, layout=self._pt_layout,
                         symmetric=self.symmetric, resume_state=state,
                         scale_multipliers=self._rung_multipliers)
        else:
            res = run_rwm(self.target_dist, self.proposal_dist, key,
                          num_chains=self.num_chains, num_iterations=n,
                          burn_in=self.burn_in, symmetric=self.symmetric,
                          resume_state=state)
        self._result = force(res)
        # the resumed segment records no chain and has its own walltime;
        # stale values from the first segment must not leak into plots or
        # get_diagnostic_info
        self._chain_np = None
        self._elapsed = time.time() - start
        return self._result

    # ----------------------------------------------------------------- plots
    def _get_chain(self):
        self._require_run()
        if self._chain_np is None:
            raise ValueError("Chain recording was disabled for this run "
                             "(record_chain=False).")
        return self._chain_np

    def _get_chains_3d(self) -> np.ndarray:
        """Recorded post-burn-in traces as ``(n_rec, dim, record_chains)``."""
        self._require_run()
        res = self._result
        if res is None or getattr(res, "chain", None) is None:
            raise ValueError("Chain recording was disabled for this run "
                             "(record_chain=False).")
        # entry k holds the state after step (k+1)*rec; drop entries from
        # burn-in steps (<= burn_in) so thinned chains honor the "chain
        # excludes burn-in" contract (rwm_gpu_optimized.py:475-488)
        rec = self.record_every or 1
        return np.asarray(res.chain)[self.burn_in // rec:]

    # -------------------------------------------------------- diagnostics
    # Cross-chain convergence diagnostics over the recorded traces — absent
    # from the reference (it checks only a lag-1 autocorrelation band,
    # tests/test_rwm_correctness.py:94-112); natural here because runs carry
    # `record_chains` vectorized replicas.  Construct with record_chains>=2
    # (4+ recommended) for the cross-chain forms; a single recorded chain is
    # split in half per Vehtari et al. 2021.
    def effective_sample_size(self) -> np.ndarray:
        """Split-chain ESS per dimension, shape ``(dim,)``."""
        from ..analysis.diagnostics import effective_sample_size
        return effective_sample_size(self._get_chains_3d())

    def split_rhat(self) -> np.ndarray:
        """Split-chain potential scale reduction per dimension, ``(dim,)``."""
        from ..analysis.diagnostics import split_rhat
        return split_rhat(self._get_chains_3d())

    def mcse_mean(self) -> np.ndarray:
        """Monte-Carlo standard error of the mean per dimension, ``(dim,)``."""
        from ..analysis.diagnostics import mcse_mean
        return mcse_mean(self._get_chains_3d())

    def integrated_autocorr_time(self) -> np.ndarray:
        """IACT per dimension in recorded-draw units (x record_every for
        MH-step units), shape ``(dim,)``."""
        from ..analysis.diagnostics import integrated_autocorr_time
        return integrated_autocorr_time(self._get_chains_3d())

    def traceplot(self, single_dim: bool = False, show: bool = False,
                  output_dir: str = "images"):
        """Traceplot matching simulation_gpu.py:313-343 (file naming incl.)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        chain = self._get_chain()
        plt.figure(figsize=(10, 6))
        if single_dim:
            plt.plot(chain[:, 0], label="Dimension 1", alpha=0.7, lw=0.5)
        else:
            for i in range(min(5, self.dim)):
                plt.plot(chain[:, i], label=f"Dimension {i + 1}",
                         alpha=0.7, lw=0.5)
        plt.xlabel("Iteration")
        plt.ylabel("Value")
        plt.legend()
        plt.title(f"Traceplot - {self.algorithm_name} (TPU-accelerated)")
        os.makedirs(output_dir, exist_ok=True)
        filename = (f"{output_dir}/traceplot_{self.target_dist.get_name()}_"
                    f"{self.algorithm_name}_dim{self.dim}_"
                    f"{self.num_iterations}iters")
        plt.savefig(filename, dpi=150, bbox_inches="tight")
        if show:
            plt.show()
        plt.close()
        return filename

    def samples_histogram(self, num_bins: int = 50, axis: int = 0,
                          show: bool = False, output_dir: str = "images"):
        """Histogram + target-density overlay (simulation_gpu.py:345-378).

        Unlike the reference — which always overlays the joint density with
        every *other* coordinate pinned to 0 (the conditional slice; wrong
        curve for correlated or non-product targets) — this overlays the true
        1-D marginal whenever the target implements ``marginal_density``
        (products, MVN, mixtures, NealFunnel), and falls back to the slice
        with an explicit label otherwise (Rosenbrocks, SuperFunnel)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        chain = self._get_chain()
        samples = chain[:, axis]
        plt.figure(figsize=(10, 6))
        plt.hist(samples, bins=num_bins, density=True, alpha=0.5,
                 label="Samples")
        lo = min(-20.0, float(samples.min()) - 2)
        hi = max(20.0, float(samples.max()) + 2)
        xs = np.linspace(lo, hi, 1000)
        ys = self.target_dist.marginal_density(axis, jnp.asarray(xs))
        if ys is not None:
            ys = np.asarray(ys)
            label = "Target marginal density"
        else:
            pts = np.zeros((1000, self.dim), np.float32)
            pts[:, axis] = xs
            ys = np.asarray(self.target_dist.density(jnp.asarray(pts)))
            label = "Target density (conditional slice, others=0)"
        plt.plot(xs, ys, color="red", linestyle="--", linewidth=2,
                 label=label)
        plt.xlabel("Value")
        plt.ylabel("Density")
        plt.legend()
        plt.title(f"Sample Histogram - {self.algorithm_name} (TPU-accelerated)")
        os.makedirs(output_dir, exist_ok=True)
        filename = (f"{output_dir}/hist_tpu_{self.target_dist.get_name()}_"
                    f"{self.algorithm_name}_dim{self.dim}_"
                    f"{self.num_iterations}iters")
        plt.savefig(filename, dpi=150, bbox_inches="tight")
        if show:
            plt.show()
        plt.close()
        return filename

    # ------------------------------------------------------------- benchmark
    def benchmark_performance(self, num_samples_list=(1000, 5000, 10000, 50000)):
        """Throughput sweep (simulation_gpu.py:252-311).  Reports compiled
        steady-state rates; the first entry includes compile time separately.

        A completed run's results (``_result`` / chain / walltime) are
        snapshotted before the sweep and restored afterwards, so calling this
        after :meth:`generate_samples` does NOT discard that run —
        ``acceptance_rate()`` etc. keep answering for the original run."""
        results = {"sample_sizes": list(num_samples_list), "times": [],
                   "samples_per_sec": [], "mh_steps_per_sec": []}
        orig = self.num_iterations
        saved = (self._result, self._chain_np, self._elapsed)
        try:
            for n in num_samples_list:
                self.reset()
                self.num_iterations = n
                t0 = time.time()
                self.generate_samples(verbose=False)
                dt = time.time() - t0
                steps = n * self.num_chains * (len(self.beta_ladder)
                                               if self.is_pt else 1)
                results["times"].append(dt)
                results["samples_per_sec"].append(n / dt)
                results["mh_steps_per_sec"].append(steps / dt)
                print(f"  {n} samples: {dt:.3f}s, {steps / dt:,.0f} MH steps/s")
        finally:
            self.num_iterations = orig
            self._result, self._chain_np, self._elapsed = saved
        return results
