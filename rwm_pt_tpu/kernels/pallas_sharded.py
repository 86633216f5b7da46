"""Sharded Pallas engine: the VMEM-resident kernels over a device mesh.

The scan engine shards via jit + sharding annotations (``parallel/mesh.py``),
but the Pallas whole-run kernels (`pallas_rwm`, `pallas_pt`) are single-chip
programs.  Chains are *communication-free* data parallelism (SURVEY.md §2.9:
every replica is independent, swaps happen between rungs of the SAME replica),
so the multi-chip form is simply ``shard_map`` over the ``chains`` mesh axis:
each device runs the full VMEM-resident kernel on its local slice of chains,
with a per-shard PRNG key, and the per-chain outputs concatenate back into
global arrays.  No collectives are emitted at all — pod throughput is
N_devices x the single-chip Pallas rate (~1.4e9 PT MH steps/s/chip,
docs/PERFORMANCE.md).

Temperature-sharded meshes are rejected: the Pallas PT kernel keeps the whole
ladder of one replica on one core (its sequential swap sweep is VMEM-local).
Use the scan engine (`kernels/pt.py`) when the ``temps`` axis must span chips.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .pallas_pt import run_pt_pallas
from .pallas_rwm import run_rwm_pallas
from .pt import PTResult, PTState
from .rwm import RWMResult, RWMState


def _chain_shards(mesh: Mesh) -> int:
    if "chains" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'chains' axis")
    if "temps" in mesh.axis_names and mesh.shape["temps"] != 1:
        raise ValueError(
            "the Pallas engine keeps each replica's full ladder on one core; "
            "temperature-sharded meshes need the scan engine (kernels/pt.py)")
    return mesh.shape["chains"]


def _local_count(num_chains: int, shards: int, what: str) -> int:
    if num_chains % shards:
        raise ValueError(f"{what}={num_chains} not divisible by "
                         f"{shards} chain shards")
    return num_chains // shards


_RWM_SPECS = RWMResult(
    state=RWMState(x=P(None, "chains"), logp=P("chains"),
                   accept_count=P("chains"), sum_sq_jump=P("chains"),
                   step=P()),
    acceptance_rate=P("chains"), esjd=P("chains"), chain=None)

_PT_SPECS = PTResult(
    state=PTState(x=P(None, None, "chains"), logp=P(None, "chains"),
                  accept_count=P(None, "chains"), swap_attempt_count=P(),
                  swap_accept_count=P("chains"),
                  sum_beta_sq_jump=P("chains"),
                  sum_sq_jump_cold=P("chains"), step=P()),
    swap_acceptance_rate=P("chains"), pt_esjd=P("chains"),
    cold_esjd=P("chains"), acceptance_rate=P(None, "chains"), chain=None)


# jit-of-shard_map: without the outer jit the wrapper dispatches eagerly,
# which costs ~seconds per op over the tunneled dev chip (measured 18x slower)
@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_chains", "num_iterations", "burn_in",
                     "block", "interpret"))
def run_rwm_pallas_sharded(target: Any, key, mesh: Mesh, *,
                           num_chains: int, num_iterations: int,
                           burn_in: int = 0, beta: float = 1.0,
                           base_variance: float = None, proposal: Any = None,
                           init_states=None, block: int = 512,
                           interpret: bool = False) -> RWMResult:
    """Mesh-sharded :func:`run_rwm_pallas`.  Same metrics contract; the
    per-chain output arrays are global ``(num_chains,)`` with the chain axis
    sharded over the mesh's ``chains`` axis."""
    shards = _chain_shards(mesh)
    local_c = _local_count(num_chains, shards, "num_chains")
    keys = jax.random.split(key, shards)

    in_specs = (P("chains"),)
    args = (keys,)
    if init_states is not None:
        in_specs += (P(None, "chains"),)            # global (d, C)
        args += (init_states,)

    def local_run(k, *maybe_init):
        init = maybe_init[0] if maybe_init else None
        return run_rwm_pallas(target, k[0], base_variance=base_variance,
                              num_chains=local_c,
                              num_iterations=num_iterations, burn_in=burn_in,
                              beta=beta, init_states=init, block=block,
                              proposal=proposal, interpret=interpret)

    f = jax.shard_map(local_run, mesh=mesh, in_specs=in_specs,
                      out_specs=_RWM_SPECS, check_vma=False)
    return f(*args)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_chains", "num_iterations", "burn_in",
                     "swap_every", "block", "interpret"))
def run_pt_pallas_sharded(target: Any, key, betas, mesh: Mesh, *,
                          num_chains: int, num_iterations: int,
                          burn_in: int = 0, swap_every: int = 100,
                          base_variance: float = None, proposal: Any = None,
                          init_states=None, block: int = 2048,
                          interpret: bool = False) -> PTResult:
    """Mesh-sharded :func:`run_pt_pallas`: every device advances its local
    chain slice through the full temperature ladder (betas replicated)."""
    shards = _chain_shards(mesh)
    local_c = _local_count(num_chains, shards, "num_chains")
    keys = jax.random.split(key, shards)

    in_specs = (P("chains"), P())
    args = (keys, betas)
    if init_states is not None:
        in_specs += (P(None, None, "chains"),)      # global (d, T, C)
        args += (init_states,)

    def local_run(k, b, *maybe_init):
        init = maybe_init[0] if maybe_init else None
        return run_pt_pallas(target, k[0], b, base_variance=base_variance,
                             num_chains=local_c,
                             num_iterations=num_iterations, burn_in=burn_in,
                             swap_every=swap_every, init_states=init,
                             block=block, proposal=proposal,
                             interpret=interpret)

    f = jax.shard_map(local_run, mesh=mesh, in_specs=in_specs,
                      out_specs=_PT_SPECS, check_vma=False)
    return f(*args)
