"""Device-mesh and sharding helpers.

TPU-native scale-out design (SURVEY.md §2.9, §5):

* ``chains`` is the data-parallel axis: every chain (replica) is independent,
  so sharding the minor-most chain axis over the mesh is communication-free —
  it subsumes the reference's embarrassingly-parallel Slurm seed arrays
  (/root/reference/run_pt_gpu.sbatch:12) as an in-mesh batch axis.
* ``temps`` is the temperature-parallel axis for pod-scale PT: replica-exchange
  between adjacent rungs becomes a neighbor shift along the temp axis.  The
  swap kernel is written with ``jnp.roll`` / shifted selects, which XLA lowers
  to ``CollectivePermute`` over ICI when the axis is sharded — no hand-written
  NCCL-style code, per the scaling-book recipe: annotate shardings, let XLA
  insert collectives.
* Pooled diagnostics (mean acceptance, ESJD) are tiny per-chain vectors;
  reducing them produces a single ``AllReduce`` (psum) at readout.

Multi-host: call :func:`initialize_distributed` (a thin
``jax.distributed.initialize`` wrapper) before building the mesh; the same
code paths then span hosts, with DCN crossing only the temps axis if so
configured.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host runtime bring-up.

    On a TPU pod, ``jax.distributed.initialize()`` auto-detects the
    coordinator from the TPU metadata; on a lone host auto-detection fails,
    which we treat as "single host" and continue (so CLIs can pass
    ``--multihost`` unconditionally, e.g. scripts/launch_pt_pod.sh)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:  # no coordinator -> single host
        if kwargs:
            raise
        print(f"[parallel] single-host run (distributed init skipped: {e})")


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("chains",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: a 1-D ``('chains',)`` mesh over every device.  Pass
    ``axis_sizes=(n_chain_shards, n_temp_shards)`` with
    ``axis_names=('chains', 'temps')`` for the 2-D PT layout.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    if int(np.prod(axis_sizes)) != devices.size:
        raise ValueError(f"mesh {tuple(axis_sizes)} does not cover "
                         f"{devices.size} devices")
    return Mesh(devices.reshape(axis_sizes), axis_names)


def chain_sharding(mesh: Mesh, ndim: int, chain_axis: int = -1) -> NamedSharding:
    """NamedSharding placing the chain axis (minor-most by convention) on the
    'chains' mesh axis and replicating everything else."""
    spec = [None] * ndim
    spec[chain_axis] = "chains"
    return NamedSharding(mesh, P(*spec))


def pt_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for PT state arrays laid out ``(..., T, C)``: temps on the
    'temps' mesh axis (if present), chains on 'chains'."""
    spec = [None] * ndim
    spec[-1] = "chains"
    if "temps" in mesh.axis_names and ndim >= 2:
        spec[-2] = "temps"
    return NamedSharding(mesh, P(*spec))


def shard_init_states(x, mesh: Mesh, pt: bool = False):
    """Place initial states on the mesh: ``(d, C)`` for RWM, ``(d, T, C)``
    for PT."""
    sh = pt_sharding(mesh, x.ndim) if pt else chain_sharding(mesh, x.ndim)
    return jax.device_put(x, sh)


def pooled_mean(per_chain: jax.Array) -> jax.Array:
    """Global mean of a per-chain diagnostic — a single psum/AllReduce when
    sharded (replaces the reference's host-side scalar accumulation)."""
    return jnp.mean(per_chain)
