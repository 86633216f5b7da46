"""Mesh / sharding layer (the reference has no in-process distribution at all —
its scale-out is Slurm seed arrays, run_pt_gpu.sbatch:12)."""
from .mesh import (chain_sharding, initialize_distributed, make_mesh,
                   pooled_mean, pt_sharding, shard_init_states)

__all__ = ["initialize_distributed", "make_mesh", "chain_sharding", "pt_sharding", "shard_init_states",
           "pooled_mean"]
