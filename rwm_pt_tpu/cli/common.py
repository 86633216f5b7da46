"""Shared CLI plumbing for the experiment entry points.

Replicates the argument surface of the reference scripts
(/root/reference/experiment_RWM_GPU.py:503-574, experiment_pt_GPU.py:495-555):
target selection with per-target hyperparameters, proposal selection, seeds,
burn-in, plus TPU-specific additions (``--num_chains`` vectorized replicas,
``--cpu`` to force the CPU backend, ``--x64`` mirroring
``--use_double_precision``).
"""
from __future__ import annotations

import argparse
import json
import os


def add_target_args(parser: argparse.ArgumentParser):
    parser.add_argument("--dim", type=int, default=20,
                        help="Dimension of the target distribution")
    parser.add_argument("--target", type=str, default="MultivariateNormal",
                        help="Target distribution")
    parser.add_argument("--hybrid_rosenbrock_n1", type=int, default=3,
                        help="Block length parameter for HybridRosenbrock")
    parser.add_argument("--hybrid_rosenbrock_n2", type=int, default=5,
                        help="Number of blocks/rows for HybridRosenbrock")
    parser.add_argument("--neal_funnel_mu_v", type=float, default=0.0)
    parser.add_argument("--neal_funnel_sigma_v_sq", type=float, default=9.0)
    parser.add_argument("--neal_funnel_mu_z", type=float, default=0.0)
    parser.add_argument("--super_funnel_J", type=int, default=5)
    parser.add_argument("--super_funnel_K", type=int, default=3)
    parser.add_argument("--super_funnel_n_per_group", type=int, default=20)
    parser.add_argument("--super_funnel_prior_hypermean_std", type=float,
                        default=10.0)
    parser.add_argument("--super_funnel_prior_tau_scale", type=float,
                        default=2.5)


def add_run_args(parser: argparse.ArgumentParser, default_iters: int):
    parser.add_argument("--num_iters", type=int, default=default_iters)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--burn_in", type=int, default=1000)
    parser.add_argument("--num_chains", type=int, default=64,
                        help="Vectorized independent chains/replicas per config "
                             "(the reference runs 1)")
    parser.add_argument("--output_dir", type=str, default="data")
    parser.add_argument("--images_dir", type=str, default="images")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the JAX CPU backend")
    parser.add_argument("--use_mesh", action="store_true",
                        help="Shard chains over every available device "
                             "('chains' mesh axis; see parallel/mesh.py)")
    parser.add_argument("--rng", type=str, default="threefry2x32",
                        choices=["threefry2x32", "rbg"],
                        help="PRNG implementation; 'rbg' is ~25%% faster for "
                             "the scan engine on TPU")
    parser.add_argument("--multihost", action="store_true",
                        help="Initialize the jax.distributed multi-host "
                             "runtime before building the mesh (TPU pods; "
                             "no-op on a single host)")
    parser.add_argument("--x64", "--use_double_precision", action="store_true",
                        dest="use_double_precision",
                        help="Use float64 (mirrors the reference's "
                             "--use_double_precision)")


def configure_backend(args):
    """Apply backend flags.  Must run before heavy jax usage."""
    import jax
    if getattr(args, "cpu", False):
        jax.config.update("jax_platforms", "cpu")
    if getattr(args, "use_double_precision", False):
        jax.config.update("jax_enable_x64", True)
    if getattr(args, "multihost", False):
        from ..parallel import initialize_distributed
        initialize_distributed()
    return jax


def target_kwargs_from_args(args) -> dict:
    """Assemble per-target kwargs (reference experiment_RWM_GPU.py:542-557)."""
    kwargs = {}
    if args.target == "HybridRosenbrock":
        kwargs["n1"] = args.hybrid_rosenbrock_n1
        kwargs["n2"] = args.hybrid_rosenbrock_n2
    elif args.target == "NealFunnel":
        kwargs["mu_v"] = args.neal_funnel_mu_v
        kwargs["sigma_v_sq"] = args.neal_funnel_sigma_v_sq
        kwargs["mu_z"] = args.neal_funnel_mu_z
    elif args.target == "SuperFunnel":
        kwargs["J"] = args.super_funnel_J
        kwargs["K"] = args.super_funnel_K
        kwargs["n_per_group"] = args.super_funnel_n_per_group
        kwargs["prior_hypermean_std"] = args.super_funnel_prior_hypermean_std
        kwargs["prior_tau_scale"] = args.super_funnel_prior_tau_scale
    return kwargs


def resolve_actual_dim(args) -> int:
    from ..targets import (calculate_hybrid_rosenbrock_dim,
                           calculate_super_funnel_dim)
    if args.target == "HybridRosenbrock":
        return calculate_hybrid_rosenbrock_dim(args.hybrid_rosenbrock_n1,
                                               args.hybrid_rosenbrock_n2)
    if args.target == "SuperFunnel":
        return calculate_super_funnel_dim(args.super_funnel_J,
                                          args.super_funnel_K)
    if args.target == "EvenRosenbrock" and args.dim % 2:
        raise SystemExit("EvenRosenbrock requires an even --dim")
    return args.dim


def save_json(data: dict, path: str):
    # multi-host: every process runs the same program; only host 0 writes
    import jax
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    print(f"   Results saved to: {path}")


def build_proposal_config(proposal_name: str, scale_param: float, dim: int,
                          anisotropic=None) -> dict:
    """Scale-parameter -> proposal_config mapping of the reference sweep
    (experiment_RWM_GPU.py:215-243): Normal/Laplace variance = scale^2/dim,
    UniformRadius radius = scale."""
    if proposal_name == "Normal":
        return {"name": "Normal",
                "params": {"base_variance_scalar": (scale_param ** 2) / dim}}
    if proposal_name == "Laplace":
        eff = (scale_param ** 2) / dim
        if anisotropic is not None:
            import numpy as np
            vec = (np.asarray(anisotropic, dtype=float) * eff).tolist()
        else:
            vec = eff
        return {"name": "Laplace", "params": {"base_variance_vector": vec}}
    if proposal_name == "UniformRadius":
        return {"name": "UniformRadius", "params": {"base_radius": scale_param}}
    raise ValueError(f"Unknown proposal name: {proposal_name}")
