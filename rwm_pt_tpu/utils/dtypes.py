"""Float-precision selection.

The reference exposes ``--use_double_precision`` (experiment_pt_GPU.py:525)
which flips every tensor to float64.  The JAX-native analog is the global
``jax_enable_x64`` switch (set by the CLIs' ``--x64`` flag,
cli/common.py:64); this helper lets targets/kernels construct their arrays in
whichever float is active instead of hard-coding float32.

The Pallas engine stays float32-only (the hardware-PRNG pipeline is f32);
``MCMCSimulation`` excludes it from auto-selection when x64 is on.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import config as _config


def default_float():
    """jnp.float64 when ``jax_enable_x64`` is active, else jnp.float32."""
    return jnp.float64 if _config.jax_enable_x64 else jnp.float32
