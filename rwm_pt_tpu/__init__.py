"""rwm_pt_tpu — TPU-native Random Walk Metropolis + Parallel Tempering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``aidanmrli/rwm-pt-pytorch`` (mounted read-only at /root/reference): RWM and
PT-RWM samplers over a library of analytic targets, built around fused
``lax.scan`` step kernels, counter-based PRNG, vectorized chain batches, and
mesh-sharded execution instead of the reference's sequential host loop.
"""

__version__ = "0.1.0"

from . import targets  # noqa: F401
