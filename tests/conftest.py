"""Test configuration: run the suite on a virtual 8-device CPU mesh.

This gives every test deterministic multi-device semantics without TPU
hardware — the capability the reference never had (its whole multi-device
story is a cuda->cpu fallback, e.g. tests/test_rwm_correctness.py:45).
"""
import os

# Must be set before jax is imported anywhere.  Assign unconditionally: the
# environment may pre-set JAX_PLATFORMS to a hardware plugin (e.g. a tunneled
# TPU) whose host<->device transfers are far too slow for a test suite.
#
# Set RWM_PT_TPU_TESTS=1 to instead run on the real TPU backend — for the
# hardware-only tests (Pallas PRNG statistics):
#   RWM_PT_TPU_TESTS=1 pytest tests/test_pallas_kernels.py -q
# Only target specific files in this mode: the mesh-sharding tests need 8
# devices and will fail on a single chip.
_TPU_MODE = bool(os.environ.get("RWM_PT_TPU_TESTS"))
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The full suite compiles thousands of XLA:CPU programs across 8 virtual
    devices in one process; letting them accumulate has produced
    deterministic segfaults inside LLVM during a *trivial* late-suite
    compile (jnp.mean in test_targets.py — crashes at the same test when
    run after the full prefix, passes in isolation).  Dropping the jit
    cache per module keeps peak JIT-code memory bounded; cross-module
    recompiles are cheap relative to suite runtime."""
    yield
    jax.clear_caches()
