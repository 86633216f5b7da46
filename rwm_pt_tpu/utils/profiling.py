"""Tracing / profiling / performance forensics.

TPU-native replacement for the reference's ad-hoc instrumentation
(SURVEY.md §5): CUDA-event timing (rwm_gpu_optimized.py:446-473) becomes
fetch-forced walltime; ``torch.cuda.memory_allocated`` diagnostics
(rwm_gpu_optimized.py:536-551) become device memory stats; the forensic suite
``tests/debug_pt_performance.py`` (chunked rate degradation :32-97, memory
leak detection :99-158) becomes :func:`throughput_forensics`; and — unlike the
reference, which has no profiler integration at all — :func:`profile_trace`
captures real XLA traces viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


class DeviceTimer:
    """Walltime for device work, forcing completion with a scalar fetch.

    ``block_until_ready`` alone does not reliably block on tunneled/remote
    device platforms, so completion is forced by materializing a scalar
    reduction of the result (the TPU analogue of CUDA-event timing,
    reference rwm_gpu_optimized.py:446-473).
    """

    def __init__(self):
        self.elapsed = None

    def run(self, fn: Callable, *args, **kwargs):
        t0 = time.time()
        out = fn(*args, **kwargs)
        force(out)
        self.elapsed = time.time() - t0
        return out


def force(tree):
    """Force completion of device work with a scalar fetch (public alias)."""
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if isinstance(l, jax.Array)]
    if leaves:
        jnp.sum(leaves[0].ravel()[0:1]).item()
    return tree


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/rwm_pt_tpu_trace"):
    """Capture an XLA profiler trace (open with TensorBoard or Perfetto)."""
    with jax.profiler.trace(log_dir):
        yield log_dir


def memory_stats() -> dict:
    """Per-device memory statistics (bytes)."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except Exception:  # noqa: BLE001 - not all backends implement it
            s = None
        if s:
            out[str(d)] = {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use",
                                             "bytes_limit") if k in s}
    return out


def throughput_forensics(run_fn: Callable[[jax.Array], object],
                         key, num_chunks: int = 5,
                         verbose: bool = True) -> dict:
    """Chunked throughput measurement to detect rate degradation / leaks
    (reference debug_pt_performance.py:32-158).

    ``run_fn(key)`` should execute one fixed-size chunk of device work.
    Returns per-chunk times, the first/last rate ratio, and memory stats
    before/after.
    """
    mem_before = memory_stats()
    timer = DeviceTimer()
    timer.run(run_fn, key)  # compile warmup, excluded
    times = []
    for i in range(num_chunks):
        timer.run(run_fn, jax.random.fold_in(key, i + 1))
        times.append(timer.elapsed)
        if verbose:
            print(f"  chunk {i + 1}/{num_chunks}: {timer.elapsed:.3f}s")
    mem_after = memory_stats()
    degradation = times[-1] / times[0] if times[0] > 0 else float("nan")
    report = {
        "chunk_times": times,
        "rate_degradation": degradation,   # ~1.0 = healthy
        "memory_before": mem_before,
        "memory_after": mem_after,
    }
    if verbose:
        print(f"  rate degradation (last/first): {degradation:.3f}")
    return report
