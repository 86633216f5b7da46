"""Checkpoint/resume, CPU-semantics PT, and profiling-utility tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwm_pt_tpu.api import MCMCSimulation
from rwm_pt_tpu.kernels import run_pt, run_rwm
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import MultivariateNormal
from rwm_pt_tpu.utils import (DeviceTimer, memory_stats,
                              throughput_forensics)


def test_rwm_resume_continues_run(key):
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    r1 = run_rwm(tgt, prop, key, num_chains=8, num_iterations=200, burn_in=50)
    assert int(r1.state.step) == 250
    r2 = run_rwm(tgt, prop, jax.random.fold_in(key, 9), num_chains=8,
                 num_iterations=300, burn_in=50, resume_state=r1.state)
    assert int(r2.state.step) == 550
    # accumulators are cumulative; normalization uses cumulative steps
    assert int(r2.state.accept_count.max()) <= 500
    assert float(r2.acceptance_rate.max()) <= 1.0
    # states actually moved in the second segment
    assert not np.array_equal(np.asarray(r1.state.x), np.asarray(r2.state.x))


def test_resume_uses_fresh_randomness(key):
    """Resumed segment must not replay the first segment's random stream."""
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    r1 = run_rwm(tgt, prop, key, num_chains=4, num_iterations=100, burn_in=0)
    r2 = run_rwm(tgt, prop, key, num_chains=4, num_iterations=100, burn_in=0,
                 resume_state=r1.state)
    # segment 2 starting from r1 with the same base key: increments differ
    # because keys fold the absolute step counter
    d1 = np.asarray(r1.state.x) - 0.0
    d2 = np.asarray(r2.state.x) - np.asarray(r1.state.x)
    assert not np.allclose(d1, d2)


def test_simulation_checkpoint_resume_roundtrip(tmp_path, key):
    sim = MCMCSimulation(dim=3, sigma=1.0, num_iterations=300,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         seed=5, burn_in=50, num_chains=4, record_chain=False)
    sim.generate_samples(verbose=False)
    path = str(tmp_path / "ckpt.npz")
    sim.save_checkpoint(path)
    state, meta = sim.restore_state(path)
    assert int(state.step) == 350
    assert meta["seed"] == 5
    res = sim.resume(path, num_iterations=200)
    assert int(res.state.step) == 550


def test_pt_cpu_semantics(key):
    """CPU semantics: swap events replace MH moves (pt_rwm.py:169-184) and
    are not burn-in gated."""
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)
    betas = jnp.array([1.0, 0.5, 0.25])
    n, b, se = 100, 50, 10
    res = run_pt(tgt, prop, key, betas, num_chains=4, num_iterations=n,
                 burn_in=b, swap_every=se, cpu_semantics=True)
    # swap events at every step s in 1..150 with s % 10 == 0 => 15 events
    assert int(res.state.swap_attempt_count) == 15 * 2
    # MH moves happen only on the 135 non-swap steps; post-burn-in are 90 of
    # them => per-rung accept counts bounded accordingly
    assert int(res.state.accept_count.max()) <= 100 - 10
    # GPU semantics for comparison: swaps gated post burn-in
    res_gpu = run_pt(tgt, prop, key, betas, num_chains=4, num_iterations=n,
                     burn_in=b, swap_every=se, cpu_semantics=False)
    assert int(res_gpu.state.swap_attempt_count) == 10 * 2


def test_device_timer_and_memory_stats(key):
    timer = DeviceTimer()
    out = timer.run(lambda: jnp.sum(jnp.ones((100, 100))))
    assert timer.elapsed > 0
    assert float(out) == 10000.0
    stats = memory_stats()
    assert isinstance(stats, dict)


def test_throughput_forensics(key):
    tgt = MultivariateNormal.create(3)
    prop = NormalProposal.create(3, 1.0)

    def chunk(k):
        return run_rwm(tgt, prop, k, num_chains=16, num_iterations=200,
                       burn_in=0)

    report = throughput_forensics(chunk, key, num_chunks=3, verbose=False)
    assert len(report["chunk_times"]) == 3
    assert np.isfinite(report["rate_degradation"])
    # healthy steady-state: no order-of-magnitude degradation
    assert report["rate_degradation"] < 10.0
