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


def test_checkpoint_path_without_npz_suffix(tmp_path):
    """save_checkpoint(p)/resume(p) must agree even when p lacks '.npz'
    (np.savez appends it silently)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=300, algorithm="RWM",
                         target_dist="MultivariateNormal", num_chains=8,
                         burn_in=50, seed=3, record_chain=False)
    sim.generate_samples(verbose=False)
    p = str(tmp_path / "ckpt" / "state")          # no suffix
    sim.save_checkpoint(p)
    res = sim.resume(p, num_iterations=100)
    assert int(res.state.step) == 350 + 100


def test_thinned_chain_excludes_burn_in(key):
    """record_every > 1 must still trim burn-in rows from the chain
    (entry k is the state after step (k+1)*rec)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=400, algorithm="RWM",
                         target_dist="MultivariateNormal", num_chains=4,
                         burn_in=100, seed=3, record_chain=True,
                         record_every=5)
    chain = sim.generate_samples(verbose=False)
    n_rec_total = (100 + 400) // 5
    assert chain.shape == (n_rec_total - 100 // 5, 2)


def test_cpu_semantics_resume_preserved(tmp_path):
    """resume() must keep cpu_semantics (a silent semantics switch mid-run
    would mix two different algorithms)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=200, algorithm="PT",
                         target_dist="MultivariateNormal", num_chains=8,
                         burn_in=40, seed=3, record_chain=False,
                         geom_temp_spacing=True, swap_every=10,
                         cpu_semantics=True)
    sim.generate_samples(verbose=False)
    p = str(tmp_path / "c.npz")
    sim.save_checkpoint(p)
    res = sim.resume(p, num_iterations=100)
    # under cpu semantics the hot rung attempts MH every step while colder
    # rungs skip swap steps; the normalization must not exceed 1.0
    assert float(jnp.max(res.acceptance_rate)) <= 1.0
    assert int(res.state.step) == 240 + 100


def test_cpu_semantics_acceptance_normalization(key):
    """Under cpu_semantics, rungs <T-1 attempt MH only on non-swap steps;
    with a high-acceptance proposal the reported rate must stay near the
    true per-attempt rate, not be deflated by 1/swap_every."""
    target = MultivariateNormal.create(2)
    prop = NormalProposal.create(2, 1e-6)   # tiny steps -> acceptance ~1
    betas = jnp.geomspace(1.0, 0.1, 4).astype(jnp.float32)
    res = run_pt(target, prop, key, betas, num_chains=16, num_iterations=400,
                 burn_in=0, swap_every=4, cpu_semantics=True)
    # every attempted MH move accepts; a mis-normalized rate would be ~0.75
    # for the cold rungs (1 - 1/swap_every)
    assert float(jnp.min(res.acceptance_rate)) > 0.99


def test_periodic_checkpointing_matches_uninterrupted(tmp_path):
    """Segmented runs (checkpoint_every) reproduce the uninterrupted run
    bitwise: per-step keys are folded from the absolute step counter, so
    segment boundaries never perturb the stream."""
    kw = dict(dim=3, sigma=0.8, num_iterations=300, algorithm="RWM",
              target_dist="MultivariateNormal", seed=5, burn_in=50,
              num_chains=8, record_chain=False)
    a = MCMCSimulation(**kw)
    a.generate_samples(verbose=False)
    b = MCMCSimulation(**kw)
    out = b.generate_samples(verbose=False, checkpoint_every=120,
                             checkpoint_path=str(tmp_path / "ck"))
    assert out is None
    assert (tmp_path / "ck.npz").exists()
    np.testing.assert_array_equal(np.asarray(a._result.state.x),
                                  np.asarray(b._result.state.x))
    assert a.acceptance_rate() == b.acceptance_rate()


def test_periodic_checkpointing_pt(tmp_path):
    kw = dict(dim=2, sigma=1.0, num_iterations=200, algorithm="PT",
              target_dist="MultivariateNormal", seed=7, burn_in=40,
              num_chains=4, swap_every=10, record_chain=False)
    a = MCMCSimulation(**kw)
    a.generate_samples(verbose=False)
    b = MCMCSimulation(**kw)
    b.generate_samples(verbose=False, checkpoint_every=70,
                       checkpoint_path=str(tmp_path / "pt_ck"))
    np.testing.assert_array_equal(np.asarray(a._result.state.x),
                                  np.asarray(b._result.state.x))
    assert (a._result.state.swap_attempt_count
            == b._result.state.swap_attempt_count)


def test_periodic_checkpointing_resumable_after_kill(tmp_path):
    """A run killed between segments continues from the last checkpoint and
    lands on the same step count it would have reached."""
    kw = dict(dim=3, sigma=0.8, num_iterations=100, algorithm="RWM",
              target_dist="MultivariateNormal", seed=5, burn_in=20,
              num_chains=8, record_chain=False)
    partial = MCMCSimulation(**{**kw, "num_iterations": 60})
    partial.generate_samples(verbose=False, checkpoint_every=60,
                             checkpoint_path=str(tmp_path / "ck"))
    survivor = MCMCSimulation(**kw)
    res = survivor.resume(str(tmp_path / "ck.npz"), num_iterations=40)
    assert int(res.state.step) == 20 + 100   # burn_in + all iterations


def test_periodic_checkpointing_validation(tmp_path):
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=50,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=2, record_chain=False)
    with pytest.raises(ValueError, match="checkpoint_path"):
        sim.generate_samples(verbose=False, checkpoint_every=10)
    rec = MCMCSimulation(dim=2, sigma=1.0, num_iterations=50,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=2, record_chain=True)
    with pytest.raises(ValueError, match="record_chain"):
        rec.generate_samples(verbose=False, checkpoint_every=10,
                             checkpoint_path=str(tmp_path / "x"))


def test_checkpoint_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-checkpoint-write must not destroy the previous good
    checkpoint: writes go to a temp file and os.replace over the target."""
    kw = dict(dim=2, sigma=1.0, num_iterations=40, algorithm="RWM",
              target_dist="MultivariateNormal", seed=1, burn_in=10,
              num_chains=4, record_chain=False)
    path = str(tmp_path / "ck")
    sim = MCMCSimulation(**kw)
    sim.generate_samples(verbose=False, checkpoint_every=20,
                         checkpoint_path=path)
    good = (tmp_path / "ck.npz").read_bytes()

    # simulate a kill inside the savez of the *next* write
    sim2 = MCMCSimulation(**kw)

    def boom(path_, flat):
        open(path_, "wb").write(b"partial garbage")
        raise KeyboardInterrupt

    monkeypatch.setattr(MCMCSimulation, "_savez",
                        lambda self, p, f: boom(p, f))
    with pytest.raises(KeyboardInterrupt):
        sim2.generate_samples(verbose=False, checkpoint_every=20,
                              checkpoint_path=path)
    # the last good checkpoint survives untouched and still loads
    assert (tmp_path / "ck.npz").read_bytes() == good
    survivor = MCMCSimulation(**kw)
    res = survivor.resume(path + ".npz", num_iterations=5)
    assert int(res.state.step) == 10 + 40 + 5


def test_checkpointed_zero_iterations_rejected():
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=0, algorithm="RWM",
                         target_dist="MultivariateNormal", num_chains=2,
                         record_chain=False)
    with pytest.raises(ValueError, match="num_iterations"):
        sim.generate_samples(verbose=False, checkpoint_every=10,
                             checkpoint_path="/tmp/zz")


def test_resume_matches_uninterrupted_bitwise(tmp_path):
    """The unified resume contract: crash -> save_checkpoint -> resume()
    reproduces the uninterrupted run bit-for-bit, exactly like
    checkpoint_every segments (same base key + absolute-step key folds)."""
    kw = dict(dim=3, sigma=0.8, num_iterations=100, algorithm="RWM",
              target_dist="MultivariateNormal", seed=5, burn_in=20,
              num_chains=8, record_chain=False)
    full = MCMCSimulation(**kw)
    full.generate_samples(verbose=False)
    part = MCMCSimulation(**{**kw, "num_iterations": 60})
    part.generate_samples(verbose=False)
    p = str(tmp_path / "ck.npz")
    part.save_checkpoint(p)
    res = MCMCSimulation(**kw).resume(p, num_iterations=40)
    np.testing.assert_array_equal(np.asarray(full._result.state.x),
                                  np.asarray(res.state.x))
    np.testing.assert_array_equal(np.asarray(full._result.state.accept_count),
                                  np.asarray(res.state.accept_count))


def test_resume_matches_uninterrupted_bitwise_pt(tmp_path):
    kw = dict(dim=2, sigma=1.0, num_iterations=120, algorithm="PT",
              target_dist="MultivariateNormal", seed=9, burn_in=30,
              num_chains=4, swap_every=10, record_chain=False)
    full = MCMCSimulation(**kw)
    full.generate_samples(verbose=False)
    part = MCMCSimulation(**{**kw, "num_iterations": 50})
    part.generate_samples(verbose=False)
    p = str(tmp_path / "ptck.npz")
    part.save_checkpoint(p)
    res = MCMCSimulation(**kw).resume(p, num_iterations=70)
    np.testing.assert_array_equal(np.asarray(full._result.state.x),
                                  np.asarray(res.state.x))
    assert int(full._result.state.swap_attempt_count) == int(
        res.state.swap_attempt_count)


def test_checkpoint_records_engine(tmp_path):
    """Checkpoints record which engine produced the state (VERDICT r2 #6)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=50, algorithm="RWM",
                         target_dist="MultivariateNormal", num_chains=4,
                         record_chain=False, seed=3)
    sim.generate_samples(verbose=False)
    path = str(tmp_path / "ck.npz")
    sim.save_checkpoint(path)
    _, meta = sim.load_checkpoint(path)
    assert meta["engine"] == "scan"


def test_resume_honors_checkpoint_engine(tmp_path, monkeypatch):
    """A scan-written checkpoint must resume on the scan engine even when the
    resuming simulation would auto-select Pallas, so the bitwise continuation
    contract can't silently degrade to a statistical one."""
    kw = dict(dim=2, sigma=1.0, num_iterations=40, algorithm="RWM",
              target_dist="MultivariateNormal", num_chains=4,
              record_chain=False, seed=3)
    sim = MCMCSimulation(**kw)
    sim.generate_samples(verbose=False)
    path = str(tmp_path / "ck.npz")
    sim.save_checkpoint(path)

    survivor = MCMCSimulation(**kw)
    # pretend Pallas is eligible: if resume() ignored the checkpoint's engine
    # it would dispatch run_rwm_pallas (which cannot run on the CPU backend)
    # instead of the recorded scan engine
    monkeypatch.setattr(survivor, "_use_pallas", lambda: True)
    res = survivor.resume(path, num_iterations=30)
    assert survivor._engine_used == "scan"
    assert int(res.state.step) == 70


def test_progress_bar_prints_rwm(capsys):
    """progress_bar=True emits periodic in-run lines from the compiled loop
    (VERDICT r2 #4: the kwarg must not be dead surface)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=2500,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         num_chains=4, record_chain=False, seed=1)
    sim.generate_samples(progress_bar=True, verbose=False)
    out = capsys.readouterr().out
    assert "progress: step 1,000/" in out
    assert "progress: step 2,000/" in out


def test_progress_bar_prints_pt(capsys):
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=2200,
                         algorithm="PT", target_dist="MultivariateNormal",
                         num_chains=2, record_chain=False, seed=1)
    sim.generate_samples(progress_bar=True, verbose=False)
    out = capsys.readouterr().out
    assert "progress: step" in out


def test_progress_bar_does_not_perturb_run():
    """The scan engine reports via jax.debug.callback; the trajectory must be
    bitwise identical with and without progress reporting."""
    kw = dict(dim=2, sigma=1.0, num_iterations=2100, algorithm="RWM",
              target_dist="MultivariateNormal", num_chains=4,
              record_chain=False, seed=2)
    a = MCMCSimulation(**kw)
    a.generate_samples(progress_bar=True, verbose=False)
    b = MCMCSimulation(**kw)
    b.generate_samples(progress_bar=False, verbose=False)
    np.testing.assert_array_equal(np.asarray(a._result.state.x),
                                  np.asarray(b._result.state.x))


def test_progress_state_is_per_run():
    """Two concurrently progressing runs must keep independent rate state
    (round-3 verdict: the old function-attribute version interleaved)."""
    from rwm_pt_tpu.kernels.rwm import _progress_report, _progress_state
    _progress_state.clear()
    # interleave two runs' callbacks: run A at steps 100, 200; run B jumps
    # in between with unrelated step numbers
    _progress_report(1, 100, 1000)
    _progress_report(2, 7000, 8000)
    _progress_report(1, 200, 1000)
    assert _progress_state[1][0] == 200
    assert _progress_state[2][0] == 7000
    # eviction keeps the dict bounded
    for rid in range(3, 200):
        _progress_report(rid, 1, 10)
    assert len(_progress_state) <= 64


def test_progress_run_id_distinct_per_key():
    from rwm_pt_tpu.kernels.rwm import progress_run_id
    ids = {int(progress_run_id(jax.random.key(s))) for s in range(32)}
    assert len(ids) == 32  # distinct with overwhelming probability


def test_benchmark_preserves_completed_run():
    """benchmark_performance must not discard a completed run's results
    (round-3 verdict: it silently reset() the simulation)."""
    sim = MCMCSimulation(dim=2, sigma=1.0, num_iterations=400,
                         algorithm="RWM", target_dist="MultivariateNormal",
                         seed=5, burn_in=50, num_chains=8)
    chain = sim.generate_samples(verbose=False)
    acc = sim.acceptance_rate()
    esjd = sim.expected_squared_jump_distance()
    elapsed = sim.elapsed_time
    sim.benchmark_performance(num_samples_list=(50, 100))
    assert sim.acceptance_rate() == acc
    assert sim.expected_squared_jump_distance() == esjd
    assert sim.elapsed_time == elapsed
    assert sim.num_iterations == 400
    np.testing.assert_array_equal(np.asarray(sim._get_chain()),
                                  np.asarray(chain))
