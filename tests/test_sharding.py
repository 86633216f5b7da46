"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has no in-process distribution at all (SURVEY.md §2.9); these
tests validate the TPU-native scale-out story: chains sharded over the mesh
(communication-free data parallelism) and the temperature axis sharded with
swap exchanges lowering to collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwm_pt_tpu.kernels import pt_init, pt_step, run_pt, run_rwm
from rwm_pt_tpu.parallel import (chain_sharding, make_mesh, pt_sharding,
                                 shard_init_states)
from rwm_pt_tpu.proposals import NormalProposal
from rwm_pt_tpu.targets import MultivariateNormal


@pytest.fixture(scope="module")
def target():
    return MultivariateNormal.create(4)


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh((4, 2), ("chains", "temps"))
    assert mesh2.axis_names == ("chains", "temps")
    with pytest.raises(ValueError):
        make_mesh((3, 2), ("chains", "temps"))


def test_rwm_chains_sharded_matches_unsharded(target, key):
    """Sharding the chain axis must not change results (independent chains)."""
    prop = NormalProposal.create(4, 0.5)
    mesh = make_mesh()
    x0 = target.init_sample(key, 64).T  # (d, C)
    x0_sharded = shard_init_states(x0, mesh)
    assert x0_sharded.sharding.spec == P(None, "chains")
    r_plain = run_rwm(target, prop, key, num_chains=64, num_iterations=200,
                      burn_in=20, init_states=x0)
    r_shard = run_rwm(target, prop, key, num_chains=64, num_iterations=200,
                      burn_in=20, init_states=x0_sharded)
    np.testing.assert_allclose(np.asarray(r_plain.state.x),
                               np.asarray(r_shard.state.x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_plain.state.accept_count),
                                  np.asarray(r_shard.state.accept_count))


def test_pt_2d_mesh_step_with_temp_collectives(target, key):
    """Full PT step on a (chains=4, temps=2) mesh: the swap phase crosses the
    temps shard boundary (CollectivePermute) and must agree with the
    single-device run bit-for-bit."""
    prop = NormalProposal.create(4, 0.5)
    betas = jnp.geomspace(1.0, 0.01, 8).astype(jnp.float32)
    C = 32
    state = pt_init(target, key, betas, C)

    mesh = make_mesh((4, 2), ("chains", "temps"))
    x_sh = NamedSharding(mesh, P(None, "temps", "chains"))
    tc_sh = NamedSharding(mesh, P("temps", "chains"))
    c_sh = NamedSharding(mesh, P("chains"))
    rep = NamedSharding(mesh, P())
    sharded = state.replace(
        x=jax.device_put(state.x, x_sh),
        logp=jax.device_put(state.logp, tc_sh),
        accept_count=jax.device_put(state.accept_count, tc_sh),
        swap_attempt_count=jax.device_put(state.swap_attempt_count, rep),
        swap_accept_count=jax.device_put(state.swap_accept_count, c_sh),
        sum_beta_sq_jump=jax.device_put(state.sum_beta_sq_jump, c_sh),
        sum_sq_jump_cold=jax.device_put(state.sum_sq_jump_cold, c_sh),
        step=jax.device_put(state.step, rep))

    def step(st, k):
        return pt_step(st, k, target, prop, betas, burn_in=0, swap_every=1)

    out_plain = jax.jit(step)(state, key)
    out_shard = jax.jit(step)(sharded, key)
    np.testing.assert_allclose(np.asarray(out_plain.x),
                               np.asarray(out_shard.x), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out_plain.swap_accept_count),
        np.asarray(out_shard.swap_accept_count))
    assert int(out_shard.swap_attempt_count) == len(betas) - 1


def test_sharding_spec_helpers():
    mesh = make_mesh((4, 2), ("chains", "temps"))
    assert pt_sharding(mesh, 3).spec == P(None, "temps", "chains")
    assert chain_sharding(mesh, 2).spec == P(None, "chains")


def test_graft_entry_and_dryrun():
    """The driver entry points compile and execute."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert int(out.step) == 1
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)


def test_pt_full_run_2d_mesh_matches_unsharded(target, key):
    """The whole jitted run_pt (scan over steps, swaps included) on a
    (chains, temps) mesh must agree with the single-device run."""
    from rwm_pt_tpu.kernels import run_pt

    prop = NormalProposal.create(4, 0.5)
    betas = jnp.geomspace(1.0, 0.01, 8).astype(jnp.float32)
    C = 32
    x0 = target.init_sample(key, C).T                     # (d, C)
    x0 = jnp.broadcast_to(x0[:, None, :], (4, 8, C))
    mesh = make_mesh((4, 2), ("chains", "temps"))
    x0_sh = jax.device_put(x0, NamedSharding(mesh, P(None, "temps", "chains")))

    r_plain = run_pt(target, prop, key, betas, num_chains=C,
                     num_iterations=100, burn_in=10, swap_every=5,
                     init_states=x0)
    # temps-sharded inputs need the canonical layout: a flat (d, T*C)
    # reshape across the sharded rung axis would insert per-step collectives
    r_shard = run_pt(target, prop, key, betas, num_chains=C,
                     num_iterations=100, burn_in=10, swap_every=5,
                     init_states=x0_sh, layout="tc")
    np.testing.assert_allclose(np.asarray(r_plain.state.x),
                               np.asarray(r_shard.state.x), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(r_plain.state.swap_accept_count),
                                  np.asarray(r_shard.state.swap_accept_count))
    np.testing.assert_allclose(np.asarray(r_plain.pt_esjd),
                               np.asarray(r_shard.pt_esjd), rtol=1e-5)


class TestShardedPallasEngine:
    """shard_map-wrapped Pallas kernels (kernels/pallas_sharded.py): chains
    are communication-free, so each device runs the full VMEM-resident kernel
    on its chain slice.  PRNG statistics are TPU-only (interpreter returns
    degenerate bits), so CPU validates plumbing: sharded assembly, shapes,
    per-shard key independence, and mesh validation."""

    def test_rwm_sharded_shapes_and_layout(self, key):
        from rwm_pt_tpu.kernels import run_rwm_pallas_sharded
        tgt = MultivariateNormal.create(3)
        mesh = make_mesh()
        res = run_rwm_pallas_sharded(tgt, key, mesh, base_variance=0.5,
                                     num_chains=1024, num_iterations=3,
                                     burn_in=1, interpret=True)
        assert res.state.x.shape == (3, 1024)
        assert res.acceptance_rate.shape == (1024,)
        assert int(res.state.step) == 4
        # chain axis actually sharded over the mesh
        assert res.state.x.sharding.spec == P(None, "chains")

    def test_pt_sharded_shapes_and_counts(self, key):
        from rwm_pt_tpu.kernels import run_pt_pallas_sharded
        tgt = MultivariateNormal.create(3)
        mesh = make_mesh()
        betas = jnp.geomspace(1.0, 0.01, 4).astype(jnp.float32)
        res = run_pt_pallas_sharded(tgt, key, betas, mesh, base_variance=0.5,
                                    num_chains=512, num_iterations=6,
                                    burn_in=0, swap_every=2, interpret=True)
        assert res.state.x.shape == (3, 4, 512)
        assert res.state.logp.shape == (4, 512)
        # 3 swap events x (T-1) pairs
        assert int(res.state.swap_attempt_count) == 9
        assert res.swap_acceptance_rate.shape == (512,)

    def test_per_shard_initial_states_differ(self, key):
        """Each shard folds its own key: auto-init states must not be eight
        copies of the same block."""
        from rwm_pt_tpu.kernels import run_rwm_pallas_sharded
        tgt = MultivariateNormal.create(2)
        mesh = make_mesh()
        res = run_rwm_pallas_sharded(tgt, key, mesh, base_variance=0.5,
                                     num_chains=64, num_iterations=1,
                                     interpret=True)
        x = np.asarray(res.state.x)          # (2, 64), 8 chains per shard
        shards = x.reshape(2, 8, 8)
        assert not np.allclose(shards[:, 0], shards[:, 1])

    def test_explicit_init_states_are_scattered(self, key):
        from rwm_pt_tpu.kernels import run_rwm_pallas_sharded
        tgt = MultivariateNormal.create(2)
        mesh = make_mesh()
        x0 = jnp.arange(2 * 64, dtype=jnp.float32).reshape(2, 64)
        res = run_rwm_pallas_sharded(tgt, key, mesh, base_variance=1e-12,
                                     num_chains=64, num_iterations=1,
                                     init_states=x0, interpret=True)
        # with ~zero proposal variance the states stay ~put; verifies the
        # global (d, C) init tensor was scattered to shards in order
        np.testing.assert_allclose(np.asarray(res.state.x), np.asarray(x0),
                                   atol=1e-3)

    def test_temp_sharded_mesh_rejected(self, key):
        from rwm_pt_tpu.kernels import run_pt_pallas_sharded
        tgt = MultivariateNormal.create(3)
        mesh = make_mesh((4, 2), ("chains", "temps"))
        betas = jnp.geomspace(1.0, 0.01, 4).astype(jnp.float32)
        with pytest.raises(ValueError, match="temperature-sharded"):
            run_pt_pallas_sharded(tgt, key, betas, mesh, base_variance=0.5,
                                  num_chains=512, num_iterations=2,
                                  interpret=True)

    def test_indivisible_chains_rejected(self, key):
        from rwm_pt_tpu.kernels import run_rwm_pallas_sharded
        tgt = MultivariateNormal.create(3)
        mesh = make_mesh()
        with pytest.raises(ValueError, match="not divisible"):
            run_rwm_pallas_sharded(tgt, key, mesh, base_variance=0.5,
                                   num_chains=100, num_iterations=2,
                                   interpret=True)


class TestTempShardedHybrid:
    """run_pt_pallas_tempsharded (kernels/pallas_sharded.py): Pallas MH
    segments + ppermute swap events over a temps-sharded mesh.  The swap
    decisions are keyed on the GLOBAL pair index, so with the MH phase
    frozen (near-zero proposal variance, O(1) states) the trajectory must be
    BITWISE identical across mesh partitionings — a deterministic test of
    the boundary ppermute exchange, decision consistency, and the
    owner-of-lower-rung accounting.  Throughput/statistics on hardware:
    scripts/bench_pt_tempsharded.py (1.66B vs scan 356M MH steps/s)."""

    def _run(self, key, mesh_devs, T=8, C=64):
        from jax.sharding import Mesh
        from rwm_pt_tpu.kernels import run_pt_pallas_tempsharded
        tgt = MultivariateNormal.create(3)
        betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
        x0 = jnp.stack(
            [tgt.direct_sample(jax.random.fold_in(key, t), C,
                               float(betas[t])).T for t in range(T)], axis=1)
        mesh = Mesh(np.array(jax.devices()[:mesh_devs]).reshape(mesh_devs),
                    ("temps",))
        return run_pt_pallas_tempsharded(
            tgt, key, betas, mesh, num_chains=C, num_iterations=400,
            burn_in=100, swap_every=50, base_variance=1e-30, init_states=x0,
            interpret=True)

    def test_bitwise_identical_across_mesh_partitionings(self, key):
        r1 = self._run(key, 1)
        r4 = self._run(key, 4)
        assert np.array_equal(np.asarray(r1.state.x), np.asarray(r4.state.x))
        assert np.array_equal(np.asarray(r1.state.logp),
                              np.asarray(r4.state.logp))
        assert np.array_equal(np.asarray(r1.state.swap_accept_count),
                              np.asarray(r4.state.swap_accept_count))
        np.testing.assert_allclose(np.asarray(r1.pt_esjd),
                                   np.asarray(r4.pt_esjd), rtol=1e-6)

    def test_swap_attempt_accounting(self, key):
        r = self._run(key, 2)
        # (400+100)/50 = 10 events, 2 pre-burn-in gated out of accepts but
        # attempts follow the scan engine: events at steps > burn_in -> 8
        assert int(r.state.swap_attempt_count) == 8 * 7
        assert r.state.x.shape == (3, 8, 64)
        assert r.swap_acceptance_rate.shape == (64,)

    def test_chains_and_temps_2d_mesh(self, key):
        from jax.sharding import Mesh
        from rwm_pt_tpu.kernels import run_pt_pallas_tempsharded
        tgt = MultivariateNormal.create(3)
        T, C = 4, 64
        betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4),
                    ("temps", "chains"))
        res = run_pt_pallas_tempsharded(
            tgt, key, betas, mesh, num_chains=C, num_iterations=100,
            burn_in=0, swap_every=25, base_variance=0.5, interpret=True)
        assert res.state.x.shape == (3, T, C)
        assert int(res.state.swap_attempt_count) == 4 * 3
