"""Double-precision path (mirrors the reference's --use_double_precision,
experiment_pt_GPU.py:525).

``jax_enable_x64`` is process-global, so the check runs in a subprocess to
avoid flipping the precision of the rest of the suite.
"""
import subprocess
import sys
import textwrap


def test_x64_end_to_end():
    code = textwrap.dedent("""
        import os; os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        from rwm_pt_tpu.api import MCMCSimulation

        sim = MCMCSimulation(dim=3, sigma=1.37, num_iterations=1500,
                             algorithm="RWM", target_dist="MultivariateNormal",
                             num_chains=16, burn_in=200, seed=5,
                             record_chain=False)
        sim.generate_samples(verbose=False)
        assert sim._result.state.x.dtype == jnp.float64
        assert sim._result.state.logp.dtype == jnp.float64
        assert 0.1 < sim.acceptance_rate() < 0.9

        simp = MCMCSimulation(dim=3, sigma=1.0, num_iterations=600,
                              algorithm="PT", target_dist="MultivariateNormal",
                              num_chains=8, burn_in=100, seed=5,
                              record_chain=False, geom_temp_spacing=True,
                              swap_every=20)
        simp.generate_samples(verbose=False)
        assert simp._result.state.x.dtype == jnp.float64
        assert 0.0 < simp.swap_acceptance_rate() <= 1.0
        print("X64-OK")
    """)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300,
                         env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin",
                              "HOME": "/root"})
    assert "X64-OK" in out.stdout, out.stdout + out.stderr
