"""Multi-process (multi-host) smoke: one process of an N-process PT run.

Proves the multi-host runtime is real — the round-1 gap was that
``initialize_distributed`` (rwm_pt_tpu/parallel/mesh.py) had never executed
with >= 2 processes.  Each process brings up ``jax.distributed`` over a TCP
coordinator (gloo CPU collectives), builds a global ``('chains',)`` mesh over
every device of every process, runs a chains-sharded PT sweep where each
process holds only its local shard, pools the diagnostics (a cross-process
AllReduce), and process 0 alone writes the JSON artifact (the
``process_index() == 0`` gating used by the pod launchers,
scripts/launch_*_pod.sh).

This is the TPU-pod code path run on CPUs: the reference's scale-out analog
is Slurm array jobs with NO inter-job communication
(/root/reference/run_pt_gpu.sbatch:12); here the seed/chain axis is an
in-mesh sharded axis with real collectives.

Launched by tests/test_multihost.py as two subprocesses; also runnable by
hand:

    JAX_PLATFORMS=cpu python scripts/multihost_smoke.py \
        --coordinator localhost:9876 --num_processes 2 --process_id 0 &
    JAX_PLATFORMS=cpu python scripts/multihost_smoke.py \
        --coordinator localhost:9876 --num_processes 2 --process_id 1
"""
import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--devices_per_process", type=int, default=2)
    ap.add_argument("--bench", action="store_true",
                    help="after the correctness smoke, run a timed "
                         "chains-sharded PT workload (weak scaling: chains "
                         "proportional to global devices) and record MH "
                         "steps/s — the measurement behind the 2-host "
                         "scaling efficiency recipe "
                         "(scripts/scaling_proxy.py --real)")
    ap.add_argument("--bench_iters", type=int, default=2000)
    ap.add_argument("--bench_chains_per_device", type=int, default=1024)
    ap.add_argument("--tpu", action="store_true",
                    help="keep the default (TPU) platform: each process "
                         "owns its local chips (drop the CPU forcing used "
                         "by the virtual-device test)")
    ap.add_argument("--output", default=None,
                    help="JSON path written by process 0 only")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.devices_per_process}").strip()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from rwm_pt_tpu.parallel import initialize_distributed, make_mesh

    initialize_distributed(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    assert jax.process_count() == args.num_processes, jax.process_count()
    n_global = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == n_global, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rwm_pt_tpu.kernels import run_pt
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import MultivariateNormal

    dim, T, C = 4, 5, 16 * n_global
    target = MultivariateNormal.create(dim)
    prop = NormalProposal.create(dim, 2.38 ** 2 / dim)
    betas = jnp.geomspace(1.0, 0.01, T).astype(jnp.float32)
    mesh = make_mesh()                      # ('chains',) over global devices

    # global (d, T, C) initial states, chains sharded across processes: every
    # process computes the same logical array deterministically and hands
    # jax the shards its local devices own
    key = jax.random.key(7)
    x_host = np.asarray(
        jnp.broadcast_to(target.init_sample(key, C).T[:, None, :],
                         (dim, T, C)))
    sharding = NamedSharding(mesh, P(None, None, "chains"))
    x0 = jax.make_array_from_callback(x_host.shape, sharding,
                                      lambda idx: x_host[idx])

    # layout='tc': chains are sharded, and the flat layout's (T, C) -> (T*C,)
    # merge would interleave across the sharded chain axis
    res = run_pt(target, prop, key, betas, num_chains=C, num_iterations=400,
                 burn_in=100, swap_every=10, init_states=x0, layout="tc")

    # pooled diagnostics: replicated jit outputs are addressable everywhere;
    # the means over the sharded chain axis are cross-process AllReduces
    @jax.jit
    def pool(r):
        return (jnp.mean(r.swap_acceptance_rate), jnp.mean(r.cold_esjd),
                jnp.mean(r.acceptance_rate), jnp.mean(r.pt_esjd))

    swap_acc, cold_esjd, mh_acc, pt_esjd = map(float, pool(res))
    out = {"process_id": args.process_id,
           "num_processes": args.num_processes,
           "global_devices": n_global,
           "num_chains": C,
           "swap_acceptance_rate": swap_acc,
           "cold_esjd": cold_esjd,
           "mh_acceptance_rate": mh_acc,
           "pt_esjd": pt_esjd}
    for v in (swap_acc, cold_esjd, mh_acc, pt_esjd):
        assert np.isfinite(v), out
    assert 0.0 < mh_acc < 1.0, out

    if args.bench:
        # weak-scaling throughput: chains proportional to the global device
        # count, so per-device work is constant and 2-host efficiency =
        # (2-host steps/s) / (2 x 1-host steps/s) — the BASELINE.md recipe
        import time
        Cb = args.bench_chains_per_device * n_global
        xb_host = np.asarray(
            jnp.broadcast_to(target.init_sample(key, Cb).T[:, None, :],
                             (dim, T, Cb)))
        xb = jax.make_array_from_callback(
            xb_host.shape, NamedSharding(mesh, P(None, None, "chains")),
            lambda idx: xb_host[idx])

        def one(k):
            r = run_pt(target, prop, k, betas, num_chains=Cb,
                       num_iterations=args.bench_iters, burn_in=0,
                       swap_every=100, init_states=xb, layout="tc")
            # a replicated scalar readback synchronizes every process
            return float(jnp.mean(r.swap_acceptance_rate))

        one(key)                                    # compile + warm
        times = []
        for rep in (1, 2, 3):
            t0 = time.time()
            one(jax.random.fold_in(key, rep))
            times.append(time.time() - t0)
        steps = args.bench_iters * T * Cb
        out["bench"] = {
            "mh_steps_per_s": steps / min(times),
            "rep_times_s": [round(t, 3) for t in times],
            "chains": Cb, "iters": args.bench_iters,
            "note": "weak scaling: divide by num_processes x 1-process "
                    "steps/s for the scaling efficiency"}
        print(f"[multihost_smoke p{args.process_id}] bench "
              f"{steps / min(times):,.0f} MH steps/s ({Cb} chains, "
              f"{len(jax.devices())} devices)", flush=True)

    # artifact writes are gated on process 0, like the pod launchers
    if jax.process_index() == 0 and args.output:
        with open(args.output, "w") as f:
            json.dump(out, f)
    print(f"[multihost_smoke p{args.process_id}] OK {out}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
