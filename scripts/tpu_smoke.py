#!/usr/bin/env python
"""Hardware smoke gate: quick TPU regression check runnable next to bench.py.

Closes the round-1 gap "TPU-gated tests are outside any automated gate": the
full hardware suite (``RWM_PT_TPU_TESTS=1 pytest tests/test_pallas_kernels.py``)
takes many minutes of Mosaic compiles, so this script distills it to the
checks a hardware regression would trip first:

1. one Pallas RWM config statistically matching the scan engine,
2. one Pallas PT config statistically matching the scan engine
   (swap acceptance + per-rung MH acceptance),
3. exact invariance (Geweke "getting it right") of the Pallas RWM and PT
   kernels: chains seeded from the exact sampler stay exactly
   pi-distributed through K steps incl. swaps (tests/test_invariance.py is
   the CPU/scan analogue),
4. every registry target compiling through Mosaic (``--all-targets``;
   skipped by default to keep the gate under ~2 min cold).

Prints ONE JSON line ``{"smoke": "ok"|"fail", "checks": {...}}`` and exits
non-zero on failure, so a driver can run it alongside ``bench.py``
(``bench.py --smoke`` invokes it in-process first).

Reference analog: the reference has no hardware gate at all; its GPU kernels
were validated by eye against CPU runs (SURVEY.md §4).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_checks(all_targets: bool = False, verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from rwm_pt_tpu.kernels import (run_pt, run_pt_pallas, run_rwm,
                                    run_rwm_pallas)
    from rwm_pt_tpu.proposals import NormalProposal
    from rwm_pt_tpu.targets import get_target_distribution

    checks = {}
    key = jax.random.key(0)

    def note(msg):
        if verbose:
            print(f"# smoke: {msg}", file=sys.stderr, flush=True)

    # -- 1. RWM: Pallas vs scan on MVN d10 ---------------------------------
    t0 = time.time()
    tgt = get_target_distribution("MultivariateNormal", 10)
    var = 2.38 ** 2 / 10
    pal = run_rwm_pallas(tgt, key, base_variance=var, num_chains=2048,
                         num_iterations=2000, burn_in=200)
    scan = run_rwm(tgt, NormalProposal.create(10, var), key,
                   num_chains=2048, num_iterations=2000, burn_in=200)
    d_acc = abs(float(pal.acceptance_rate.mean()) -
                float(scan.acceptance_rate.mean()))
    d_esjd = abs(float(pal.esjd.mean()) - float(scan.esjd.mean()))
    rel_esjd = d_esjd / max(float(scan.esjd.mean()), 1e-9)
    checks["rwm"] = {"acc_delta": d_acc, "esjd_rel_delta": rel_esjd,
                     "ok": d_acc < 0.02 and rel_esjd < 0.05,
                     "s": round(time.time() - t0, 1)}
    note(f"rwm acc_delta={d_acc:.4f} esjd_rel={rel_esjd:.4f} "
         f"({checks['rwm']['s']}s)")

    # -- 2. PT: Pallas vs scan on ThreeMixture d10 --------------------------
    t0 = time.time()
    tgt = get_target_distribution("ThreeMixture", 10)
    betas = jnp.geomspace(1.0, 0.01, 6).astype(jnp.float32)
    bv = 2.38 ** 2 / 10
    palp = run_pt_pallas(tgt, key, betas, base_variance=bv, num_chains=1024,
                         num_iterations=2000, burn_in=200, swap_every=20)
    scanp = run_pt(tgt, NormalProposal.create(10, bv), key, betas,
                   num_chains=1024, num_iterations=2000, burn_in=200,
                   swap_every=20)
    d_swap = abs(float(palp.swap_acceptance_rate.mean()) -
                 float(scanp.swap_acceptance_rate.mean()))
    # per-rung MH acceptance must agree rung-by-rung (round-2 feature)
    d_rung = float(jnp.max(jnp.abs(palp.acceptance_rate.mean(axis=-1) -
                                   scanp.acceptance_rate.mean(axis=-1))))
    checks["pt"] = {"swap_acc_delta": d_swap, "max_rung_acc_delta": d_rung,
                    "ok": d_swap < 0.05 and d_rung < 0.03,
                    "s": round(time.time() - t0, 1)}
    note(f"pt swap_delta={d_swap:.4f} rung_delta={d_rung:.4f} "
         f"({checks['pt']['s']}s)")

    # -- 3. exact invariance ("getting it right") on the Pallas engine ------
    # Chains start from the target's EXACT sampler (equilibrium at step 0);
    # after K kernel steps every per-coordinate mean/second-moment/logpi
    # statistic must match fresh exact draws to MC error.  The hardware
    # analogue of tests/test_invariance.py — certifies the accept rule and
    # swap bookkeeping preserve pi exactly, not just match the scan engine.
    t0 = time.time()
    # False-alarm arithmetic: the gate takes a max over 21 RWM + 6*21 PT =
    # 147 z-statistics; under the CLT normal approximation P(|z| > 5) =
    # 5.7e-7 per statistic => per-run false-alarm ~ 147 * 5.7e-7 ~ 8e-5,
    # while the expected max of 147 standard normals is ~2.9 (so observed
    # maxima near 3, e.g. round-4's z_pt = 3.26, are ordinary noise — the
    # hardware PRNG's fixed seed makes a given build deterministic but the
    # seed varies per run key).  Power: a persistent per-statistic bias is
    # flagged once it reaches ~Z_MAX * SE = 5 * std/sqrt(4096) ~ 0.08 std.
    Z_MAX = 5.0
    tgt = get_target_distribution("MultivariateNormal", 10)
    Cn = 4096

    def max_z(evolved, fresh):
        def stats(x):
            f = jnp.concatenate([x, x * x,
                                 tgt.log_density_td(x)[None, :]], axis=0)
            return jnp.mean(f, axis=1), jnp.var(f, axis=1)
        m1, v1 = stats(evolved)
        m2, v2 = stats(fresh)
        return float(jnp.max(jnp.abs(m1 - m2)
                             / jnp.sqrt((v1 + v2) / Cn + 1e-12)))

    ki = jax.random.fold_in(key, 0x1417)
    k_a, k_b, k_run = jax.random.split(ki, 3)
    exact = tgt.direct_sample(k_a, Cn).T
    pal = run_rwm_pallas(tgt, k_run, base_variance=var, num_chains=Cn,
                         num_iterations=50, burn_in=0, init_states=exact)
    z_rwm = max_z(pal.state.x, tgt.direct_sample(k_b, Cn).T)
    # PT: product measure — every rung stays at its own temperature
    betas_i = jnp.geomspace(1.0, 0.09, 6).astype(jnp.float32)
    cube = jnp.stack([tgt.direct_sample(jax.random.fold_in(k_a, t), Cn,
                                        float(b)).T
                      for t, b in enumerate(betas_i)], axis=1)
    palp = run_pt_pallas(tgt, k_run, betas_i, base_variance=var,
                         num_chains=Cn, num_iterations=60, burn_in=0,
                         swap_every=5, init_states=cube)
    z_pt = max(max_z(palp.state.x[:, t, :],
                     tgt.direct_sample(jax.random.fold_in(k_b, 100 + t),
                                       Cn, float(b)).T)
               for t, b in enumerate(betas_i))
    swapped = float(palp.swap_acceptance_rate.mean()) > 0.02
    # round-5 breadth: the shard_map-wrapped engines on a 1-device mesh —
    # real hardware PRNG (full-strength statistics, unlike the CPU
    # interpreter), exercising the sharded chains path and the
    # temps-sharded hybrid's segment+swap-event structure end-to-end
    import numpy as _np
    from jax.sharding import Mesh as _Mesh
    from rwm_pt_tpu.kernels import (run_pt_pallas_tempsharded,
                                    run_rwm_pallas_sharded)
    mesh_c = _Mesh(_np.array(jax.devices()[:1]).reshape(1), ("chains",))
    pal_sh = run_rwm_pallas_sharded(tgt, k_run, mesh_c, base_variance=var,
                                    num_chains=Cn, num_iterations=50,
                                    burn_in=0, init_states=exact)
    z_rwm_sh = max_z(pal_sh.state.x, tgt.direct_sample(k_b, Cn).T)
    mesh_t = _Mesh(_np.array(jax.devices()[:1]).reshape(1), ("temps",))
    palt = run_pt_pallas_tempsharded(tgt, k_run, betas_i, mesh_t,
                                     base_variance=var, num_chains=Cn,
                                     num_iterations=60, burn_in=0,
                                     swap_every=5, init_states=cube)
    z_pt_ts = max(max_z(palt.state.x[:, t, :],
                        tgt.direct_sample(jax.random.fold_in(k_b, 100 + t),
                                          Cn, float(b)).T)
                  for t, b in enumerate(betas_i))
    ts_swapped = float(palt.swap_acceptance_rate.mean()) > 0.02
    checks["invariance"] = {
        "z_rwm": round(z_rwm, 2), "z_pt": round(z_pt, 2),
        "z_rwm_sharded": round(z_rwm_sh, 2),
        "z_pt_tempsharded": round(z_pt_ts, 2),
        "pt_swaps_fired": swapped, "tempsharded_swaps_fired": ts_swapped,
        "ok": (z_rwm < Z_MAX and z_pt < Z_MAX and swapped
               and z_rwm_sh < Z_MAX and z_pt_ts < Z_MAX and ts_swapped),
        "s": round(time.time() - t0, 1)}
    note(f"invariance z_rwm={z_rwm:.2f} z_pt={z_pt:.2f} "
         f"z_rwm_sharded={z_rwm_sh:.2f} z_pt_tempsharded={z_pt_ts:.2f} "
         f"({checks['invariance']['s']}s)")

    # -- 4. all registry targets lower through Mosaic (opt-in) -------------
    if all_targets:
        from rwm_pt_tpu.targets.registry import TARGET_NAMES
        t0 = time.time()
        failed = []
        for idx, name in enumerate(TARGET_NAMES):
            try:
                tgt = get_target_distribution(name, 10)
                # fold in the registry index, not hash(name): str hashes are
                # randomized per process (PYTHONHASHSEED), so results would
                # not reproduce across invocations
                res = run_rwm_pallas(tgt, jax.random.fold_in(key, idx),
                                     base_variance=0.5, num_chains=256,
                                     num_iterations=100, burn_in=20)
                a = float(res.acceptance_rate.mean())
                if not (0.0 <= a <= 1.0):
                    failed.append((name, f"acc={a}"))
            except Exception as e:  # noqa: BLE001 - report, don't crash the gate
                failed.append((name, repr(e)[:200]))
            note(f"compile {name}: {'FAIL' if failed and failed[-1][0] == name else 'ok'}")
        checks["all_targets"] = {"failed": failed, "ok": not failed,
                                 "s": round(time.time() - t0, 1)}

    checks["ok"] = all(v["ok"] for v in checks.values() if isinstance(v, dict))
    return checks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--all-targets", action="store_true",
                   help="also compile every registry target through Mosaic "
                        "(adds several minutes of compiles when cold)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import jax
    if jax.default_backend() not in ("tpu",):
        print(json.dumps({"smoke": "skip",
                          "reason": f"backend={jax.default_backend()}"}))
        return 0

    checks = run_checks(all_targets=args.all_targets)
    ok = checks.pop("ok")
    line = {"smoke": "ok" if ok else "fail", "checks": checks}
    print(json.dumps(line))
    if args.out:
        json.dump(line, open(args.out, "w"), indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
