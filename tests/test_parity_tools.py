"""Unit tests for the parity-matrix tooling (scripts/parity_batch.py,
scripts/summarize_parity.py) — the machinery behind docs/PARITY_MATRIX.md.

These are pure-host tests: no reference data access, no TPU.
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def sp():
    return _load("summarize_parity")


@pytest.fixture(scope="module")
def pb():
    return _load("parity_batch")


def test_hybrid_candidates_solve_dim_equation(pb):
    # every candidate must satisfy 1 + n2(n1-1) = dim
    for dim in (3, 5, 9, 19, 29):
        cands = pb.hybrid_candidates(dim)
        assert cands, dim
        for n1, n2 in cands:
            assert 1 + n2 * (n1 - 1) == dim, (dim, n1, n2)


def test_parse_family_eras(pb, tmp_path):
    import json
    gpu = tmp_path / "x.json"
    json.dump({"target_distribution": "ThreeMixtureScaled", "dimension": 20,
               "num_iterations": 100000, "seed": 1}, open(gpu, "w"))
    m = pb.parse_family("ThreeMixtureScaled_RWM_GPU_dim20_100000iters", gpu)
    assert (m["alg"], m["burn_in"], m["variant"], m["scaled"]) == \
        ("RWM_GPU", 1000, "rwm_gpu", True)
    m2 = pb.parse_family("ThreeMixtureScaled_RWM_dim5_100000iters", gpu)
    assert (m2["alg"], m2["burn_in"], m2["variant"]) == ("RWM", 0, "cpu")
    # name-derived proposal used when the file doesn't record one
    json.dump({"dimension": 100, "num_iterations": 100000}, open(gpu, "w"))
    m4 = pb.parse_family(
        "MultivariateNormal_Laplace_RWM_GPU_dim100_100000iters", gpu)
    assert m4["proposal"] == "Laplace"


def _summary(rows, C=512, R=1, extra=None):
    s = {"algorithm": "RWM", "esjd_curve_corr": 1.0,
         "ref_optimum_at": 1.0, "our_optimum_at": 1.0,
         "max_abs_acc_diff": 0.0,
         "protocol": {"num_chains": C, "target_realizations": R},
         "rows": rows}
    s.update(extra or {})
    return s


def test_honest_z_reconstructs_single_run_sd(sp):
    # acc_se is per-chain sd / sqrt(C); honest sd_MC = acc_se * sqrt(C).
    # delta 0.01 against chain sd 0.02 -> z_MC = 0.5.
    C = 400
    rows = [{"our_acc": 0.51, "ref_acc": 0.50, "acc_se": 0.02 / C ** 0.5,
             "ref_acc_seed_std": 0.001}]
    s = _summary(rows, C=C)
    hz = sp.honest_z(s, rows)
    assert hz["zh_max"] == pytest.approx(0.5, rel=1e-6)
    # committed std (0.001) < sd_MC (0.02): flagged impossible
    assert hz["collapse_frac"] == 1.0
    assert hz["n_cov"] == 1 and hz["n_live"] == 1
    # the one point needs MC coverage (committed z = 10 > 2) and passes
    assert hz["zmc_full"] is True


def test_honest_z_floor_kills_epsilon_z(sp):
    # degenerate acc=1.0 grid point: |delta| ~ 1e-8 against sd ~ 1e-9 must
    # not produce a huge z (the 1e-4 floor applies)
    rows = [{"our_acc": 1.0 - 6e-8, "ref_acc": 1.0, "acc_se": 1e-9,
             "our_acc_realization_std": 9e-9}]
    s = _summary(rows, C=128, R=16)
    hz = sp.honest_z(s, rows)
    assert hz["zh_max"] is not None and hz["zh_max"] < 0.01


def test_auto_note_j_requires_all_conditions(sp):
    r = {"max_z": 5.0, "zh_max": 0.7, "collapse_frac": 0.9, "zmc_full": True,
         "collapse_n": 3, "zh_cov": (3, 10), "summary": {}}
    assert "j" in sp.auto_notes(r)
    for bad in ({"max_z": 1.0}, {"zh_max": 3.0}, {"collapse_frac": 0.1},
                # ADVICE r3: a 1-2 point sample of the grid cannot grant (j)
                {"zmc_full": False}, {"collapse_n": 2}):
        assert "j" not in sp.auto_notes({**r, **bad})
    # full-grid instrumentation lifts the minimum-count requirement
    assert "j" in sp.auto_notes({**r, "collapse_n": 2, "zh_cov": (2, 2)})


def test_auto_notes_methodology_markers(sp):
    assert sp.auto_notes({"summary": {
        "protocol": {"target_realizations": 16}}}) == ["f"]
    assert sp.auto_notes({"summary": {"hybrid_n1n2": [3, 9]}}) == ["g"]
    assert sp.auto_notes({"summary": {"variant_scan": {}}}) == ["h"]
    assert sp.auto_notes({"summary": {"variant": "cpu"}}) == ["i"]
    assert sp.auto_notes({"summary": {"scaling_scan": {}}}) == ["k"]


def test_footnote_legend_defines_every_auto_marker(sp):
    # every marker auto_notes can emit must be documented in the footnotes
    for marker in "fghijkl":
        assert f"({marker})" in sp.FOOTNOTES, marker


def test_auto_note_l_on_production_point_rows(sp):
    prod = {"N_samples_swap_est": 1000000, "tolerance": 0.0001}
    std = {"N_samples_swap_est": 50000, "tolerance": 0.005}
    assert "l" in sp.auto_notes({"summary": {"rows": [
        {"ladder_precision": prod}, {}]}})
    assert "l" not in sp.auto_notes({"summary": {"rows": [
        {"ladder_precision": std}, {}]}})


def test_chunked_sweep_matches_single_call(pb, tmp_path, monkeypatch):
    """Grid chunking must not change results: per-point keys are
    independent, so a 1-point-per-call split equals the one-call sweep."""
    import json
    import numpy as np
    ref = {"target_distribution": "MultivariateNormal", "dimension": 2,
           "num_iterations": 400, "proposal_distribution": "Normal",
           "scale_param_range": [0.5, 1.0, 2.0, 3.0],
           "acceptance_rates": [0.9, 0.7, 0.5, 0.3],
           "expected_squared_jump_distances": [0.1, 0.3, 0.4, 0.2]}
    meta = {"family": "f", "target": "MultivariateNormal", "dim": 2,
            "iters": 400, "burn_in": 50, "alg": "RWM_GPU",
            "variant": "rwm_gpu", "scaled": False, "is_pt": False,
            "proposal": "Normal"}
    single = pb.run_family(meta, ref, num_chains=128, seed=3)[0]
    monkeypatch.setattr(pb, "CHUNK_BUDGET", 1)   # force 1-point chunks
    chunked = pb.run_family(meta, ref, num_chains=128, seed=3)[0]
    for a, b in zip(single, chunked):
        assert a == b, (a, b)


def test_merge_into_replaces_rows_and_recomputes(tmp_path):
    """--points/--merge_into: production rows land in place, stats update."""
    import json
    import subprocess
    # a fake 3-point family summary with one bad point
    fam = tmp_path / "Fam_PT_GPU_dim2_1000iters.json"
    rows = [{"target_rate": 0.01, "ref_acc": 0.02, "our_acc": 0.20,
             "ref_esjd": 1.0, "our_esjd": 1.1, "T": 6,
             "ref_acc_seed_std": 0.001},
            {"target_rate": 0.2, "ref_acc": 0.21, "our_acc": 0.211,
             "ref_esjd": 2.0, "our_esjd": 2.0, "T": 8,
             "ref_acc_seed_std": 0.001},
            {"target_rate": 0.4, "ref_acc": 0.38, "our_acc": 0.381,
             "ref_esjd": 1.5, "our_esjd": 1.5, "T": 10,
             "ref_acc_seed_std": 0.001}]
    json.dump({"algorithm": "PT", "rows": rows, "elapsed_s": 10.0,
               "max_abs_acc_diff": 0.18, "esjd_curve_corr": 0.9,
               "ref_optimum_at": 0.2, "our_optimum_at": 0.2,
               "ref_acc_at_ref_optimum": 0.21,
               "our_acc_at_our_optimum": 0.211,
               "protocol": {"num_chains": 64}}, open(fam, "w"))
    # a fake seed-averaged reference curve (3 grid points, stride 1)
    ref = tmp_path / "ref_averaged.json"
    json.dump({"target_distribution": "MultivariateNormal", "dimension": 2,
               "num_iterations": 300, "num_files_averaged": 2,
               "swap_acceptance_rates_range": [0.01, 0.2, 0.4],
               "acceptance_rates": [0.02, 0.21, 0.38],
               "acceptance_rates_seed_std": [0.001, 0.001, 0.001],
               "expected_squared_jump_distances": [1.0, 2.0, 1.5]},
              open(ref, "w"))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "parity_vs_reference.py"),
         "--ref_file", str(ref), "--num_iters", "300", "--burn_in", "50",
         "--num_chains", "64", "--points", "0", "--merge_into", str(fam),
         "--N_samples_swap_est", "1000000", "--iterative_tolerance", "0.005",
         "--cpu"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    s = json.load(open(fam))
    assert len(s["rows"]) == 3
    # point 0 replaced: carries the production tag + fresh measurements
    assert s["rows"][0]["ladder_precision"]["N_samples_swap_est"] == 1000000
    assert "acc_se" in s["rows"][0]
    # untouched points keep their original values
    assert s["rows"][1]["our_acc"] == 0.211
    # summary stats recomputed over the merged rows, elapsed accumulated
    assert s["max_abs_acc_diff"] == pytest.approx(
        max(abs(r_["our_acc"] - r_["ref_acc"]) for r_ in s["rows"]))
    assert s["elapsed_s"] > 10.0


def test_auto_notes_referee_verdicts(sp, monkeypatch):
    # all refereed points at exact equilibrium on our side -> (n)
    monkeypatch.setattr(sp, "REFEREE", {
        "FamN": ["ours=stationary"] * 3,
        # one corner point transient, worst-z points stationary -> still (n)
        "FamN2": ["both-transient", "ours=stationary", "ours=stationary"],
        # transient-dominated / mixed-with-ref verdicts -> (o)
        "FamO": ["both-transient"] * 3,
        "FamO2": ["ref=stationary", "both-transient", "both-transient"],
    })
    assert "n" in sp.auto_notes({"family": "FamN", "summary": {}})
    assert "n" in sp.auto_notes({"family": "FamN2", "summary": {}})
    assert sp.auto_notes({"family": "FamO", "summary": {}}) == ["o"]
    assert sp.auto_notes({"family": "FamO2", "summary": {}}) == ["o"]
    # unrefereed rows get neither marker
    assert sp.auto_notes({"family": "Other", "summary": {}}) == []


def test_footnote_legend_defines_referee_markers(sp):
    for marker in "nop":
        assert f"({marker})" in sp.FOOTNOTES, marker
    # the real referee data file backs the markers for committed rows
    import json as _json
    ref = _json.load(open("data/stationary_referee.json"))
    assert ref and all(p["verdict"] in (
        "ours=stationary", "ref=stationary", "both-transient")
        for pts in ref.values() for p in pts)


# ---- exact stationary swap-acceptance machinery (footnote (q)) ----------
# scripts/pt_stationary_swap.py computes the expected recorded swap rate of
# a PT ladder in stationarity (reference swap rule
# pt_rwm_gpu_optimized.py:36-48) by exact 1-d quadrature + FFT convolution.
# These tests pin it against its two independent validators.


@pytest.fixture(scope="module")
def ss():
    return _load("pt_stationary_swap")


def test_mvn_pair_accept_matches_analytic_quadrature(ss):
    # FFT-convolution path vs the independent scipy gammainc quadrature
    for dim, ba, bb in ((20, 1.0, 0.6), (10, 0.3, 0.2), (4, 0.05, 0.02)):
        fft = ss.pair_accept("MultivariateNormal", dim, ba, bb,
                             n_cap=1 << 16)
        quad = ss.mvn_pair_accept_quad(dim, ba, bb, n=100000)
        assert abs(fft - quad) < 1e-6, (dim, ba, bb, fft, quad)


@pytest.mark.parametrize("target", ["RoughCarpet", "ThreeMixture"])
def test_mixture_pair_accept_matches_monte_carlo(ss, target):
    # FFT path vs a direct MC estimate of the same stationary expectation
    fft = ss.pair_accept(target, 6, 0.8, 0.55, n_z=1 << 15, n_cap=1 << 16)
    mc, se = ss.mc_pair_accept(target, 6, 0.8, 0.55, n=400_000)
    assert abs(fft - mc) < 4 * se + 1e-4, (target, fft, mc, se)


def test_pair_accept_limits_and_monotonicity(ss):
    # adjacent rungs: closer betas swap more; equal-beta limit -> 1
    near = ss.pair_accept("MultivariateNormal", 10, 1.0, 0.95, n_cap=1 << 16)
    far = ss.pair_accept("MultivariateNormal", 10, 1.0, 0.3, n_cap=1 << 16)
    assert 0.0 < far < near <= 1.0
    almost = ss.pair_accept("MultivariateNormal", 10, 1.0, 0.999,
                            n_cap=1 << 16)
    assert almost > 0.97
    # the swap rule needs beta_a > beta_b
    with pytest.raises(AssertionError):
        ss.pair_accept("MultivariateNormal", 10, 0.5, 0.5)


def test_ladder_accept_mean_and_refinement(ss):
    lad = [1.0, 0.55, 0.3, 0.16, 0.01]
    res = ss.ladder_accept("MultivariateNormal", 8, lad, refine=True,
                           n_cap=1 << 16)
    assert len(res["per_pair"]) == len(lad) - 1
    import numpy as _np
    assert abs(res["mean"] - _np.mean(res["per_pair"])) < 1e-12
    # half-grid refinement agrees (the committed referee's grid_err gate)
    assert res["grid_err"] < 1e-5


def test_pt_referee_grants_q_to_flagged_families(sp):
    # the committed referee data file backs marker (q): every refereed
    # family has >=4 live points, all with |ours - stat| <= 2e-3
    assert len(sp.PT_REFEREE) >= 8
    assert all(sp.PT_REFEREE.values())
    for fam in ("RoughCarpet_PT_GPU_dim30_500000iters",
                "ThreeMixture_PT_GPU_dim20_500000iters",
                "MultivariateNormal_PT_GPU_dim20_500000iters",
                "RoughCarpet_PT_GPU_dim20_500000iters_production"):
        assert sp.PT_REFEREE.get(fam), fam
    assert "q" in sp.auto_notes(
        {"family": "RoughCarpet_PT_GPU_dim30_500000iters", "summary": {}})
    assert "(q)" in sp.FOOTNOTES
