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
    zh, collapse = sp.honest_z(s, rows)
    assert zh == pytest.approx(0.5, rel=1e-6)
    # committed std (0.001) < sd_MC (0.02): flagged impossible
    assert collapse == 1.0


def test_honest_z_floor_kills_epsilon_z(sp):
    # degenerate acc=1.0 grid point: |delta| ~ 1e-8 against sd ~ 1e-9 must
    # not produce a huge z (the 1e-4 floor applies)
    rows = [{"our_acc": 1.0 - 6e-8, "ref_acc": 1.0, "acc_se": 1e-9,
             "our_acc_realization_std": 9e-9}]
    s = _summary(rows, C=128, R=16)
    zh, _ = sp.honest_z(s, rows)
    assert zh is not None and zh < 0.01


def test_auto_note_j_requires_all_three_conditions(sp):
    r = {"max_z": 5.0, "zh_max": 0.7, "collapse_frac": 0.9, "summary": {}}
    assert "j" in sp.auto_notes(r)
    for bad in ({"max_z": 1.0}, {"zh_max": 3.0}, {"collapse_frac": 0.1}):
        assert "j" not in sp.auto_notes({**r, **bad})


def test_auto_notes_methodology_markers(sp):
    assert sp.auto_notes({"summary": {
        "protocol": {"target_realizations": 16}}}) == ["f"]
    assert sp.auto_notes({"summary": {"hybrid_n1n2": [3, 9]}}) == ["g"]
    assert sp.auto_notes({"summary": {"variant_scan": {}}}) == ["h"]
    assert sp.auto_notes({"summary": {"variant": "cpu"}}) == ["i"]
    assert sp.auto_notes({"summary": {"scaling_scan": {}}}) == ["k"]


def test_footnote_legend_defines_every_auto_marker(sp):
    # every marker auto_notes can emit must be documented in the footnotes
    for marker in "fghijk":
        assert f"({marker})" in sp.FOOTNOTES, marker
