"""CLI + analysis pipeline tests.

Drives the experiment CLIs end-to-end in-process and validates the JSON schema
against the reference's (experiment_RWM_GPU.py:283-297,
experiment_pt_GPU.py:262-275), then runs the seed-averaging + plotting
pipeline (data/average_seeds.py, plot.py).
"""
import json
import os

import numpy as np
import pytest

RWM_SCHEMA_KEYS = {
    "target_distribution", "proposal_distribution", "dimension",
    "num_iterations", "seed", "total_time", "max_esjd",
    "max_acceptance_rate", "max_scale_param",
    "expected_squared_jump_distances", "acceptance_rates",
    "scale_param_range", "times",
}
PT_SCHEMA_KEYS = {
    "target_distribution", "dimension", "num_iterations", "seed",
    "total_time", "max_esjd", "max_actual_acceptance_rate",
    "max_constr_acceptance_rate", "expected_squared_jump_distances",
    "acceptance_rates", "swap_acceptance_rates_range", "times",
}


@pytest.fixture(scope="module")
def sweep_data(tmp_path_factory):
    from rwm_pt_tpu.cli.experiment_rwm import run_study
    out = tmp_path_factory.mktemp("data")
    datasets = {}
    for seed in (1, 2):
        datasets[seed] = run_study(
            4, "MultivariateNormal", num_iters=1000, var_max=3.0, seed=seed,
            burn_in=100, num_chains=32, num_configs=5,
            output_dir=str(out), make_plots=False)
    return out, datasets


def test_rwm_sweep_json_schema(sweep_data):
    out, datasets = sweep_data
    f = out / "MultivariateNormal_Normal_RWM_TPU_dim4_1000iters_seed1.json"
    assert f.exists()
    data = json.loads(f.read_text())
    assert RWM_SCHEMA_KEYS <= set(data.keys())
    assert len(data["scale_param_range"]) == 5
    assert len(data["expected_squared_jump_distances"]) == 5
    assert data["max_esjd"] == max(data["expected_squared_jump_distances"])
    idx = int(np.argmax(data["expected_squared_jump_distances"]))
    assert data["max_acceptance_rate"] == data["acceptance_rates"][idx]


def test_pt_sweep_json_schema(tmp_path):
    from rwm_pt_tpu.cli.experiment_pt import run_study
    data = run_study(4, "MultivariateNormal", num_iters=500,
                     swap_accept_max=0.4, seed=3, burn_in=100,
                     N_samples_swap_est=2000, iterative_tolerance=0.02,
                     iterative_max_pn_steps=30, num_chains=16, num_configs=2,
                     swap_every=10, output_dir=str(tmp_path),
                     make_plots=False)
    assert PT_SCHEMA_KEYS <= set(data.keys())
    files = list(tmp_path.glob("*PT_TPU*.json"))
    assert len(files) == 1


def test_seed_averaging_pipeline(sweep_data):
    from rwm_pt_tpu.analysis.average_seeds import (average_experiment_data,
                                                   find_matching_files,
                                                   generate_output_filename)
    out, datasets = sweep_data
    pattern = "MultivariateNormal_Normal_RWM_TPU_dim4_1000iters"
    files = find_matching_files(str(out), pattern)
    assert len(files) == 2
    avg = average_experiment_data(files)
    assert avg["averaged_from_seeds"] == [1, 2]
    assert avg["num_files_averaged"] == 2
    expect = np.mean([datasets[1]["expected_squared_jump_distances"],
                      datasets[2]["expected_squared_jump_distances"]], axis=0)
    np.testing.assert_allclose(avg["expected_squared_jump_distances"], expect)
    name = generate_output_filename(pattern, avg["averaged_from_seeds"])
    assert name == f"{pattern}_seeds1-2_averaged.json"


def test_averaging_rejects_mismatched_grids(tmp_path):
    from rwm_pt_tpu.analysis.average_seeds import average_experiment_data
    a = {"expected_squared_jump_distances": [1, 2], "acceptance_rates": [1, 2],
         "scale_param_range": [0.1, 0.2], "times": [1, 1]}
    b = {"expected_squared_jump_distances": [1, 2, 3],
         "acceptance_rates": [1, 2, 3], "scale_param_range": [0.1, 0.2, 0.3],
         "times": [1, 1, 1]}
    fa, fb = tmp_path / "x_seed1.json", tmp_path / "x_seed2.json"
    fa.write_text(json.dumps(a))
    fb.write_text(json.dumps(b))
    with pytest.raises(ValueError, match="Inconsistent array lengths"):
        average_experiment_data([str(fa), str(fb)])


def test_plotting_pipeline(sweep_data, tmp_path):
    from rwm_pt_tpu.analysis.average_seeds import (average_experiment_data,
                                                   find_matching_files,
                                                   generate_output_filename,
                                                   save_json)
    from rwm_pt_tpu.analysis.plotting import process_directory
    out, _ = sweep_data
    pattern = "MultivariateNormal_Normal_RWM_TPU_dim4_1000iters"
    files = find_matching_files(str(out), pattern)
    avg = average_experiment_data(files)
    name = generate_output_filename(pattern, avg["averaged_from_seeds"])
    save_json(avg, str(out / name))
    process_directory(str(out), str(tmp_path))
    pngs = list((tmp_path / "averaged").glob("*.png"))
    assert len(pngs) == 1


def test_batch_averaging(sweep_data, tmp_path, monkeypatch, capsys):
    from rwm_pt_tpu.analysis import batch_average_seeds
    out, _ = sweep_data
    batch_average_seeds.main(["--data_dir", str(out), "--min_seeds", "2"])
    captured = capsys.readouterr()
    assert "2 seeds" in captured.out
    avgs = list(out.glob("*_averaged.json"))
    assert len(avgs) >= 1


def test_combine_data_cli(sweep_data, tmp_path):
    """Legacy two-file combiner (reference data/combine_data.py:26-41)."""
    from rwm_pt_tpu.analysis.combine_data import main
    out, datasets = sweep_data
    files = sorted(str(out / f) for f in os.listdir(out) if "seed" in f)
    dst = tmp_path / "combined.json"
    main(files[:2] + ["-o", str(dst)])
    combined = json.loads(dst.read_text())
    assert combined["num_files_averaged"] == 2
    expect = np.mean([datasets[1]["acceptance_rates"],
                      datasets[2]["acceptance_rates"]], axis=0)
    np.testing.assert_allclose(combined["acceptance_rates"], expect)
