"""Experiment entry points (TPU-native re-implementation of the reference CLIs
``experiment_RWM_GPU.py``, ``experiment_pt_GPU.py``, ``single_run_experiment.py``)."""
