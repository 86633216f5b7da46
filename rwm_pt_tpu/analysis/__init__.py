"""Post-processing tools (TPU-native re-implementation of
``/root/reference/plot.py`` and ``/root/reference/data/*.py``)."""
from .average_seeds import (average_experiment_data, find_matching_files,
                            generate_output_filename)
from .diagnostics import (autocorrelation, effective_sample_size,
                          integrated_autocorr_time, mcse_mean, split_rhat)

__all__ = ["average_experiment_data", "find_matching_files",
           "generate_output_filename", "autocorrelation",
           "effective_sample_size", "integrated_autocorr_time", "mcse_mean",
           "split_rhat"]
