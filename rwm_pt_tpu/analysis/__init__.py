"""Post-processing tools (TPU-native re-implementation of
``/root/reference/plot.py`` and ``/root/reference/data/*.py``)."""
from .average_seeds import (average_experiment_data, find_matching_files,
                            generate_output_filename)

__all__ = ["average_experiment_data", "find_matching_files",
           "generate_output_filename"]
