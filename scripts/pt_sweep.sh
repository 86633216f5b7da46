#!/bin/bash
# Sequential PT sweep across targets/dims — analog of the reference's
# pt_script.sh (reference pt_script.sh:1-7).  The reference's --num_seeds 5
# becomes --num_chains (in-mesh seed parallelism).
set -euo pipefail
cd "$(dirname "$0")/.."   # repo root, so the package is importable anywhere
COMMON="--swap_accept_max 0.6 --num_iters 100000 --num_chains 256 --seed 0"
python -m rwm_pt_tpu.cli.experiment_pt --dim 20 --target MultivariateNormal $COMMON
python -m rwm_pt_tpu.cli.experiment_pt --dim 20 --target RoughCarpet $COMMON
python -m rwm_pt_tpu.cli.experiment_pt --dim 30 --target RoughCarpet $COMMON
python -m rwm_pt_tpu.cli.experiment_pt --dim 20 --target ThreeMixture $COMMON
python -m rwm_pt_tpu.cli.experiment_pt --dim 30 --target ThreeMixtureScaled $COMMON
