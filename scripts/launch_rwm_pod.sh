#!/bin/bash
# TPU-pod launcher for the RWM scale sweep — the TPU-native analog of the
# reference's run_rwm_gpu.sbatch (reference run_rwm_gpu.sbatch:1-46).
#
# Key redesign: the reference fans 20 Slurm array jobs (one seed per GPU) and
# averages their JSON offline.  Here seeds are an *in-mesh batch axis*:
# --num_chains N runs N independent chains (= N seeds) inside one compiled
# program, sharded over every chip in the pod, and the per-chain
# acceptance/ESJD arrays are averaged on-device.  One job replaces the array.
#
# Usage:
#   ./scripts/launch_rwm_pod.sh                        # current host/chips
#   TPU_NAME=v5e-16 ZONE=us-west4-a ./scripts/launch_rwm_pod.sh   # full pod
set -euo pipefail
cd "$(dirname "$0")/.."   # repo root, so the package is importable anywhere

#### Options for target distribution:
# MultivariateNormal, MultivariateNormalScaled
# RoughCarpet, RoughCarpetScaled,
# ThreeMixture, ThreeMixtureScaled,
# IIDGamma, IIDBeta, Hypercube
# FullRosenbrock, EvenRosenbrock, HybridRosenbrock
# NealFunnel, SuperFunnel
TARGET_DISTRIBUTION="${TARGET_DISTRIBUTION:-RoughCarpetScaled}"

#### Options for proposal distribution: Normal, Laplace, UniformRadius
PROPOSAL_DISTRIBUTION="${PROPOSAL_DISTRIBUTION:-Normal}"

DIM="${DIM:-20}"
NUM_ITERS="${NUM_ITERS:-200000}"
VAR_MAX="${VAR_MAX:-4.0}"
BURN_IN="${BURN_IN:-1000}"
NUM_CHAINS="${NUM_CHAINS:-1024}"     # ≙ number of averaged seeds
SEED="${SEED:-1}"

CMD="python -m rwm_pt_tpu.cli.experiment_rwm \
    --target $TARGET_DISTRIBUTION \
    --proposal $PROPOSAL_DISTRIBUTION \
    --dim $DIM \
    --num_iters $NUM_ITERS \
    --var_max $VAR_MAX \
    --burn_in $BURN_IN \
    --num_chains $NUM_CHAINS \
    --use_mesh \
    --multihost \
    --hybrid_rosenbrock_n1 8 \
    --hybrid_rosenbrock_n2 4 \
    --seed $SEED ${EXTRA_ARGS:-}"

mkdir -p logs
if [[ -n "${TPU_NAME:-}" ]]; then
    # Multi-host pod: run the same program on every worker; jax.distributed
    # initializes from the TPU metadata (parallel/mesh.py:33).
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "${ZONE:?set ZONE}" \
        --worker=all --command "cd $(pwd) && $CMD" 2>&1 | tee logs/rwm_pod.log
else
    $CMD 2>&1 | tee logs/rwm_local.log
fi
echo "Completed RWM study: $TARGET_DISTRIBUTION dim=$DIM chains=$NUM_CHAINS"
