#!/bin/bash
# TPU-pod launcher for the PT swap-rate sweep — the TPU-native analog of the
# reference's run_pt_gpu.sbatch (reference run_pt_gpu.sbatch:1-43), with the
# same high-precision iterative-ladder knobs.
#
# Seeds are an in-mesh batch axis (see launch_rwm_pod.sh header); replica
# exchange between temperature rungs stays on-chip (or rides ICI when the
# temps axis is sharded, parallel/mesh.py:65).
set -euo pipefail
cd "$(dirname "$0")/.."   # repo root, so the package is importable anywhere

TARGET_DISTRIBUTION="${TARGET_DISTRIBUTION:-ThreeMixture}"
DIM="${DIM:-10}"
NUM_ITERS="${NUM_ITERS:-200000}"
BURN_IN="${BURN_IN:-1000}"
NUM_CHAINS="${NUM_CHAINS:-1024}"     # ≙ number of averaged seeds
SEED="${SEED:-1}"

CMD="python -m rwm_pt_tpu.cli.experiment_pt \
    --target $TARGET_DISTRIBUTION \
    --dim $DIM \
    --num_iters $NUM_ITERS \
    --swap_accept_max 0.5 \
    --burn_in $BURN_IN \
    --num_chains $NUM_CHAINS \
    --use_mesh \
    --multihost \
    --N_samples_swap_est 1000000 \
    --iterative_tolerance 0.0001 \
    --iterative_max_pn_steps 1000 \
    --iterative_fail_tol_factor 1 \
    --seed $SEED ${EXTRA_ARGS:-}"

mkdir -p logs
if [[ -n "${TPU_NAME:-}" ]]; then
    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "${ZONE:?set ZONE}" \
        --worker=all --command "cd $(pwd) && $CMD" 2>&1 | tee logs/pt_pod.log
else
    $CMD 2>&1 | tee logs/pt_local.log
fi
echo "Completed PT study: $TARGET_DISTRIBUTION dim=$DIM chains=$NUM_CHAINS"
