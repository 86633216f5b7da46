#!/usr/bin/env bash
# Sweep every seed-averaged reference family (data/ref_averaged/) through
# scripts/parity_vs_reference.py and write one result JSON per family to
# data/parity_r2/.  RWM families are cheap (one compile per target family,
# traced scale params); PT families pay ladder construction per grid point,
# so they run with --ladder_device cpu and longer MCMC runs (the reference's
# achieved swap rates come from 200k-500k-iteration trajectories — short runs
# under-equilibrate multimodal targets and bias the achieved rate low).
#
# Usage: scripts/run_parity_matrix.sh [rwm|pt|pt_production]
set -u
cd "$(dirname "$0")/.."
mkdir -p data/parity_r2
REF=data/ref_averaged
mode="${1:-rwm}"

run() { # name, extra args...
  local ref="$1"; shift
  local out="data/parity_r2/$(basename "$ref" | sed 's/_seeds.*//; s/$/.json/')"
  if [ -f "$out" ]; then echo "skip $out"; return; fi
  echo "=== $ref -> $out"
  timeout 7200 python scripts/parity_vs_reference.py \
      --ref_file "$REF/$ref" --out "$out" "$@" || echo "FAILED: $ref"
}

if [ "$mode" = rwm ]; then
  for f in \
    EvenRosenbrock_Normal_RWM_GPU_dim2_1000000iters_seeds* \
    EvenRosenbrock_Normal_RWM_GPU_dim10_1000000iters_seeds* \
    EvenRosenbrock_Normal_RWM_GPU_dim20_1000000iters_seeds* \
    EvenRosenbrock_Normal_RWM_GPU_dim30_1000000iters_seeds* \
    Hypercube_Normal_RWM_GPU_dim100_200000iters_seeds* \
    Hypercube_RWM_GPU_dim10_100000iters_seeds* \
    IIDBeta_Normal_RWM_GPU_dim10_200000iters_seeds* \
    IIDBeta_Normal_RWM_GPU_dim30_200000iters_seeds* \
    IIDBeta_Normal_RWM_GPU_dim100_100000iters_seeds* \
    IIDGamma_Normal_RWM_GPU_dim100_100000iters_seeds* \
    MultivariateNormal_RWM_GPU_dim20_100000iters_seeds* \
    MultivariateNormal_Laplace_RWM_GPU_dim100_100000iters_seeds* \
    MultivariateNormal_UniformRadius_RWM_GPU_dim100_100000iters_seeds* \
    NealFunnel_Normal_RWM_GPU_dim20_1000000iters_seeds* \
    RoughCarpet_Normal_RWM_GPU_dim2_100000iters_seeds* \
    ThreeMixture_Normal_RWM_GPU_dim50_200000iters_seeds* ; do
    base=$(cd "$REF" && ls $f 2>/dev/null | head -1) || continue
    [ -n "$base" ] && run "$base" --match_protocol --num_chains 512 --stride 2
  done
elif [ "$mode" = pt ]; then
  # standard estimator precision; protocol-matched runs (the reference's
  # curves are trajectory averages over its exact protocol)
  for f in \
    MultivariateNormal_PT_GPU_dim10_500000iters_seeds* \
    MultivariateNormal_PT_GPU_dim20_200000iters_seeds* \
    MultivariateNormal_PT_GPU_dim30_200000iters_seeds* \
    RoughCarpet_PT_GPU_dim10_200000iters_seeds* \
    RoughCarpet_PT_GPU_dim30_200000iters_seeds* \
    ThreeMixture_PT_GPU_dim10_200000iters_seeds* \
    ThreeMixture_PT_GPU_dim20_200000iters_seeds* ; do
    base=$(cd "$REF" && ls $f 2>/dev/null | head -1) || continue
    # tolerance 5e-3 >> the estimator's MC noise at 5e4 samples (9.5e-4), so
    # the Robbins-Monro converges in a few probes instead of running to the
    # 100-step fallback; rung-placement error stays below the comparison
    # tolerances
    [ -n "$base" ] && run "$base" --match_protocol \
        --num_chains 64 --stride 3 --N_samples_swap_est 50000 \
        --iterative_tolerance 0.005 --ladder_device cpu
  done
elif [ "$mode" = pt_production ]; then
  # the reference's production estimator precision (run_pt_gpu.sbatch:30-40)
  for f in \
    RoughCarpet_PT_GPU_dim20_500000iters_seeds* \
    ThreeMixture_PT_GPU_dim30_500000iters_seeds* ; do
    base=$(cd "$REF" && ls $f 2>/dev/null | head -1) || continue
    out="data/parity_r2/$(basename "$base" | sed 's/_seeds.*//; s/$/_production.json/')"
    if [ -f "$out" ]; then echo "skip $out"; continue; fi
    echo "=== $base -> $out (production precision)"
    timeout 14400 python scripts/parity_vs_reference.py \
        --ref_file "$REF/$base" --out "$out" \
        --match_protocol --num_chains 64 --stride 6 \
        --N_samples_swap_est 1000000 --iterative_tolerance 0.0001 \
        --ladder_device cpu || echo "FAILED: $base"
  done
fi
