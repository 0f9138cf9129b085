#!/bin/bash
# Round-3 re-evaluation after the calibrated-population zoo retrain
# (scripts/round3_retrain_zoo.sh).  Same resumable-stage pattern as
# round3_eval.sh, ordered so the headline science (flagship family +
# bounded-rho rows + table refresh) lands first and auxiliary studies
# follow; a mid-pipeline summarize/figures checkpoint guarantees committed
# tables even if a later stage dies.
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  local stampname rc
  stampname=$(echo "$name" | tr -c 'A-Za-z0-9._-' '_')
  if [ -f "logs/stamps/$stampname.done" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    # settle: a client connecting right after the previous one exits can
    # wedge the tunneled device RPC (docs/DESIGN.md #9)
    sleep 30
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "logs/stamps/$stampname.done"
      return 0
    fi
    echo "!!! $name attempt $attempt failed (rc=$rc) $(date -u +%H:%M:%S)"
    sleep 10
  done
  echo "!!! $name FAILED twice, continuing pipeline"
  return 1
}

DATA=datasets/LSST_23.5_deconv_tpu_10k
PSF=datasets/LSST_23.5_deconv_tpu_1k_psf
BENCHARGS="--data $DATA --n_gal 10000 --batch 250 --psf_data $PSF --psf_n_gal 1000 --psnr_n_gal 2000"

stage "export-trained-rt" 600 python scripts/export_trained.py

# the headline family first (post-retrain rows)
for m in "Unrolled_ADMM_Gaussian(8)" "Unrolled_ADMM_Gaussian(4)" "Unrolled_ADMM_Gaussian(2)" \
         "Unrolled_ADMM_Gaussian(8)_bounded" "Unrolled_ADMM_Gaussian(4)_bounded" \
         "Unrolled_ADMM_Gaussian(2)_bounded"; do
  stage "sweep-$m" 1800 python scripts/run_benchmark.py $BENCHARGS --only "$m"
done
stage "summarize-mid" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only
stage "figures-mid" 900 python scripts/make_figures.py --data $DATA --skip_model

# the two VERDICT-critical studies next: the rho-schedule evidence behind
# the bounded experiment, and the population-fingerprint sweep
stage "rho-trace" 1200 python scripts/rho_trace.py
stage "population-sweep" 3000 python scripts/population_sweep.py --n_gal 1000

stage "sweep-tikhonet-tpu-rt" 1800 python scripts/run_benchmark.py $BENCHARGS \
  --only Tikhonet_Laplacian_tpu ShapeNet_tpu ShapeNet_tpu_cont
stage "sweep-poisson-rt" 1800 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Poisson(8)"
stage "sweep-admmnet-rt" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only ADMMNet ADMMNet_scaled ADMMNet_fixed ADMMNet_unit ADMMNet_unit_fixed

stage "reconcile-throughput" 1200 python scripts/reconcile_throughput.py
stage "bench-headline" 900 python bench.py
stage "mfu-live" 900 python scripts/mfu.py
stage "summarize-final" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only
stage "figures-final" 1200 python scripts/make_figures.py --data $DATA
echo "=== round3 re-eval done $(date -u +%H:%M:%S) ==="
