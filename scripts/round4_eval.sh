#!/bin/bash
# Round-4 full benchmark re-sweep under the corrected (linear-FPFS) shear
# metric — scripts/diagnose_rl.py root-caused round 3's low-SNR fingerprint
# divergence to the estimator, so every committed rec_shear/gt_shear array
# is stale.  Same resumable-stage pattern as round3_eval2.sh: gt (No_Deconv)
# and the classical fingerprint first, headline family next, auxiliary rows
# after, with a mid-pipeline summarize so tables land even if a late stage
# dies.  PSNR entries are metric-independent and preserved (--skip_psnr).
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
BENCHARGS="--data $DATA --n_gal 10000 --batch 250 --psf_data $PSF --psf_n_gal 1000 --skip_psnr"

stage "r4-strip-stale" 300 python scripts/strip_stale_shear.py

# gt_shear (No_Deconv) + the classical fingerprint rows first — these are
# the rows the metric fix is expected to pull onto the reference's numbers
stage "r4-sweep-base" 2400 python scripts/run_benchmark.py $BENCHARGS --only No_Deconv FPFS Wiener
stage "r4-sweep-rl" 3600 python scripts/run_benchmark.py $BENCHARGS \
  --only "Richard-Lucy(10)" "Richard-Lucy(20)" "Richard-Lucy(30)" "Richard-Lucy(50)" "Richard-Lucy(100)"
stage "r4-sweep-transplants" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only Tikhonet_Laplacian Tikhonet_Identity ShapeNet
stage "r4-summarize-early" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu

# headline family
stage "r4-sweep-flagship" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(8)" "Unrolled_ADMM_Gaussian(4)" "Unrolled_ADMM_Gaussian(2)"
stage "r4-sweep-bounded" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(8)_bounded" "Unrolled_ADMM_Gaussian(4)_bounded" "Unrolled_ADMM_Gaussian(2)_bounded"
stage "r4-summarize-mid" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu
stage "r4-figures-mid" 900 python scripts/make_figures.py --data $DATA --skip_model

# the rest of the zoo
stage "r4-sweep-tpu-trained" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only Tikhonet_Laplacian_tpu ShapeNet_tpu ShapeNet_tpu_cont
stage "r4-sweep-poisson" 1800 python scripts/run_benchmark.py $BENCHARGS --only "Unrolled_ADMM_Poisson(8)"
stage "r4-sweep-admmnet" 3000 python scripts/run_benchmark.py $BENCHARGS \
  --only ADMMNet ADMMNet_scaled ADMMNet_fixed ADMMNet_unit ADMMNet_unit_fixed

# population fingerprint under the corrected metric (closes VERDICT #1:
# the committed round-3 sweep's 0.94-1.06 distances were metric artifacts)
stage "r4-population-sweep" 3000 python scripts/population_sweep.py --n_gal 1000

# round-2/3 standing demand: reconcile bench.py's headline gal/s with the
# eval sweep's time/gal (VERDICT #3 — scripted in round 3, never executed)
stage "r4-reconcile-throughput" 1200 python scripts/reconcile_throughput.py
stage "r4-bench-headline" 900 python bench.py

stage "r4-summarize-final" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu
stage "r4-figures-final" 1200 python scripts/make_figures.py --data $DATA
echo "=== round4 re-eval done $(date -u +%H:%M:%S) ==="
