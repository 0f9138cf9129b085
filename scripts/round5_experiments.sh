#!/bin/bash
# Round-5 experiment pipeline (VERDICT r4 #1-#7), resumable staged pattern
# (round3_eval.sh lineage).  Tunnel discipline: exactly one jax process at
# a time; stages sleep 30s before connecting (docs/DESIGN.md #9).
#
#  A. loss-x-model matrix (VERDICT #3): sweep the existing ADMM(8)_Shape
#     checkpoint; train ADMM(4)_Shape (mirrors the reference's shipped
#     results/Unrolled_ADMM_Gaussian(4)_Shape) and short MomentBased /
#     BestEllipse rows; sweep all of them.
#  B. ShapeNet under the reference protocol (VERDICT weak #2 / #5).
#  C. sweep-matrix tails (VERDICT #4): PSF legs for ShapeNet_tpu_2M and
#     the three refproto rows; PSNR for ADMMNet_unit*.
#  D. high-SNR morphology experiment (VERDICT #7): clumpy-core population
#     vs the classical-row reference fingerprint at SNR 100/150/200.
#  E. perf bookkeeping after the matmul-DFT change: bf16 parity re-check,
#     MFU/roofline refresh, bench headline.
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

# wait for any in-flight diagnosis/CPU jax process to clear first
while pgrep -f "diagnose_tikhonet" > /dev/null; do
  echo "waiting for diagnose_tikhonet to finish..."; sleep 60
done

DATA=datasets/LSST_23.5_deconv_tpu_10k
PSF=datasets/LSST_23.5_deconv_tpu_1k_psf
BENCHARGS="--data $DATA --n_gal 10000 --batch 250 --psf_data $PSF --psf_n_gal 1000"

# --- A. loss-x-model matrix ---
stage "r5-sweep-admm8-shape" 3600 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(8)_Shape"
stage "r5-train-admm4-shape" 5400 python scripts/train_zoo.py --models admm4_shape --steps 7000
stage "r5-train-loss-rows" 7200 python scripts/train_zoo.py --models admm2_moment admm2_ellipse --steps 3000
stage "r5-sweep-loss-rows" 5400 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(4)_Shape" "Unrolled_ADMM_Gaussian(2)_MomentBased" "Unrolled_ADMM_Gaussian(2)_BestEllipse"
stage "r5-summarize-a" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu

# --- B. ShapeNet reference protocol ---
stage "r5-refproto-shapenet" 9000 python scripts/reference_protocol.py --models shapenet --epochs 35
stage "r5-sweep-refproto-shapenet" 2400 python scripts/run_benchmark.py $BENCHARGS --only ShapeNet_refproto

# --- C. sweep-matrix tails ---
stage "r5-tails-psf" 7200 python scripts/run_benchmark.py $BENCHARGS --skip_time \
  --only ShapeNet_tpu_2M "Unrolled_ADMM_Gaussian(8)_refproto" "Unrolled_ADMM_Gaussian(4)_refproto" "Unrolled_ADMM_Gaussian(2)_refproto"
stage "r5-tails-psnr" 2400 python scripts/run_benchmark.py $BENCHARGS --skip_time --skip_psf \
  --only ADMMNet_unit_fixed ADMMNet_unit
stage "r5-summarize-c" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu

# --- D. morphology experiment ---
stage "r5-morphology" 4800 python scripts/population_sweep.py --n_gal 1000 \
  --configs default clumpy very_clumpy --snrs 100 150 200 \
  --out figures/morphology_experiment.json

# --- E. perf bookkeeping ---
stage "r5-bf16-parity" 2400 python scripts/bf16_parity.py
stage "r5-mfu" 1200 python scripts/mfu.py
stage "r5-bench-headline" 900 python bench.py

stage "r5-summarize-final" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu
stage "r5-figures-final" 1200 python scripts/make_figures.py --data $DATA
echo "=== round5 pipeline done $(date -u +%H:%M:%S) ==="
