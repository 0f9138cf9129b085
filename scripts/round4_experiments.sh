#!/bin/bash
# Round-4 experiment pipeline (runs AFTER scripts/round4_eval.sh so the
# corrected-metric benchmark lands first; same resumable-stage pattern).
#
#  1. Reference-protocol training (VERDICT #2): ADMM(8/4/2) from scratch on
#     a fixed 40k-stamp dataset, bs 32, constant lr 2e-4, best-val
#     selection — the direct test of round-3's iteration-separation
#     hypothesis — then benchmark the three checkpoints.
#  2. ShapeNet training-budget continuation (VERDICT #6): continue the
#     Meyer-bank shape-constraint run to ~2M cumulative samples
#     (9k steps x 64 so far = 0.58M; +20k steps = +1.28M).
#  3. bf16-vs-fp32 parity re-measure on the current checkpoints/benchmark
#     (VERDICT weak #4).
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

DATA=datasets/LSST_23.5_deconv_tpu_10k
PSF=datasets/LSST_23.5_deconv_tpu_1k_psf
BENCHARGS="--data $DATA --n_gal 10000 --batch 250 --skip_psf --skip_psnr"

# 1. reference-protocol training, one stage per depth (resumable)
stage "r4-refproto-train8" 5400 python scripts/reference_protocol.py --models 8
stage "r4-refproto-train4" 5400 python scripts/reference_protocol.py --models 4
stage "r4-refproto-train2" 5400 python scripts/reference_protocol.py --models 2
stage "r4-refproto-sweep" 3000 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(8)_refproto" "Unrolled_ADMM_Gaussian(4)_refproto" "Unrolled_ADMM_Gaussian(2)_refproto"

# 2. ShapeNet continuation toward the reference's ~2M-sample budget
stage "r4-shapenet-2M" 7200 python scripts/train_zoo.py --models shapenet --suffix _2M \
  --steps 20000 --init_from trained/ShapeNet_Laplacian_cont_4000epochs
stage "r4-shapenet-2M-sweep" 1800 python scripts/run_benchmark.py $BENCHARGS --only ShapeNet_tpu_2M

# 3. bf16 parity on current checkpoints + benchmark + metric
stage "r4-bf16-parity" 1800 python scripts/bf16_parity.py

stage "r4-exp-summarize" 900 python scripts/run_benchmark.py --data $DATA --n_gal 10000 \
  --batch 250 --psf_data $PSF --psf_n_gal 1000 --summarize_only --cpu
echo "=== round4 experiments done $(date -u +%H:%M:%S) ==="
