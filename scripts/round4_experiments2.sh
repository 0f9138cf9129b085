#!/bin/bash
# Round-4 experiment pipeline, take 2 — re-planned after the ADMM(8)
# reference-protocol compile was observed to exceed the 1800s watchdog
# fuse twice (blocked in the tunneled device RPC; see
# scripts/reference_protocol.py).  Changes vs round4_experiments.sh:
#  * compile fuse widened to 3600s, stage timeouts widened to match;
#  * depths run 8 then 2 then 4 (the separation question is (2) vs (8);
#    (4) is opportunistic if the clock allows);
#  * epochs 35 (the reference default is 50; best-val selection makes
#    extra epochs pure insurance, and the histories record whether val
#    was still improving at the cut);
#  * ShapeNet-2M continuation moved behind the refproto experiment.
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  local stampname rc
  # printf, not echo: echo's trailing newline became a trailing '_' in the
  # stamp name, so externally pre-created stamps never matched
  stampname=$(printf '%s' "$name" | tr -c 'A-Za-z0-9._-' '_')
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

stage "r4b-refproto-train8" 9000 python scripts/reference_protocol.py --models 8 --epochs 35
stage "r4b-refproto-train2" 7200 python scripts/reference_protocol.py --models 2 --epochs 35
stage "r4b-refproto-sweep82" 3600 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(8)_refproto" "Unrolled_ADMM_Gaussian(2)_refproto"
stage "r4b-bf16-parity" 2400 python scripts/bf16_parity.py
stage "r4b-refproto-train4" 7200 python scripts/reference_protocol.py --models 4 --epochs 35
stage "r4b-refproto-sweep4" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only "Unrolled_ADMM_Gaussian(4)_refproto"
stage "r4b-shapenet-2M" 7200 python scripts/train_zoo.py --models shapenet --suffix _2M \
  --steps 12000 --init_from trained/ShapeNet_Laplacian_cont_4000epochs
stage "r4b-shapenet-2M-sweep" 2400 python scripts/run_benchmark.py $BENCHARGS --only ShapeNet_tpu_2M
stage "r4b-exp-summarize" 900 python scripts/run_benchmark.py --data $DATA --n_gal 10000 \
  --batch 250 --psf_data $PSF --psf_n_gal 1000 --summarize_only --cpu
echo "=== round4 experiments(2) done $(date -u +%H:%M:%S) ==="
