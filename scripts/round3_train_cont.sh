#!/bin/bash
# Round-3 continuation training (VERDICT r2 #6/#9):
#  - flagship ADMM(8) trained 20k further steps (~1.3M more galaxies,
#    roughly 2x its prior budget and ~3x the reference's 800k-sample
#    protocol in total) -> Unrolled_ADMM_Gaussian(8)_cont row;
#  - ShapeNet (Meyer-bank shape-constraint loss) trained 8k further steps
#    to test whether its gap to the transplanted reference checkpoint is
#    training length -> ShapeNet_tpu_cont row.
# Resumable via logs/stamps (same pattern as round3_eval.sh).
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  if [ -f "logs/stamps/$name.done" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    if timeout "$tmo" "$@"; then
      touch "logs/stamps/$name.done"
      return 0
    fi
    echo "!!! $name attempt $attempt failed (rc=$?) $(date -u +%H:%M:%S)"
    sleep 15
  done
  echo "!!! $name FAILED twice, continuing pipeline"
  return 1
}
stage "train-admm8-long" 7200 python -u scripts/train_zoo.py --models admm8 --suffix _cont \
  --steps 20000 --batch 64 --lr 2e-4 \
  --init_from trained/Gaussian_PnP_ADMM_8iters_MultiScale_6000epochs
stage "train-shapenet-cont" 3000 python -u scripts/train_zoo.py --models shapenet --suffix _cont \
  --steps 8000 --batch 64 --lr 1e-4 \
  --init_from saved_models_online/ShapeNet_Laplacian_4000epochs
echo "=== round3 continuation training done $(date -u +%H:%M:%S) ==="
