#!/bin/bash
# Trimmed tail of round3_retrain_zoo.sh (wall-clock budget): tikhonet /
# shapenet keep their full adaptation budget (they feed the ShapeNet
# length-ablation, VERDICT r2 weak #4/#6); poisson8 / resunet get a short
# adaptation (capability rows whose mechanisms were already root-caused).
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  local rc
  if [ -f "logs/stamps/$name.done" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
    sleep 30
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "logs/stamps/$name.done"
      return 0
    fi
    echo "!!! $name attempt $attempt failed (rc=$rc) $(date -u +%H:%M:%S)"
    sleep 15
  done
  echo "!!! $name FAILED twice, continuing pipeline"
  return 1
}
Z="python -u scripts/train_zoo.py"
stage "rt-tikhonet" 2400 $Z --models tikhonet --steps 5000 --batch 64 --lr 2e-4 \
  --init_from trained/Tikhonet_Laplacian_MultiScale_5000epochs
stage "rt-shapenet-cont" 3000 $Z --models shapenet --suffix _cont --steps 5000 --batch 64 --lr 1e-4 \
  --init_from saved_models_online/ShapeNet_Laplacian_4000epochs
stage "rt-poisson8" 2400 $Z --models poisson8 --steps 2500 --batch 64 --lr 2e-4 \
  --init_from trained/Poisson_PnP_ADMM_8iters_MultiScale_10000epochs
stage "rt-resunet" 1500 $Z --models resunet --steps 2500 --batch 64 --lr 2e-4 \
  --init_from trained/ResUNet_MultiScale_12000epochs
echo "=== round3 retrain tail done $(date -u +%H:%M:%S) ==="
