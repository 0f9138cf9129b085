#!/bin/bash
# Continuation of the round-2 training pipeline with trimmed budgets
# (CPU contention with the dataset workers cut throughput ~3x).
cd /root/repo
# wait for the running admm8_bounded stage (pid passed as $1) to finish
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
stage() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "!!! $name failed (rc=$?) $(date -u +%H:%M:%S)"
}
stage "train-admm4-bounded" 1500 python scripts/train_zoo.py --models admm4_bounded \
  --steps 2500 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_4iters_MultiScale_13000epochs
stage "train-admm2-bounded" 1200 python scripts/train_zoo.py --models admm2_bounded \
  --steps 2500 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_2iters_MultiScale_15000epochs
stage "train-resunet-unit" 1000 python scripts/train_zoo.py --models resunet_unit \
  --steps 2500 --batch 64 --lr 2e-4
stage "train-shapenet-meyer" 1200 python scripts/train_zoo.py --models shapenet \
  --steps 4000 --batch 64 --lr 2e-4
echo "=== training continuation done $(date -u +%H:%M:%S) ==="
