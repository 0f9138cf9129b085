#!/bin/bash
# Round-3: retrain the bounded-rho ADMM(4)/(2) variants that died in round 2
# (logs/round2_train.log rc=143/75), matching the bounded-8 protocol exactly
# (4000 steps, batch 64, lr 1e-4, warm-started from the converged unbounded
# checkpoint — scripts/round2_train_pipeline.sh).
#
# Resumable: each stage writes logs/stamps/<name>.done on success and is
# skipped on re-run (VERDICT round-2 item 10 — a timeout can't zero the run).
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
stage "train-admm4-bounded" 2400 python -u scripts/train_zoo.py --models admm4_bounded \
  --steps 4000 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_4iters_MultiScale_13000epochs
stage "train-admm2-bounded" 2400 python -u scripts/train_zoo.py --models admm2_bounded \
  --steps 4000 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_2iters_MultiScale_15000epochs
echo "=== round3 bounded training done $(date -u +%H:%M:%S) ==="
