#!/bin/bash
# Round-2 TPU pipeline: 10k benchmark dataset, then bounded-rho zoo training,
# then the unit-scale denoiser + ShapeNet (Meyer bank) runs.
# Every stage runs under timeout with one retry: the tunneled TPU backend can
# wedge mid-RPC (observed: client blocked on socket read with the remote
# serving nothing; killing the client unwedges the service).
cd /root/repo

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@" && return 0
    echo "!!! $name attempt $attempt failed (rc=$?) $(date -u +%H:%M:%S)"
    sleep 10
  done
  echo "!!! $name FAILED twice, continuing pipeline"
  return 0
}

stage "gen-10k" 1500 python -c "
from galaxy_deconv_tpu.data.dataset import generate_dataset
generate_dataset('datasets/LSST_23.5_deconv_tpu_10k', n_train=64, n_test=10000)
"
stage "train-admm8-bounded" 2400 python scripts/train_zoo.py --models admm8_bounded \
  --steps 4000 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_8iters_MultiScale_6000epochs
stage "train-admm4-bounded" 1800 python scripts/train_zoo.py --models admm4_bounded \
  --steps 4000 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_4iters_MultiScale_13000epochs
stage "train-admm2-bounded" 1500 python scripts/train_zoo.py --models admm2_bounded \
  --steps 4000 --batch 64 --lr 1e-4 \
  --init_from trained/Gaussian_PnP_ADMM_2iters_MultiScale_15000epochs
stage "train-resunet-unit" 1200 python scripts/train_zoo.py --models resunet_unit \
  --steps 3000 --batch 64 --lr 2e-4
stage "train-shapenet-meyer" 1500 python scripts/train_zoo.py --models shapenet \
  --steps 5000 --batch 64 --lr 2e-4
echo "=== TPU pipeline done $(date -u +%H:%M:%S) ==="
