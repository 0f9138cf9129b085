#!/bin/bash
# Retrain the full learned zoo on the fixed simulator (PSF shear sign +
# sub-pixel registration, commit d4901d2), warm-starting each model from its
# best prior checkpoint.  Sequential: one TPU chip.  Each leg runs under
# `timeout` — the axon tunnel has been observed to wedge mid-run (reader
# blocked in tcp_recvmsg forever); a capped leg fails fast instead of
# stalling the whole night, and later legs still run.
cd /root/repo
S=saved_models_online

run() { # key steps init_dir cap_minutes
  echo "=== $(date -u +%H:%M:%S) retrain $1 (init $3, cap $4m) ==="
  timeout "$4"m python -u scripts/train_zoo.py --models "$1" --steps "$2" --init_from "$S/$3" \
    || echo "LEG_FAILED $1 (exit $?)"
}

# finish the interrupted admm8 leg: anneal 6000 more steps from its best
run admm8    6000  Gaussian_PnP_ADMM_8iters_MultiScale_10000epochs 35
run admm4    10000 Gaussian_PnP_ADMM_4iters_MultiScale_15000epochs 45
run admm2    10000 Gaussian_PnP_ADMM_2iters_MultiScale_13000epochs 40
run tikhonet 10000 Tikhonet_Laplacian_MultiScale_5000epochs 35
run resunet  10000 ResUNet_MultiScale_12000epochs 35
run shapenet 10000 ShapeNet_Laplacian_13000epochs 35
run poisson8 10000 Poisson_PnP_ADMM_8iters_MultiScale_6000epochs 50
echo "RETRAIN_ZOO_DONE $(date -u +%H:%M:%S)"
