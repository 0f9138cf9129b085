#!/bin/bash
# Retrain the full learned zoo on the fixed simulator (PSF shear sign +
# sub-pixel registration, commit d4901d2), warm-starting each model from its
# pre-fix best checkpoint.  Sequential: one TPU chip.
set -e
cd /root/repo
S=saved_models_online

run() { # key steps init_dir
  echo "=== $(date -u +%H:%M:%S) retrain $1 (init $3) ==="
  python -u scripts/train_zoo.py --models "$1" --steps "$2" --init_from "$S/$3"
}

run admm8    15000 Gaussian_PnP_ADMM_8iters_MultiScale_cont_15000epochs
run admm4    10000 Gaussian_PnP_ADMM_4iters_MultiScale_15000epochs
run admm2    10000 Gaussian_PnP_ADMM_2iters_MultiScale_13000epochs
run tikhonet 10000 Tikhonet_Laplacian_MultiScale_5000epochs
run resunet  10000 ResUNet_MultiScale_12000epochs
run shapenet 10000 ShapeNet_Laplacian_13000epochs
run poisson8 10000 Poisson_PnP_ADMM_8iters_MultiScale_6000epochs
echo "RETRAIN_ZOO_DONE $(date -u +%H:%M:%S)"
