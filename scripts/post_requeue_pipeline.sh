#!/bin/bash
# After requeue_zoo.sh finishes: stage the committed flagship back into the
# scratch checkpoint dir (run_benchmark discovers checkpoints there), run
# the full benchmark matrix on the fixed benchmark dataset, refresh
# RESULTS.md tables + figures, and export the zoo into trained/.
cd /root/repo

for _ in $(seq 300); do
  grep -q REQUEUE_DONE logs/requeue.log 2>/dev/null && break
  sleep 60
done
grep -q REQUEUE_DONE logs/requeue.log || { echo "REQUEUE_NEVER_FINISHED"; exit 1; }

# the committed flagship export is {params, batch_stats}; restore_checkpoint
# without a template returns the same pytree, so it can stand in for a run
# checkpoint under the scratch dir
if [ ! -d saved_models_online/Gaussian_PnP_ADMM_8iters_MultiScale_6000epochs ]; then
  cp -r trained/Gaussian_PnP_ADMM_8iters_MultiScale_6000epochs saved_models_online/
fi

echo "=== $(date -u +%H:%M:%S) benchmark matrix ==="
timeout 120m python -u scripts/run_benchmark.py || echo BENCHMARK_FAILED

echo "=== $(date -u +%H:%M:%S) figures ==="
timeout 30m python -u scripts/make_figures.py || echo FIGURES_FAILED

echo "=== $(date -u +%H:%M:%S) exporting zoo to trained/ ==="
timeout 20m python -u scripts/export_trained.py --runs \
  Gaussian_PnP_ADMM_4iters_MultiScale \
  Gaussian_PnP_ADMM_2iters_MultiScale \
  Tikhonet_Laplacian_MultiScale \
  ShapeNet_Laplacian \
  ResUNet_MultiScale \
  Poisson_PnP_ADMM_8iters_MultiScale \
  Gaussian_PnP_ADMM_8iters_Shape \
  || echo EXPORT_FAILED

echo "POST_REQUEUE_DONE $(date -u +%H:%M:%S)"
