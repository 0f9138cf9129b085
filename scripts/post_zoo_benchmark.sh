#!/bin/bash
# After the zoo retraining finishes: export the flagship into trained/,
# re-run the full benchmark matrix on the fixed-simulator dataset, refresh
# RESULTS.md tables, and regenerate all figures.
cd /root/repo

until grep -q RETRAIN_ZOO_DONE logs/zoo_d.log 2>/dev/null; do sleep 60; done
echo "=== $(date -u +%H:%M:%S) zoo done; exporting flagship ==="

# replace the committed flagship (stale pre-simulator-fix checkpoint would
# win latest_epoch otherwise)
rm -rf trained/Gaussian_PnP_ADMM_8iters_MultiScale_*epochs
python scripts/export_trained.py --runs Gaussian_PnP_ADMM_8iters_MultiScale || echo EXPORT_FAILED

echo "=== $(date -u +%H:%M:%S) running benchmark matrix ==="
timeout 70m python -u scripts/run_benchmark.py || echo BENCHMARK_FAILED

echo "=== $(date -u +%H:%M:%S) regenerating figures ==="
timeout 25m python -u scripts/make_figures.py || echo FIGURES_FAILED

echo "POST_ZOO_DONE $(date -u +%H:%M:%S)"
