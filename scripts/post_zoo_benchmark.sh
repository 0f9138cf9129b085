#!/bin/bash
# After the zoo retraining finishes: export the flagship into trained/,
# re-run the full benchmark matrix on the fixed-simulator dataset, refresh
# RESULTS.md tables, and regenerate all figures.
cd /root/repo

# bounded wait: if the zoo run dies without its final marker, give up
# after 6h instead of sleeping forever
for _ in $(seq 360); do
  grep -q RETRAIN_ZOO_DONE logs/zoo_d.log 2>/dev/null && break
  sleep 60
done
grep -q RETRAIN_ZOO_DONE logs/zoo_d.log || { echo "ZOO_NEVER_FINISHED"; exit 1; }
echo "=== $(date -u +%H:%M:%S) zoo done; exporting flagship ==="

# export into a staging dir first; only replace the committed flagship
# (whose stale pre-fix checkpoint would win latest_epoch) after success
rm -rf trained_staging && mkdir -p trained_staging
if python scripts/export_trained.py --runs Gaussian_PnP_ADMM_8iters_MultiScale --dst trained_staging; then
  rm -rf trained/Gaussian_PnP_ADMM_8iters_MultiScale_*epochs
  mv trained_staging/Gaussian_PnP_ADMM_8iters_MultiScale_*epochs trained/
  rmdir trained_staging
else
  echo EXPORT_FAILED
  rm -rf trained_staging
fi

echo "=== $(date -u +%H:%M:%S) running benchmark matrix ==="
timeout 70m python -u scripts/run_benchmark.py || echo BENCHMARK_FAILED

echo "=== $(date -u +%H:%M:%S) regenerating figures ==="
timeout 25m python -u scripts/make_figures.py || echo FIGURES_FAILED

echo "POST_ZOO_DONE $(date -u +%H:%M:%S)"
