#!/bin/bash
# Round-3 evaluation pipeline: the 10k-galaxy benchmark sweep (BASELINE.md
# north star), PSF robustness for the FULL method matrix on the 1k companion
# set, the bounded-rho ADMM rows, throughput reconciliation, headline bench,
# live MFU, rho traces, figures, and the RESULTS.md table refresh.
#
# Resumable per stage (VERDICT r2 #10): each stage writes
# logs/stamps/<name>.done and is skipped on re-run, and the sweep is staged
# per METHOD (each method's results.json merges independently), so a timeout
# kills at most one method's leg.
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  local stampname
  stampname=$(echo "$name" | tr -c 'A-Za-z0-9._-' '_')
  if [ -f "logs/stamps/$stampname.done" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  local rc
  for attempt in 1 2; do
    # settle: a client connecting right after the previous one exits can
    # wedge the tunneled device RPC (docs/DESIGN.md #9)
    sleep 30
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ==="
    timeout "$tmo" "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      touch "logs/stamps/$stampname.done"
      return 0
    fi
    echo "!!! $name attempt $attempt failed (rc=$rc) $(date -u +%H:%M:%S)"
    sleep 10
  done
  echo "!!! $name FAILED twice, continuing pipeline"
  return 1
}

stage "export-trained" 600 python scripts/export_trained.py

DATA=datasets/LSST_23.5_deconv_tpu_10k
PSF=datasets/LSST_23.5_deconv_tpu_1k_psf
BENCHARGS="--data $DATA --n_gal 10000 --batch 250 --psf_data $PSF --psf_n_gal 1000"

# every method in the matrix, one resumable leg each (cheap classical ones
# grouped; heavy learned ones individual)
stage "sweep-classical" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only No_Deconv FPFS Wiener "Richard-Lucy(10)" "Richard-Lucy(20)" "Richard-Lucy(30)" \
         "Richard-Lucy(50)" "Richard-Lucy(100)"
stage "sweep-transplants" 1800 python scripts/run_benchmark.py $BENCHARGS \
  --only Tikhonet_Laplacian Tikhonet_Identity ShapeNet
stage "sweep-tikhonet-tpu" 1800 python scripts/run_benchmark.py $BENCHARGS \
  --only Tikhonet_Laplacian_tpu ShapeNet_tpu ShapeNet_tpu_cont
for m in "Unrolled_ADMM_Gaussian(8)" "Unrolled_ADMM_Gaussian(4)" "Unrolled_ADMM_Gaussian(2)" \
         "Unrolled_ADMM_Gaussian(8)_bounded" "Unrolled_ADMM_Gaussian(4)_bounded" \
         "Unrolled_ADMM_Gaussian(2)_bounded" "Unrolled_ADMM_Poisson(8)"; do
  stage "sweep-$m" 1800 python scripts/run_benchmark.py $BENCHARGS --only "$m"
done
stage "sweep-admmnet" 2400 python scripts/run_benchmark.py $BENCHARGS \
  --only ADMMNet ADMMNet_scaled ADMMNet_fixed ADMMNet_unit ADMMNet_unit_fixed

stage "population-sweep" 3000 python scripts/population_sweep.py --n_gal 1000
stage "rho-trace" 1200 python scripts/rho_trace.py
stage "reconcile-throughput" 1200 python scripts/reconcile_throughput.py
stage "bench-headline" 900 python bench.py
stage "mfu-live" 900 python scripts/mfu.py
stage "summarize" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only
stage "figures" 900 python scripts/make_figures.py --data $DATA
echo "=== round3 eval done $(date -u +%H:%M:%S) ==="
