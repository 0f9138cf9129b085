#!/bin/bash
# Round-5b: eval-harness round-trip collapse — measurement pipeline.
# Runs after the bulk-upload harness change (eval/harness.py):
#   A. re-run the A->D throughput-reconciliation ladder (the round-4
#      committed ladder is the "before"; this writes the "after" to a
#      separate JSON so both remain evidence)
#   B. refresh the whole method matrix's `time` rows under the new
#      harness (accuracy sweeps untouched: --skip_shear/_psnr/_psf)
#   C. regenerate the RESULTS.md summary tables on CPU
# Tunnel discipline: one TPU process at a time, 30s settle between stages
# (docs/DESIGN.md #9); every stage under timeout, resumable via stamps.
cd /root/repo
mkdir -p logs/stamps
stage() {
  local name="$1" tmo="$2"; shift 2
  local stampname rc
  stampname=$(echo "$name" | tr -c 'A-Za-z0-9._-' '_')
  if [ -f "logs/stamps/$stampname.done" ]; then
    echo "=== $name already done, skipping ==="
    return 0
  fi
  for attempt in 1 2; do
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

DATA=datasets/LSST_23.5_deconv_tpu_10k
BENCHARGS="--data $DATA --n_gal 10000 --batch 250"

stage "r5b-reconcile" 2400 python scripts/reconcile_throughput.py \
  --out figures/throughput_reconciliation_r5.json
stage "r5b-time-refresh" 7200 python scripts/run_benchmark.py $BENCHARGS \
  --skip_shear --skip_psnr --skip_psf
stage "r5b-summarize" 900 python scripts/run_benchmark.py $BENCHARGS --summarize_only --cpu
echo "=== round5b timing pipeline done $(date -u +%H:%M:%S) ==="
