#!/bin/bash
# Round-2 final evaluation: 10k-galaxy benchmark sweep (VERDICT item 4),
# PSF robustness on the 1k dataset, live MFU, figures.
cd /root/repo
stage() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" || echo "!!! $name failed (rc=$?) $(date -u +%H:%M:%S)"
}
stage "export-trained" 600 python scripts/export_trained.py
# round-1 results used the pre-rewrite shear metric (282a982) — regenerate
# everything; the old numbers stay in git history
rm -rf results_tpu
stage "benchmark-10k" 4500 python scripts/run_benchmark.py \
  --data datasets/LSST_23.5_deconv_tpu_10k --n_gal 10000 --batch 250 \
  --psf_data datasets/LSST_23.5_deconv_tpu_1k_psf --psf_n_gal 1000
stage "bench-headline" 600 python bench.py
stage "mfu-live" 900 python scripts/mfu.py
stage "figures" 600 python scripts/make_figures.py --data datasets/LSST_23.5_deconv_tpu_10k
echo "=== eval done $(date -u +%H:%M:%S) ==="
