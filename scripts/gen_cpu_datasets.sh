#!/bin/bash
# CPU generation of the benchmark datasets (the tunneled TPU wedges on bulk
# device->host fetches; simulation is cheap enough on host for one-time gen).
cd /root/repo
R10=datasets/LSST_23.5_deconv_tpu_10k
R1=datasets/LSST_23.5_deconv_tpu_1k_psf
echo "=== 10k main (no psf sets) $(date -u +%H:%M:%S) ==="
JAX_PLATFORMS=cpu python scripts/generate_sharded.py worker --root $R10 --n_test 10000 --skip_psf_errs --shard 0 --n_shards 2 &
P0=$!
JAX_PLATFORMS=cpu python scripts/generate_sharded.py worker --root $R10 --n_test 10000 --skip_psf_errs --shard 1 --n_shards 2 &
P1=$!
wait $P0 $P1
JAX_PLATFORMS=cpu python scripts/generate_sharded.py merge --root $R10 --n_test 10000 --skip_psf_errs
rm -rf $R10/_shards
echo "=== 1k psf-robustness $(date -u +%H:%M:%S) ==="
JAX_PLATFORMS=cpu python scripts/generate_sharded.py worker --root $R1 --n_test 1000 --shard 0 --n_shards 2 &
P0=$!
JAX_PLATFORMS=cpu python scripts/generate_sharded.py worker --root $R1 --n_test 1000 --shard 1 --n_shards 2 &
P1=$!
wait $P0 $P1
JAX_PLATFORMS=cpu python scripts/generate_sharded.py merge --root $R1 --n_test 1000
rm -rf $R1/_shards
echo "=== datasets done $(date -u +%H:%M:%S) ==="
