"""Sharded benchmark-dataset generation (CPU-friendly).

`generate_dataset` derives one PRNG key per 128-galaxy chunk from a
sequential split chain, so chunks are independently reproducible; this
script lets N worker processes each simulate an interleaved subset of the
TEST chunks (the expensive part: random-SNR split + 7 fixed-SNR variants +
20 perturbed-PSF sets) and a final merge assembles the exact
`generate_dataset` layout.  Used to build the 10k-galaxy benchmark on the
2-core host while the TPU trains.

  python scripts/generate_sharded.py worker --shard 0 --n_shards 2 ...
  python scripts/generate_sharded.py merge ...

Key derivation mirrors galaxy_deconv_tpu/data/dataset.py:143-170 exactly
(train chunks consume `key` splits first; the test chain starts from
fold_in(key, 7)), so `merge` output is bit-identical to a single-process
`generate_dataset` run with the same seed/chunk arguments.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SNRS = (20, 40, 60, 80, 100, 150, 200)
ERRS = (0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2)


def chunk_plan(seed, n_train, n_test, chunk):
    import jax

    key = jax.random.PRNGKey(seed)
    train_keys = []
    done = 0
    while done < n_train:
        n = min(chunk, n_train - done)
        key, k = jax.random.split(key)
        train_keys.append((k, n))
        done += n
    test_keys = []
    done = 0
    kroot = jax.random.fold_in(key, 7)
    while done < n_test:
        n = min(chunk, n_test - done)
        kroot, k = jax.random.split(kroot)
        test_keys.append((k, n))
        done += n
    return train_keys, test_keys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["worker", "merge"])
    p.add_argument("--root", default="datasets/LSST_23.5_deconv_tpu_10k")
    p.add_argument("--seed", type=int, default=31415)
    p.add_argument("--n_train", type=int, default=64)
    p.add_argument("--n_test", type=int, default=10000)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--shard", type=int, default=0)
    p.add_argument("--n_shards", type=int, default=2)
    p.add_argument("--skip_psf_errs", action="store_true",
                   help="omit the 20+20 perturbed-PSF sets (generate them in a separate\n"
                        "smaller dataset: they cost ~5x the rest of the test split)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from galaxy_deconv_tpu.data import simulate as sim
    from galaxy_deconv_tpu.data.dataset import FIELDS

    cfg = sim.SimulationConfig()
    root = pathlib.Path(args.root)
    shard_dir = root / "_shards"
    train_keys, test_keys = chunk_plan(args.seed, args.n_train, args.n_test, args.chunk)

    if args.mode == "worker":
        shard_dir.mkdir(parents=True, exist_ok=True)
        if args.shard == 0:
            store = {}
            for k, n in train_keys:
                out = sim.simulate_batch(k, n, cfg)
                for f in FIELDS:
                    store.setdefault(f, []).append(np.asarray(out[f], np.float32))
            d = root / "train"
            d.mkdir(parents=True, exist_ok=True)
            for f, chunks in store.items():
                np.save(d / f"{f}.npy", np.concatenate(chunks, axis=0))
            print("train split done", flush=True)
        for ci, (k, n) in enumerate(test_keys):
            if ci % args.n_shards != args.shard:
                continue
            marker = shard_dir / f"chunk_{ci:04d}.done"
            if marker.exists():
                continue
            blob = {}
            out = sim.simulate_batch(k, n, cfg)
            for f in FIELDS:
                blob[f] = np.asarray(out[f], np.float32)
            for snr in SNRS:
                o = sim.simulate_batch_at_snr(k, n, float(snr), cfg)
                blob[f"obs_{snr}"] = np.asarray(o["obs"], np.float32)
                blob[f"gt_{snr}"] = np.asarray(o["gt"], np.float32)
            for e in (() if args.skip_psf_errs else ERRS):
                blob[f"psf_shear_err_{e}"] = np.asarray(
                    sim.simulate_perturbed_psfs(k, n, cfg, shear_err=float(e)), np.float32
                )
                blob[f"psf_fwhm_err_{e}"] = np.asarray(
                    sim.simulate_perturbed_psfs(k, n, cfg, fwhm_err=float(e)), np.float32
                )
            np.savez(shard_dir / f"chunk_{ci:04d}.npz", **blob)
            marker.touch()
            print(f"chunk {ci}/{len(test_keys)} done", flush=True)
        return

    # merge
    d = root / "test"
    d.mkdir(parents=True, exist_ok=True)
    names = None
    files = [shard_dir / f"chunk_{ci:04d}.npz" for ci in range(len(test_keys))]
    missing = [f.name for f in files if not f.exists()]
    if missing:
        raise SystemExit(f"missing {len(missing)} chunks, e.g. {missing[:3]}")
    blobs = [np.load(f) for f in files]
    names = blobs[0].files
    for name in names:
        np.save(d / f"{name}.npy", np.concatenate([b[name] for b in blobs], axis=0))
        print("merged", name, flush=True)
    info = dict(
        n_train=args.n_train, n_test=args.n_test, fov_pixels=cfg.fov_pixels,
        pixel_scale=cfg.pixel_scale, upsample=cfg.upsample, seed=args.seed,
        snrs=list(SNRS),
        shear_errs=[] if args.skip_psf_errs else list(ERRS),
        fwhm_errs=[] if args.skip_psf_errs else list(ERRS),
        noise_sigma=sim.noise_sigma(cfg.pixel_scale),
        generator="galaxy_deconv_tpu.data.simulate",
    )
    with open(root / "info.json", "w") as f:
        json.dump(info, f, indent=1)
    print("merge complete:", root)


if __name__ == "__main__":
    main()
