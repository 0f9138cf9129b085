"""Dataset storage and batched loading.

Capability parity with reference ``utils/utils_data.py`` (Galaxy_Dataset /
get_dataloader) redesigned for TPU input pipelines:

* storage is **packed memmap-able .npy arrays** per split/field instead of
  56k individual ``.pth`` files — one sequential read feeds the whole
  epoch; ``load_reference_pth_dataset`` converts the reference's on-disk
  layout (psf_i.pth / obs_i.pth / gt_i.pth + info.json) when present;
* ``alpha`` = mean(obs) is computed in-pipeline exactly as the reference
  does per sample (``utils/utils_data.py:100``);
* loaders are plain python generators yielding numpy batches; device
  placement / sharding happens in ``parallel`` (per-host slicing for
  multi-process feeding is built in here via process_index/count).

Layout on disk::

    <root>/info.json
    <root>/train/{obs,psf,gt,alpha,snr,gal_g1,gal_g2}.npy
    <root>/test/...                        (random-SNR split)
    <root>/test/obs_{snr}.npy, gt_{snr}.npy       per fixed-SNR variant
    <root>/test/psf_shear_err_{e}.npy, psf_fwhm_err_{e}.npy
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Iterator, Optional

import numpy as np

import jax

from galaxy_deconv_tpu.data import simulate as sim

FIELDS = ("obs", "psf", "gt", "alpha", "snr", "gal_g1", "gal_g2")


@dataclasses.dataclass
class GalaxyDataset:
    """Memmapped packed dataset for one split."""

    root: pathlib.Path
    split: str = "train"
    obs_variant: Optional[str] = None  # e.g. 'obs_100' for a fixed-SNR sweep
    psf_variant: Optional[str] = None  # e.g. 'psf_shear_err_0.02'

    def __post_init__(self):
        self.root = pathlib.Path(self.root)
        with open(self.root / "info.json") as f:
            self.info = json.load(f)
        d = self.root / self.split
        self.obs = np.load(d / f"{self.obs_variant or 'obs'}.npy", mmap_mode="r")
        self.psf = np.load(d / f"{self.psf_variant or 'psf'}.npy", mmap_mode="r")
        gt_name = "gt" if self.obs_variant is None else self.obs_variant.replace("obs", "gt")
        gt_path = d / f"{gt_name}.npy"
        self.gt = np.load(gt_path if gt_path.exists() else d / "gt.npy", mmap_mode="r")
        self.gal_g1 = np.load(d / "gal_g1.npy", mmap_mode="r")
        self.gal_g2 = np.load(d / "gal_g2.npy", mmap_mode="r")

    def __len__(self) -> int:
        return self.obs.shape[0]

    def batch(self, idx: np.ndarray) -> dict:
        obs = np.asarray(self.obs[idx], np.float32)
        return dict(
            obs=obs,
            psf=np.asarray(self.psf[idx], np.float32),
            gt=np.asarray(self.gt[idx], np.float32),
            alpha=obs.mean(axis=(-2, -1)),  # reference: per-sample mean(obs)
            gal_g1=np.asarray(self.gal_g1[idx], np.float32),
            gal_g2=np.asarray(self.gal_g2[idx], np.float32),
        )


def iterate_batches(
    ds: GalaxyDataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
    indices: Optional[np.ndarray] = None,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[dict]:
    """Yield numpy batch dicts; for multi-host, each process sees a disjoint
    1/process_count slice (feed with parallel.shard_batch /
    jax.make_array_from_process_local_data)."""
    idx = np.arange(len(ds)) if indices is None else np.asarray(indices)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    idx = idx[process_index::process_count]
    n = len(idx)
    stop = n - (n % batch_size) if drop_last else n
    for s in range(0, stop, batch_size):
        yield ds.batch(idx[s : s + batch_size])


def train_val_indices(n: int, train_val_split: float = 0.8, seed: int = 0):
    """Random train/val index split (reference get_dataloader's random_split)."""
    idx = np.arange(n)
    np.random.default_rng(seed).shuffle(idx)
    n_train = int(train_val_split * n)
    return idx[:n_train], idx[n_train:]


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


def _append(store: dict, out: dict):
    for k in FIELDS:
        store.setdefault(k, []).append(np.asarray(out[k], np.float32))


def _write(d: pathlib.Path, store: dict):
    d.mkdir(parents=True, exist_ok=True)
    for k, chunks in store.items():
        np.save(d / f"{k}.npy", np.concatenate(chunks, axis=0))


def generate_dataset(
    root,
    n_train: int = 2000,
    n_test: int = 500,
    cfg: sim.SimulationConfig = sim.SimulationConfig(),
    seed: int = 31415,
    chunk: int = 128,
    snrs=(20, 40, 60, 80, 100, 150, 200),
    shear_errs=(0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2),
    fwhm_errs=(0.003, 0.005, 0.01, 0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2),
    verbose: bool = True,
) -> pathlib.Path:
    """Simulate and write a full benchmark dataset (reference
    generate_data.py capability: train split, random-SNR test split, seven
    fixed-SNR test variants, and perturbed-PSF robustness sets)."""
    root = pathlib.Path(root)
    root.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    # train
    store: dict = {}
    done = 0
    while done < n_train:
        n = min(chunk, n_train - done)
        key, k = jax.random.split(key)
        _append(store, sim.simulate_batch(k, n, cfg))
        done += n
        if verbose:
            print(f"\rtrain {done}/{n_train}", end="", flush=True)
    _write(root / "train", store)
    if verbose:
        print()

    # test: the *same* underlying galaxies/PSFs across the random-SNR split,
    # each fixed-SNR variant, and the perturbed-PSF sets — achieved by
    # reusing the same per-chunk PRNG keys (the JAX-native analogue of the
    # reference's load_info sequence replay).
    test_keys = []
    done = 0
    kroot = jax.random.fold_in(key, 7)
    while done < n_test:
        n = min(chunk, n_test - done)
        kroot, k = jax.random.split(kroot)
        test_keys.append((k, n))
        done += n

    store = {}
    for k, n in test_keys:
        _append(store, sim.simulate_batch(k, n, cfg))
    _write(root / "test", store)

    for snr in snrs:
        store = {}
        for k, n in test_keys:
            _append(store, sim.simulate_batch_at_snr(k, n, float(snr), cfg))
        d = root / "test"
        np.save(d / f"obs_{snr}.npy", np.concatenate(store["obs"], axis=0))
        np.save(d / f"gt_{snr}.npy", np.concatenate(store["gt"], axis=0))
        if verbose:
            print(f"test snr={snr} done")

    for e in shear_errs:
        chunks = [np.asarray(sim.simulate_perturbed_psfs(k, n, cfg, shear_err=float(e))) for k, n in test_keys]
        np.save(root / "test" / f"psf_shear_err_{e}.npy", np.concatenate(chunks, axis=0))
    for e in fwhm_errs:
        chunks = [np.asarray(sim.simulate_perturbed_psfs(k, n, cfg, fwhm_err=float(e))) for k, n in test_keys]
        np.save(root / "test" / f"psf_fwhm_err_{e}.npy", np.concatenate(chunks, axis=0))
    if verbose:
        print("perturbed psf sets done")

    info = dict(
        n_train=n_train,
        n_test=n_test,
        fov_pixels=cfg.fov_pixels,
        pixel_scale=cfg.pixel_scale,
        upsample=cfg.upsample,
        seed=seed,
        snrs=list(snrs),
        shear_errs=list(shear_errs),
        fwhm_errs=list(fwhm_errs),
        noise_sigma=sim.noise_sigma(cfg.pixel_scale),
        generator="galaxy_deconv_tpu.data.simulate",
    )
    with open(root / "info.json", "w") as f:
        json.dump(info, f, indent=1)
    return root


def generate_dataset_denoise(
    root,
    n_train: int = 2000,
    n_test: int = 500,
    cfg: sim.SimulationConfig = sim.SimulationConfig(),
    seed: int = 31415,
    chunk: int = 128,
    verbose: bool = True,
) -> pathlib.Path:
    """Simulate and write a denoising-task dataset (reference
    ``generate_data.py --task Denoise``, :337-452): obs = gt + CCD noise,
    no PSF convolution — the training set for the standalone ResUNet
    denoiser that powers the frozen-denoiser ADMMNet baseline."""
    root = pathlib.Path(root)
    root.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)

    for split, n_split in (("train", n_train), ("test", n_test)):
        store: dict = {}
        done = 0
        while done < n_split:
            n = min(chunk, n_split - done)
            key, k = jax.random.split(key)
            _append(store, sim.simulate_batch_denoise(k, n, cfg))
            done += n
            if verbose:
                print(f"\r{split} {done}/{n_split}", end="", flush=True)
        _write(root / split, store)
        if verbose:
            print()

    info = dict(
        n_train=n_train,
        n_test=n_test,
        fov_pixels=cfg.fov_pixels,
        pixel_scale=cfg.pixel_scale,
        upsample=cfg.upsample,
        seed=seed,
        task="Denoise",
        noise_sigma=sim.noise_sigma(cfg.pixel_scale),
        generator="galaxy_deconv_tpu.data.simulate",
    )
    with open(root / "info.json", "w") as f:
        json.dump(info, f, indent=1)
    return root


# ---------------------------------------------------------------------------
# Reference-format conversion
# ---------------------------------------------------------------------------


def load_reference_pth_dataset(data_path, out_root, train: bool = True, limit: Optional[int] = None):
    """Convert the reference's per-sample ``.pth`` layout into packed arrays.

    Requires torch (CPU) and a dataset generated by the reference's
    ``generate_data.py`` (info.json with n_train/n_test/sequence).
    """
    import torch  # gated: only needed for migration from the reference layout

    data_path = pathlib.Path(data_path)
    out_root = pathlib.Path(out_root)
    with open(data_path / "info.json") as f:
        info = json.load(f)
    n_train, n_test = info["n_train"], info["n_test"]
    start, count = (0, n_train) if train else (n_train, n_test)
    if limit:
        count = min(count, limit)

    fields = {k: [] for k in ("obs", "psf", "gt")}
    for i in range(start, start + count):
        for k in fields:
            fields[k].append(torch.load(data_path / k / f"{k}_{i}.pth").numpy())
    split = "train" if train else "test"
    d = out_root / split
    d.mkdir(parents=True, exist_ok=True)
    for k, v in fields.items():
        np.save(d / f"{k}.npy", np.stack(v).astype(np.float32))
    obs = np.stack(fields["obs"])
    np.save(d / "alpha.npy", obs.mean(axis=(-2, -1)).astype(np.float32))
    for k in ("snr", "gal_g1", "gal_g2"):
        np.save(d / f"{k}.npy", np.zeros(count, np.float32))  # unknown in reference layout
    with open(out_root / "info.json", "w") as f:
        json.dump({**info, "converted_from": str(data_path)}, f)
    return out_root
