"""Data pipeline tests: simulator statistics and dataset round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galaxy_deconv_tpu.data import (
    GalaxyDataset,
    SimulationConfig,
    generate_dataset,
    iterate_batches,
    noise_sigma,
    simulate_batch,
)
from galaxy_deconv_tpu.data.dataset import train_val_indices
from galaxy_deconv_tpu.data.simulate import simulate_batch_at_snr, simulate_perturbed_psfs

CFG = SimulationConfig(pupil_n=64, pupil_pad=128)  # small pupil for CPU tests


class TestSimulator:
    @pytest.fixture(scope="class")
    def batch(self):
        return jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 8, CFG))

    def test_shapes_and_finite(self, batch):
        for k in ("obs", "psf", "gt"):
            assert batch[k].shape == (8, 48, 48)
            assert np.isfinite(batch[k]).all()

    def test_psf_flux_convention(self, batch):
        # unit flux at high res -> 1/16 after 4x average downsampling
        np.testing.assert_allclose(batch["psf"].sum(axis=(1, 2)), 1.0 / 16, rtol=1e-4)

    def test_clumpy_knots_knob(self, batch):
        # knots on: stamps stay finite and normalized, pixels actually move;
        # knots off (the default) is byte-identical to the pre-knob population
        from galaxy_deconv_tpu.data.simulate import SimulationConfig

        cfg_on = SimulationConfig(knot_frac_min=0.2, knot_frac_max=0.2, knot_sigma=0.06)
        on = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(0), 8, cfg_on))
        assert np.isfinite(on["gt"]).all() and np.isfinite(on["obs"]).all()
        # same scene parameters, different morphology
        assert np.abs(on["gt"] - batch["gt"]).max() > 0
        # flux (alpha scaling) conventions unchanged: same per-sample gt norm
        np.testing.assert_allclose(
            np.sqrt((on["gt"] ** 2).sum(axis=(1, 2))),
            np.sqrt((batch["gt"] ** 2).sum(axis=(1, 2))), rtol=0.05)

    def test_snr_definition(self, batch):
        # alpha scaling: ||downsampled gt||_2 / sigma == target snr
        emp = np.sqrt((batch["gt"] ** 2).sum(axis=(1, 2))) / noise_sigma()
        np.testing.assert_allclose(emp, batch["snr"], rtol=1e-4)

    def test_noise_level(self):
        # high SNR, tiny galaxy flux: residual obs-conv noise has sigma ~ noise_sigma
        out = jax.tree.map(np.asarray, simulate_batch(jax.random.PRNGKey(3), 8, CFG))
        resid_std = np.std(out["obs"][:, :8, :8])  # corners: little galaxy flux
        assert 0.6 * noise_sigma() < resid_std < 1.6 * noise_sigma()

    def test_psf_centered(self, batch):
        ys, xs = np.mgrid[0:48, 0:48]
        p = batch["psf"]
        tot = p.sum(axis=(1, 2))
        cy = (p * ys).sum(axis=(1, 2)) / tot
        cx = (p * xs).sum(axis=(1, 2)) / tot
        # true center of an even stamp (GalSim drawImage convention)
        np.testing.assert_allclose(cy, 23.5, atol=0.3)
        np.testing.assert_allclose(cx, 23.5, atol=0.3)

    def test_fixed_snr_variant_reuses_scene(self):
        k = jax.random.PRNGKey(5)
        a = jax.tree.map(np.asarray, simulate_batch(k, 4, CFG))
        b = jax.tree.map(np.asarray, simulate_batch_at_snr(k, 4, 100.0, CFG))
        # same PSFs and same galaxy shapes (gt differs only by flux scale)
        np.testing.assert_allclose(a["psf"], b["psf"], atol=1e-6)
        ra = a["gt"] / a["gt"].sum(axis=(1, 2), keepdims=True)
        rb = b["gt"] / b["gt"].sum(axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(ra, rb, atol=1e-6)
        assert (b["snr"] == 100.0).all()

    def test_perturbed_psfs_differ_but_close(self):
        k = jax.random.PRNGKey(5)
        clean = np.asarray(simulate_batch(k, 4, CFG)["psf"])
        sheared = np.asarray(simulate_perturbed_psfs(k, 4, CFG, shear_err=0.05))
        assert not np.allclose(clean, sheared)
        # small perturbation: relative L2 difference under 20%
        rel = np.linalg.norm(clean - sheared, axis=(1, 2)) / np.linalg.norm(clean, axis=(1, 2))
        assert (rel < 0.2).all()


class TestDataset:
    @pytest.fixture(scope="class")
    def root(self, tmp_path_factory):
        return generate_dataset(
            tmp_path_factory.mktemp("ds"),
            n_train=12,
            n_test=8,
            cfg=CFG,
            chunk=8,
            snrs=(100,),
            shear_errs=(0.02,),
            fwhm_errs=(0.02,),
            verbose=False,
        )

    def test_splits(self, root):
        train = GalaxyDataset(root, "train")
        test = GalaxyDataset(root, "test")
        assert len(train) == 12 and len(test) == 8

    def test_batch_fields_and_alpha(self, root):
        ds = GalaxyDataset(root, "train")
        b = ds.batch(np.arange(4))
        assert b["obs"].shape == (4, 48, 48)
        np.testing.assert_allclose(b["alpha"], b["obs"].mean(axis=(1, 2)), rtol=1e-6)

    def test_variants(self, root):
        ds = GalaxyDataset(root, "test", obs_variant="obs_100")
        assert len(ds) == 8
        ds2 = GalaxyDataset(root, "test", psf_variant="psf_shear_err_0.02")
        assert ds2.psf.shape == (8, 48, 48)

    def test_iterate_batches(self, root):
        ds = GalaxyDataset(root, "train")
        batches = list(iterate_batches(ds, 4, shuffle=True, seed=1))
        assert len(batches) == 3
        # multi-host slicing is disjoint and covers everything
        got = []
        for p in range(2):
            for b in iterate_batches(ds, 2, process_index=p, process_count=2):
                got.append(b["obs"])
        assert sum(x.shape[0] for x in got) == 12

    def test_train_val_split(self):
        tr, va = train_val_indices(100, 0.8, seed=0)
        assert len(tr) == 80 and len(va) == 20
        assert not set(tr) & set(va)

    def test_generate_denoise_task(self, tmp_path):
        from galaxy_deconv_tpu.data import generate_dataset_denoise

        root = generate_dataset_denoise(
            tmp_path / "dn", n_train=8, n_test=4, cfg=CFG, chunk=8, verbose=False
        )
        ds = GalaxyDataset(root, "train")
        assert len(ds) == 8
        b = ds.batch(np.arange(4))
        # denoise task: no PSF convolution — obs is gt plus noise at the CCD
        # noise level (reference generate_data.py:337-452)
        from galaxy_deconv_tpu.data import noise_sigma

        resid = b["obs"] - b["gt"]
        sigma = noise_sigma(CFG.pixel_scale)
        assert 0.5 * sigma < resid.std() < 1.5 * sigma
        import json

        info = json.load(open(root / "info.json"))
        assert info["task"] == "Denoise"


class TestDenoiseUnitSampler:
    def test_unit_scale_matches_raw_over_alpha(self):
        """simulate_batch_denoise_unit is simulate_batch_denoise / alpha —
        the ADMM loop-variable scale (models/admmnet.py docstring)."""
        from galaxy_deconv_tpu.data.simulate import (
            simulate_batch_denoise,
            simulate_batch_denoise_unit,
        )

        key = jax.random.PRNGKey(3)
        raw = jax.tree.map(np.asarray, simulate_batch_denoise(key, 6, CFG))
        unit = jax.tree.map(np.asarray, simulate_batch_denoise_unit(key, 6, CFG))
        a = raw["alpha"][:, None, None]
        np.testing.assert_allclose(unit["obs"], raw["obs"] / a, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(unit["gt"], raw["gt"] / a, rtol=1e-5, atol=1e-6)
        # gt is the unit-flux galaxy profile: peak O(1), not O(alpha)
        assert unit["gt"].max() < 5.0
        np.testing.assert_array_equal(unit["alpha"], raw["alpha"])
