"""Coverage for the GalSim/COSMOS exact-parity data path.

galsim is an optional dependency (absent in this environment); the module's
pure-NumPy core — observation synthesis, downsampling, packed-layout
writing — is exercised here directly, and the full pipeline runs as a
skip-marked integration test wherever galsim + the COSMOS catalog exist.
Reference pipeline: generate_data.py:150-315.
"""

import json

import numpy as np
import pytest

from galaxy_deconv_tpu.data.generate_galsim import (
    _down,
    _require_galsim,
    observe_numpy,
    write_packed_dataset,
)

HAS_GALSIM = True
try:  # pragma: no cover - environment probe
    import galsim  # noqa: F401
except ImportError:
    HAS_GALSIM = False


class TestDown:
    def test_average_pool_semantics(self, rng):
        x = rng.standard_normal((192, 192))
        d = _down(x, 4)
        assert d.shape == (48, 48)
        assert d[0, 0] == pytest.approx(x[:4, :4].mean())
        # averaging preserves the mean, divides total flux by rate^2
        assert d.sum() == pytest.approx(x.sum() / 16)

    def test_matches_jax_resize_op(self, rng):
        import jax.numpy as jnp

        from galaxy_deconv_tpu.ops.resize import average_downsample

        x = rng.standard_normal((192, 192)).astype(np.float32)
        np.testing.assert_allclose(
            _down(x, 4), np.asarray(average_downsample(jnp.asarray(x), 4)), atol=1e-6
        )


class TestObserveNumpy:
    def test_snr_definition_and_noise(self, rng):
        """||down(gt)||_2 = snr * sigma (reference generate_data.py:241-244)
        and the observation is conv + N(0, sigma)."""
        gal = np.zeros((192, 192), np.float32)
        ys, xs = np.mgrid[0:192, 0:192]
        gal += np.exp(-((ys - 95.5) ** 2 + (xs - 95.5) ** 2) / (2 * 12.0**2))
        psf = np.zeros_like(gal)
        # delta at the grid center: together with the reference's post-conv
        # ifftshift (generate_data.py:247) this leaves the galaxy in place
        psf[96, 96] = 1.0
        sigma, snr = 19.0, 50.0
        obs, gt = observe_numpy(gal, psf, sigma, snr, np.random.default_rng(0))
        assert np.sqrt((gt**2).sum()) == pytest.approx(snr * sigma, rel=1e-5)
        assert obs.shape == gt.shape == (48, 48)
        border = np.concatenate([obs[:8].ravel(), obs[-8:].ravel()])
        assert border.std() == pytest.approx(sigma, rel=0.15)

    def test_observation_reproducible(self):
        gal = np.random.default_rng(1).random((96, 96)).astype(np.float32)
        psf = np.zeros_like(gal)
        psf[0, 0] = 1.0
        a = observe_numpy(gal, psf, 5.0, 30.0, np.random.default_rng(7), upsample=2)
        b = observe_numpy(gal, psf, 5.0, 30.0, np.random.default_rng(7), upsample=2)
        np.testing.assert_array_equal(a[0], b[0])


class TestPackedWriter:
    def test_dataset_roundtrip(self, tmp_path, rng):
        """write_packed_dataset output must load through GalaxyDataset."""
        from galaxy_deconv_tpu.data import GalaxyDataset

        def stamps(n):
            return [rng.standard_normal((48, 48)).astype(np.float32) for _ in range(n)]

        stores = {
            "train": {"obs": stamps(4), "psf": stamps(4), "gt": stamps(4)},
            "test": {"obs": stamps(2), "psf": stamps(2), "gt": stamps(2)},
        }
        variants = {"obs_20": stamps(2), "gt_20": stamps(2)}
        perturbed = {"psf_shear_err_0.01": stamps(2)}
        meta = dict(n_train=4, n_test=2, fov_pixels=48, pixel_scale=0.2, upsample=4,
                    seed=31415, snrs=[20], shear_errs=[0.01], fwhm_errs=[],
                    generator="galsim/COSMOS")
        root = write_packed_dataset(tmp_path / "ds", stores, variants, perturbed, meta)

        info = json.loads((root / "info.json").read_text())
        assert info["generator"] == "galsim/COSMOS" and info["n_train"] == 4
        ds = GalaxyDataset(root, "train")
        assert len(ds) == 4
        batch = ds.batch(np.arange(4))
        # alpha = mean(obs) per sample (reference utils_data.py:100-101)
        np.testing.assert_allclose(
            batch["alpha"], np.stack(stores["train"]["obs"]).mean(axis=(1, 2)), rtol=1e-6
        )
        dt = GalaxyDataset(root, "test", obs_variant="obs_20")
        np.testing.assert_allclose(dt.batch(np.arange(2))["obs"], np.stack(variants["obs_20"]))
        dp = GalaxyDataset(root, "test", psf_variant="psf_shear_err_0.01")
        np.testing.assert_allclose(dp.batch(np.arange(2))["psf"], np.stack(perturbed["psf_shear_err_0.01"]))


class TestGating:
    @pytest.mark.skipif(HAS_GALSIM, reason="galsim present")
    def test_clear_error_without_galsim(self):
        with pytest.raises(ImportError, match="galsim is not installed"):
            _require_galsim()


@pytest.mark.skipif(not HAS_GALSIM, reason="galsim not installed")
class TestGalsimIntegration:  # pragma: no cover - runs only where galsim exists
    def test_psf_draw(self):
        from galaxy_deconv_tpu.data.generate_galsim import _draw_psf

        galsim = _require_galsim()
        p = dict(atmos_fwhm=0.65, atmos_e=0.02, atmos_beta=0.3, defocus=0.1,
                 astig1=0.0, astig2=0.0, coma1=0.0, coma2=0.0, spher=0.0,
                 trefoil1=0.0, trefoil2=0.0, obscuration=0.3, lam_over_diam=0.02)
        psf = _draw_psf(galsim, p, 48, 0.2, 4)
        assert psf.shape == (192, 192) and psf.sum() == pytest.approx(1.0, rel=1e-2)
